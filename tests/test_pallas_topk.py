"""Pallas fused cosine+top-k kernel vs the XLA search program.

Runs the Mosaic interpreter on the CPU backend (conftest pins cpu);
the real-hardware equality + bandwidth numbers live in
docs/design.md's gallery section (measured via tools/gallery_bench.py
and the kernel's TPU probe).
"""

import numpy as np
import pytest

DIM = 512


def _unit(rng, n):
    e = rng.normal(size=(n, DIM)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


@pytest.mark.parametrize("batch", [1, 7, 64])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_cosine_topk_matches_reference(batch, dtype):
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.ops.pallas_topk import cosine_topk_impl

    rng = np.random.default_rng(3)
    cap, n, k = 3072, 2500, 5
    g = np.zeros((cap, DIM), np.float32)
    g[:n] = _unit(rng, n)
    gd = jnp.asarray(g, jnp.bfloat16 if dtype == "bfloat16"
                     else jnp.float32)
    p = g[:n][rng.integers(0, n, batch)]
    s, i = cosine_topk_impl(gd, jnp.asarray(p), n, k, interpret=True)
    s, i = np.asarray(s), np.asarray(i)

    ref = p.astype(np.float32) @ np.asarray(
        gd[:n], np.float32).T            # same quantized store values
    ri = np.argsort(-ref, axis=1)[:, :k]
    rs = np.take_along_axis(ref, ri, axis=1)
    if dtype == "float32":
        np.testing.assert_array_equal(i, ri)
        np.testing.assert_allclose(s, rs, atol=1e-5)
    else:
        # bf16 scoring legitimately reorders near-ties vs the f32
        # oracle (last-mantissa-bit gaps); the contract is score
        # QUALITY: the rows the kernel picked must score within the
        # bf16 bar of the oracle's true top-k, in descending order
        picked = np.take_along_axis(ref, i, axis=1)
        np.testing.assert_allclose(picked, rs, atol=5e-3)
        np.testing.assert_allclose(s, picked, atol=5e-3)
    assert np.all(np.diff(s, axis=1) <= 1e-6)       # descending


def test_cosine_topk_masks_partial_fill_and_ties():
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.ops.pallas_topk import cosine_topk_impl

    rng = np.random.default_rng(4)
    cap, n = 2048, 1100                  # tail block half-masked
    g = np.zeros((cap, DIM), np.float32)
    g[:n] = _unit(rng, n)
    g[7] = g[1040]                       # exact tie across blocks
    p = g[7:8]
    s, i = cosine_topk_impl(jnp.asarray(g), jnp.asarray(p), n, 3,
                            interpret=True)
    # tie resolves to the smallest index, like lax.top_k
    assert np.asarray(i)[0, 0] == 7 and np.asarray(i)[0, 1] == 1040
    np.testing.assert_allclose(np.asarray(s)[0, :2], 1.0, atol=1e-5)
    # masked rows (>= n) can never surface even with k > n - they
    # carry -2e9; all returned indices are in-range
    s, i = cosine_topk_impl(jnp.asarray(g), jnp.asarray(p), n, 5,
                            interpret=True)
    assert np.asarray(i).max() < n

    with pytest.raises(ValueError, match="multiple"):
        cosine_topk_impl(jnp.asarray(g[:100]), jnp.asarray(p), 50, 3,
                         interpret=True)


def test_cosine_topk_q_matches_xla_coarse():
    """The int8 kernel's coarse candidates must match the XLA int8
    coarse program exactly (identical quantized math both ways)."""
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.ops.pallas_topk import cosine_topk_q_impl
    from tf_face_toolbox_tpu.serving.gallery import (
        _quantize_rows,
        _search_q_fn,
    )

    rng = np.random.default_rng(6)
    cap, n, k = 2048, 1900, 7
    g = np.zeros((cap, DIM), np.float32)
    g[:n] = _unit(rng, n)
    gq, gs = _quantize_rows(g)          # padded rows quantize to 0
    for batch in (1, 16):
        p = g[:n][rng.integers(0, n, batch)]
        pq, ps = _quantize_rows(p)
        s, i = cosine_topk_q_impl(
            jnp.asarray(gq), jnp.asarray(gs), jnp.asarray(pq),
            jnp.asarray(ps), n, k, interpret=True)
        zbias = jnp.zeros((cap,), jnp.float32)
        rs, ri = _search_q_fn(k)(
            jnp.asarray(gq), jnp.asarray(gs), zbias, jnp.asarray(pq),
            jnp.asarray(ps), jnp.int32(n))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_allclose(np.asarray(s), np.asarray(rs),
                                   atol=1e-5)


@pytest.mark.mid
def test_gallery_pallas_dispatch_equals_xla():
    """DeviceGallery.use_pallas routes resident searches through the
    kernel (interpret on CPU) and must agree with the XLA program."""
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    from tf_face_toolbox_tpu.serving import gallery as gallery_mod

    rng = np.random.default_rng(5)
    e = _unit(rng, 40)
    old_chunk = gallery_mod._PROBE_CHUNK
    gallery_mod._PROBE_CHUNK = 4        # force multi-chunk splitting
    try:
        for dtype in ("float32", "int8"):
            ref = DeviceGallery(DIM, block=1024, dtype=dtype)
            pal = DeviceGallery(DIM, block=1024, dtype=dtype)
            pal.use_pallas = True
            ref.use_pallas = False
            ref.enroll(e, np.arange(40))
            pal.enroll(e, np.arange(40))
            for probe in (e[0], e[:6], e[:11]):   # 1 / 2 / 3 chunks
                lr, sr = ref.search(probe, k=4)
                lp, sp = pal.search(probe, k=4)
                np.testing.assert_array_equal(lp, lr)
                np.testing.assert_allclose(sp, sr, atol=5e-3)
            assert pal._pallas_fails == 0
    finally:
        gallery_mod._PROBE_CHUNK = old_chunk


def test_stream_merge_adversarial_orderings():
    """r5 one-branch merge: orderings that stress each path.

    - ascending: every block's max enters the running set (the
      second-candidate `pl.when` fires maximally),
    - descending: after block 0 no column ever enters (the insert
      predicate is false everywhere — pure streaming),
    - clustered: the ENTIRE true top-k sits in one interior block
      (>=2 same-block candidates force the concat fallback),
    - duplicates: scratch/tile duplicate (score, col) pairs must
      collapse via index knockout, not surface twice.
    """
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.ops.pallas_topk import cosine_topk_impl

    rng = np.random.default_rng(9)
    cap, n, k = 4096, 4096, 6           # blk=1024 -> 4 grid steps
    base = _unit(rng, 1)[0]
    others = _unit(rng, n)
    p = base[None, :].astype(np.float32)

    def gallery_with_scores(scores):
        """Rows whose cosine against `base` is exactly-ish `scores`
        (mix base with an orthogonalized partner)."""
        g = np.empty((cap, DIM), np.float32)
        for j, s in enumerate(scores):
            v = others[j] - (others[j] @ base) * base
            v /= np.linalg.norm(v)
            g[j] = s * base + np.sqrt(1.0 - s * s) * v
        return g

    asc = gallery_with_scores(np.linspace(-0.9, 0.9, n))
    desc = gallery_with_scores(np.linspace(0.9, -0.9, n))
    clustered = gallery_with_scores(
        np.concatenate([np.linspace(-0.5, 0.0, 2048),
                        np.linspace(0.90, 0.99, 6),     # all top-6
                        np.linspace(-0.5, 0.0, n - 2054)]))
    dup = gallery_with_scores(np.linspace(-0.9, 0.9, n))
    dup[1030] = dup[4095]               # top-scoring row duplicated in
                                        # an earlier block: cross-block
                                        # exact tie inside the top-k

    for g in (asc, desc, clustered, dup):
        s, i = cosine_topk_impl(jnp.asarray(g), jnp.asarray(p), n, k,
                                interpret=True)
        ref = (p @ g[:n].T)[0]
        ri = np.argsort(-ref, kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(i)[0], ri)
        np.testing.assert_allclose(np.asarray(s)[0], ref[ri],
                                   atol=1e-5)
        assert len(set(np.asarray(i)[0].tolist())) == k   # no dupes
