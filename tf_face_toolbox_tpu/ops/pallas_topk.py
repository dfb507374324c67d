"""Fused cosine + running top-k Pallas kernel for 1:N gallery search.

Why a kernel: the XLA program (`serving/gallery._search_fn`) computes
the full (B, capacity) similarity matrix and runs `lax.top_k` over
10^7 columns. Measured at 10^7 rows, B=64 (v5e) it reads the 10.24 GB
bf16 store in 32.5 ms = 315 GB/s — well under the 819 GB/s HBM roof —
because XLA's top-k over the huge sims matrix is the serial tail.
This kernel never materializes the sims matrix: the grid streams
1024-row gallery blocks through VMEM (Pallas double-buffers the HBM
reads), the MXU computes one (B, 1024) tile of scores, and a
(B, k) running best set lives in VMEM scratch across grid steps.
Selection uses only max/min reductions and elementwise selects — no
argmax/gather, which Mosaic lowers poorly — at k passes per block,
~0.1% of the block's MXU+DMA time. The store read is the only HBM
traffic, so the kernel runs at the bandwidth roofline.

r5 additions:

- **Per-row bias input** (both kernels): a (cap,) f32 vector added to
  the scores before selection, 0 for live rows and −2e9 for tombstoned
  ones — the mask extension that makes O(1) deenroll exact (the store
  marks removed rows instead of re-uploading; serving/gallery.py).
  Blocked as (8, blk) tiles covering 8 grid steps (Mosaic's f32
  sublane floor), the same trick as the int8 per-row scales. Cost:
  4 bytes/row of extra HBM traffic — 0.4% of a bf16 512-d store.
- **One-branch streaming merge (both kernels)**: r4's all-or-nothing
  `pl.when` gate over the whole (B, blk) tile defeated streaming
  pruning at large B — with 64 probes and kc=20, SOME probe's block
  max beats its bar on ~99% of blocks, so the k-pass selection sweep
  ran nearly every block and held int8 B=64 at 22–26 ms vs 7.3 ms
  B=1 (10⁷ rows). Probing the kernel piecewise on hardware showed
  the REAL cost model: the whole dequant/mask elementwise chain is
  free (hides under the block's HBM read), while every `pl.when`
  conditioned on a vector reduce costs ~0.12–0.25 µs of scalar-unit
  sync — branches, not lanes, were the tail (a per-chunk/per-pass
  variant with 8× the branches measured SLOWER than r4). The merge
  (`_stream_merge`) now does all vector work unconditionally —
  extract the block max per probe, insert it over the probe's min
  slot with predicated data ops — and branches ONCE per block, only
  when some probe's second-best remaining column would still enter
  (≥2 same-block top-k members: ~12% of blocks at k=20, <1% at k=5).
  The running set stays unordered in scratch and is sorted once at
  the last grid step.

Reference behavior anchored to serving/gallery.py's XLA program
(exact same masking/order contract); equality is tested in
tests/test_pallas_topk.py, and DeviceGallery falls back to the XLA
program on any Mosaic failure (same guard style as
ops/pallas_preprocess.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 1024          # rows per grid step == DeviceGallery's block default
_NEG = -2e9         # masked-row score (matches the XLA program)
_INIT = -3e9        # running-best init; loses to any masked row too


def default_blk(cap: int, d: int = 512, itemsize: int = 2) -> int:
    """Rows per grid step: the largest of 4096/2048/1024 that divides
    the capacity AND whose double-buffered block stream fits an ~8 MB
    VMEM budget (measured: 2048+ runs 750+ GB/s, 1024 drops to 585;
    an f32 512-d store tops out at 2048)."""
    for b_ in (4096, 2048, 1024):
        if cap % b_ == 0 and 2 * b_ * d * itemsize <= (8 << 20):
            return b_
    return BLK


def _select_topk(all_s, all_i, k):
    """Top-k of (B, M) scores by k iterative max-extract passes.

    Ties resolve to the smallest index (via a min reduction over the
    tied columns), then the winner is knocked out by index equality —
    only max/min/where, every op Mosaic lowers natively."""
    picked_s, picked_i = [], []
    big = jnp.int32(2**31 - 1)
    for _ in range(k):
        m = jnp.max(all_s, axis=1, keepdims=True)             # (B, 1)
        tied = all_s >= m                                      # (B, M)
        idx = jnp.min(jnp.where(tied, all_i, big), axis=1,
                      keepdims=True)                           # (B, 1)
        picked_s.append(m)
        picked_i.append(idx)
        all_s = jnp.where(all_i == idx, _INIT, all_s)
    return (jnp.concatenate(picked_s, axis=1),
            jnp.concatenate(picked_i, axis=1))


def _bias_tiles(bias, cap: int, grid: int, blk: int):
    """(cap,) f32 row bias → (ceil8(grid), blk) tiles; step i reads
    tile i//8, row i%8 (Mosaic's 8-sublane f32 floor). None → zeros."""
    g8 = -(-grid // 8) * 8
    out = jnp.zeros((g8, blk), jnp.float32)
    if bias is None:
        return out
    return jax.lax.dynamic_update_slice(
        out, bias.reshape(grid, blk).astype(jnp.float32), (0, 0))


def _finalize(i, s_out, i_out, bs_ref, bi_ref, k):
    """Last grid step: sort the unordered running best, descending,
    ties to the smallest index — the ONE k-pass sweep per search."""
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ts, ti = _select_topk(bs_ref[:], bi_ref[:], k)
        s_out[:] = ts
        i_out[:] = ti


def _kernel(n_ref, p_ref, g_ref, bias_ref, s_out, i_out, bs_ref,
            bi_ref, *, k, blk):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        bs_ref[:] = jnp.full(bs_ref.shape, _INIT, jnp.float32)
        bi_ref[:] = jnp.zeros(bi_ref.shape, jnp.int32)

    # (B, blk) score tile on the MXU; contract dim 1 of both operands
    # (p @ g_blk.T) — same layout trick as the XLA program
    sims = jax.lax.dot_general(
        p_ref[:], g_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    sims = sims + bias_ref[pl.ds(i % 8, 1), :]        # (1, blk) bcast
    col = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + i * blk
    sims = jnp.where(col < n_ref[0, 0], sims, _NEG)
    _stream_merge(sims, col, bs_ref, bi_ref, k)

    _finalize(i, s_out, i_out, bs_ref, bi_ref, k)


def _stream_merge(sims, col, bs_ref, bi_ref, k):
    """Merge a (B, blk) score tile into the UNORDERED (B, k) running
    best with ONE branch per block.

    Mosaic cost model (measured, 10⁷-row int8 store, B=64, v5e): the
    whole dequant+mask elementwise chain over the (B, blk) tile is
    FREE — it hides under the block's HBM read (6.7 vs 6.5 ms for the
    bare dot+max) — but every `pl.when` whose condition hangs on a
    vector reduce costs ~0.12–0.25 µs in scalar-unit sync, so
    per-chunk/per-pass gating (8 chunks × nested passes = tens of
    thousands of branches) is what held B=64 at 24–26 ms. So: do the
    vector work unconditionally, branch once.

    Unconditionally: extract the block max per probe (ties → smallest
    column) and insert it over the probe's current min slot with
    predicated data ops — no branch; rows whose max loses their bar
    keep their set (the predicate is false everywhere). Dropping the
    displaced min is sound: m > bar puts m in the true top-k, which
    therefore keeps at most k-1 incumbents. The single `pl.when`
    fires only when some probe's SECOND-best remaining column still
    beats its post-insert bar — i.e. one block holds ≥2 of a probe's
    running top-k, which after warmup is rare (~12% of blocks at
    B=64/k=20, <1% at k=5) — and runs the full concat k-pass sort.
    The insert may duplicate (score, col) pairs between scratch and
    tile; :func:`_select_topk` knocks out by column index, so both
    copies collapse in one extraction. Scratch stays unordered;
    :func:`_finalize` sorts once at the last grid step."""
    b = sims.shape[0]
    big = jnp.int32(2**31 - 1)
    m = jnp.max(sims, axis=1, keepdims=True)                  # (B,1)
    idx = jnp.min(jnp.where(sims >= m, col, big), axis=1,
                  keepdims=True)                              # (B,1)
    bs = bs_ref[:]
    bar = jnp.min(bs, axis=1, keepdims=True)                  # (B,1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    sl = jnp.min(jnp.where(bs == bar, slot, big), axis=1,
                 keepdims=True)
    repl = (slot == sl) & (m > bar)
    bsn = jnp.where(repl, m, bs)
    bs_ref[:] = bsn
    bi_ref[:] = jnp.where(repl, idx, bi_ref[:])
    m2 = jnp.max(jnp.where(col == idx, _INIT, sims), axis=1,
                 keepdims=True)

    @pl.when(jnp.any(m2 > jnp.min(bsn, axis=1, keepdims=True)))
    def _():
        all_s = jnp.concatenate([bs_ref[:], sims], axis=1)
        all_i = jnp.concatenate(
            [bi_ref[:], jnp.broadcast_to(col, sims.shape)], axis=1)
        ts, ti = _select_topk(all_s, all_i, k)
        bs_ref[:] = ts
        bi_ref[:] = ti


def _kernel_q(n_ref, p_ref, ps_ref, g_ref, gs_ref, bias_ref, s_out,
              i_out, bs_ref, bi_ref, *, k, blk):
    """int8 twin: s8×s8 MXU dot → int32, rescaled by the per-probe
    scale (B, 1) × the block's per-row scales. Scales and bias arrive
    as (8, blk) tiles covering 8 grid steps — Mosaic requires >=8
    sublanes per block — and the step picks its row.

    The f32 rescale of the whole (B, blk) accumulator looks like a
    VPU tail but measures FREE (it hides under the 2.6 µs/block HBM
    read; see :func:`_stream_merge`'s cost model), so the kernel
    dequants unconditionally and merges with the same one-branch
    streaming insert as the f32/bf16 kernel."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        bs_ref[:] = jnp.full(bs_ref.shape, _INIT, jnp.float32)
        bi_ref[:] = jnp.zeros(bi_ref.shape, jnp.int32)

    acc = jax.lax.dot_general(
        p_ref[:], g_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    gs = gs_ref[pl.ds(i % 8, 1), :]                       # (1, blk)
    sims = acc.astype(jnp.float32) * ps_ref[:] * gs
    sims = sims + bias_ref[pl.ds(i % 8, 1), :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + i * blk
    sims = jnp.where(col < n_ref[0, 0], sims, _NEG)
    _stream_merge(sims, col, bs_ref, bi_ref, k)

    _finalize(i, s_out, i_out, bs_ref, bi_ref, k)


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk(gallery, probes, n_valid, k: int, bias=None):
    """Top-``k`` cosine matches of ``probes`` (B, D) f32 against
    ``gallery`` (cap, D) f32/bf16 with rows >= ``n_valid`` masked and
    ``bias`` (cap,) f32 (None = zeros) added per row — tombstoned rows
    carry −2e9 and can never surface. Returns (scores (B, k) f32,
    idx (B, k) int32), descending — the drop-in twin of
    serving/gallery._search_fn's program. Requires cap % 1024 == 0
    (DeviceGallery pads in 1024-row blocks)."""
    return cosine_topk_impl(gallery, probes, n_valid, k, bias=bias)


def cosine_topk_impl(gallery, probes, n_valid, k: int,
                     interpret: bool = False, blk: int | None = None,
                     bias=None):
    """Unjitted body; ``interpret=True`` runs the Mosaic interpreter
    (CPU tests — works inside jit/shard_map too, which is how the
    mesh-sharded gallery tests run it). ``blk`` overrides the
    rows-per-step (must divide the capacity; the default picks the
    largest of 4096/2048/1024 that does — bigger steps amortize the
    per-step selection sweep)."""
    cap, d = gallery.shape
    if cap % BLK:
        raise ValueError(f"capacity {cap} not a multiple of {BLK}")
    if blk is None:
        blk = default_blk(cap, d, gallery.dtype.itemsize)
    b = probes.shape[0]
    grid = cap // blk
    n2 = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)
    bias2 = _bias_tiles(bias, cap, grid, blk)
    return pl.pallas_call(
        functools.partial(_kernel, k=k, blk=blk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * cap,
            bytes_accessed=cap * (d * gallery.dtype.itemsize + 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(n2, probes.astype(gallery.dtype), gallery, bias2)


PROBE_CHUNK = 256   # probes per kernel launch: (chunk, blk) sims tile
                    # stays ~4 MB of VMEM


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_batched(gallery, probes, n_valid, k: int, bias=None):
    """Any-batch wrapper: lax.map over PROBE_CHUNK-probe slices of a
    padded batch, each slice one kernel launch — a single dispatch
    for the caller (one tunnel RTT from a remote host), VMEM bounded
    regardless of B. Each chunk re-reads the store; at B=2048 that is
    8 reads of the store vs an XLA (2048, cap) sims matrix that could
    not exist at all."""
    b = probes.shape[0]
    if b <= PROBE_CHUNK:
        return cosine_topk_impl(gallery, probes, n_valid, k, bias=bias)
    bp = -(-b // PROBE_CHUNK) * PROBE_CHUNK
    pad = jnp.zeros((bp - b, probes.shape[1]), probes.dtype)
    chunks = jnp.concatenate([probes, pad]).reshape(
        bp // PROBE_CHUNK, PROBE_CHUNK, probes.shape[1])
    s, i = jax.lax.map(
        lambda p: cosine_topk_impl(gallery, p, n_valid, k, bias=bias),
        chunks)
    return (s.reshape(bp, k)[:b], i.reshape(bp, k)[:b])


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_q_batched(gallery_q, gallery_scale, probes_q,
                          probe_scale, n_valid, k: int, bias=None):
    """int8 twin of :func:`cosine_topk_batched`."""
    b = probes_q.shape[0]
    if b <= PROBE_CHUNK:
        return cosine_topk_q_impl(gallery_q, gallery_scale, probes_q,
                                  probe_scale, n_valid, k, bias=bias)
    bp = -(-b // PROBE_CHUNK) * PROBE_CHUNK
    pq = jnp.concatenate([
        probes_q, jnp.zeros((bp - b, probes_q.shape[1]), jnp.int8)])
    ps = jnp.concatenate([
        probe_scale, jnp.zeros((bp - b,), jnp.float32)])
    s, i = jax.lax.map(
        lambda args: cosine_topk_q_impl(
            gallery_q, gallery_scale, args[0], args[1], n_valid, k,
            bias=bias),
        (pq.reshape(bp // PROBE_CHUNK, PROBE_CHUNK, -1),
         ps.reshape(bp // PROBE_CHUNK, PROBE_CHUNK)))
    return (s.reshape(bp, k)[:b], i.reshape(bp, k)[:b])


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_q(gallery_q, gallery_scale, probes_q, probe_scale,
                  n_valid, k: int, bias=None):
    """int8-store twin of :func:`cosine_topk` — the coarse stage of
    DeviceGallery's two-stage int8 search. ``gallery_q`` (cap, D)
    int8, ``gallery_scale`` (cap,) f32 per-row scales, ``probes_q``
    (B, D) int8 with ``probe_scale`` (B,) f32."""
    return cosine_topk_q_impl(gallery_q, gallery_scale, probes_q,
                              probe_scale, n_valid, k, bias=bias)


def cosine_topk_q_impl(gallery_q, gallery_scale, probes_q, probe_scale,
                       n_valid, k: int, interpret: bool = False,
                       blk: int | None = None, bias=None):
    cap, d = gallery_q.shape
    if cap % BLK:
        raise ValueError(f"capacity {cap} not a multiple of {BLK}")
    if blk is None:
        blk = default_blk(cap, d, 1)
    b = probes_q.shape[0]
    grid = cap // blk
    n2 = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)
    # per-row scales blocked exactly like the bias: (ceil8(grid), blk)
    # tiles, step i reads tile i//8 / row i%8 in-kernel
    gs2 = _bias_tiles(gallery_scale, cap, grid, blk)
    bias2 = _bias_tiles(bias, cap, grid, blk)
    ps2 = probe_scale.reshape(b, 1)
    return pl.pallas_call(
        functools.partial(_kernel_q, k=k, blk=blk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * cap,
            bytes_accessed=cap * (d + 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(n2, probes_q, ps2, gallery_q, gs2, bias2)
