"""Feature extraction: flip-averaged, L2-normalized face embeddings.

Rebuilds the reference's extractor (ref: upstream features.py
[UPSTREAM-K]; SURVEY.md §3.2): for each face compute f(x) and
f(flip(x)) with shared weights, average, L2-normalize.

TPU-first design, unlike the reference's two separate graph branches:
- The flip pair is computed in ONE forward pass by concatenating
  [x; flip(x)] along the batch — doubles the effective batch, keeps the
  MXU saturated, and lets XLA share every weight load between the two
  halves (HBM-bandwidth win over running the model twice).
- The whole thing (flip, concat, forward, average, normalize) lives in a
  single jitted function; no host round-trips inside the hot loop.
- Embeddings come back f32 even under bf16 compute, so the cosine
  verification math downstream is exact.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from tf_face_toolbox_tpu.models.layers import l2_normalize


def flip_averaged_embeddings(apply_fn: Callable, variables: Any,
                             images: jax.Array,
                             with_quality: bool = False):
    """Core extraction math: l2norm(f(x) + f(flip(x))).

    ``apply_fn(variables, images)`` must run the backbone in eval mode.
    Flip is along the width axis (NHWC axis 2), matching
    tf.image.flip_left_right semantics (SURVEY.md §8). When ``images``
    is a DCT-coefficient tensor (trailing dim C·64, the dct stem's
    zero-decode input), the flip happens in the frequency domain —
    exactly equivalent (ops/dct.flip_coefficients, tested).

    ``with_quality``: also return the PRE-normalization magnitude
    ‖(f(x)+f(flip))/2‖ per face — the feature-norm quality score
    (MagFace's trained signal, and an informative proxy on any
    margin-softmax model). → ``(embeddings, quality (N,) f32)``.
    """
    n = images.shape[0]
    if images.shape[-1] != 3 and images.shape[-1] % 64 == 0:
        from tf_face_toolbox_tpu.ops.dct import flip_coefficients

        flipped = flip_coefficients(images)
    else:
        flipped = images[:, :, ::-1, :]
    both = jnp.concatenate([images, flipped], axis=0)
    emb = apply_fn(variables, both)
    s = (emb[:n] + emb[n:]).astype(jnp.float32)
    out = l2_normalize(s)
    if with_quality:
        return out, 0.5 * jnp.sqrt(jnp.sum(s * s, axis=-1) + 1e-12)
    return out


def make_extract_fn(net, *, donate: bool = True, mesh=None,
                    with_quality: bool = False) -> Callable:
    """Build the jitted extraction step for a backbone module.

    Returns ``extract(variables, images) -> (N, D) f32 embeddings``
    (``(embeddings, quality (N,))`` with ``with_quality`` — the
    pre-normalization feature magnitude, MagFace's quality signal).
    ``images`` are standardized pixels (see ops.preprocess).

    ``mesh``: shard extraction data-parallel over a device mesh — the
    batch splits over the ``data`` axis, params replicate, and XLA runs
    each chip on its shard (multi-chip serving). A batch that does not
    divide by the data-axis size is padded up to the next multiple (the
    pad rows recompute the first face and are dropped before returning),
    so a shard's ragged tail batch just works.
    """
    def _apply(variables, images):
        return net.apply(variables, images, train=False)

    def _extract(variables, images):
        return flip_averaged_embeddings(_apply, variables, images,
                                        with_quality=with_quality)

    donate_argnums = (1,) if donate else ()
    if mesh is None:
        return jax.jit(_extract, donate_argnums=donate_argnums)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from tf_face_toolbox_tpu.parallel.mesh import DATA_AXIS

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())
    out_shardings = ((batch_sharding, batch_sharding) if with_quality
                     else batch_sharding)
    jitted = jax.jit(
        _extract,
        in_shardings=(replicated, batch_sharding),
        out_shardings=out_shardings,
        donate_argnums=donate_argnums,
    )
    n_data = mesh.shape[DATA_AXIS]
    if n_data == 1:
        return jitted

    def _padded(variables, images):
        n = images.shape[0]
        rem = -n % n_data
        if rem:
            images = jnp.concatenate(
                [images, jnp.broadcast_to(images[:1],
                                          (rem,) + images.shape[1:])])
        out = jitted(variables, images)
        if not rem:
            return out
        return (jax.tree.map(lambda o: o[:n], out) if with_quality
                else out[:n])

    return _padded


def extract_shard(net, variables, source, *, image_size: int,
                  crop_from: int = 0, batch: int = 256,
                  num_threads: int = 4, loader: str = "auto",
                  norm: str = "per_image",
                  extract_fn: Callable | None = None,
                  progress: Callable[[int, int], None] | None = None,
                  rows: tuple[int, int] | None = None,
                  with_quality: bool = False,
                  ):
    """Extract embeddings for every record of a FaceShardSource.

    ``with_quality``: also return per-face feature-norm quality scores
    → ``(embeddings (N, D), quality (N,))``. When passing a custom
    ``extract_fn`` it must return the same pair.

    The shared eval-extraction path (offline extract CLI and the
    in-training eval hook both route through here so their embeddings
    can never diverge):

    - host: parallel decode + half-pixel bilinear resize to
      ``crop_from`` (training's source scale; handles mixed-size JPEGs)
    - device: center crop to ``image_size`` + standardize
      (the reference's eval chain) and flip-averaged extraction,
      in ``batch``-sized chunks so HBM use is bounded.

    ``loader``: "auto" (native C++ pool when available, else the
    Python pool), "native", "python", or "native_dct" — host
    entropy-decode only, the TPU finishes the JPEG (ops/jpeg_tpu);
    needs a uniform 4:4:4 shard of exactly crop_from² geometry
    (cli.pack --recode_size). "dct_domain": the zero-decode path for
    stem="dct" backbones — coefficients go straight into the net
    (ops/dct.prepare_coefficients; no IDCT, no pixels, flip in the
    frequency domain); needs a recoded shard at exactly image_size
    (crop_from == image_size — block-aligned crops don't exist).

    ``crop_from`` defaults to image_size + 8 (the training default);
    pass crop_from == image_size for whole-image resize semantics.
    """
    if loader == "dct_domain":
        if getattr(net, "stem", None) != "dct":
            # a non-dct stem would silently convolve over 192 "channels"
            raise ValueError("loader='dct_domain' requires a stem='dct' "
                             "backbone (e.g. dct_resnet_50)")
        # no crop exists in the coefficient domain; the only legal
        # source scale is the model's input size, so default to it
        # instead of the pixel chain's image_size+8
        crop_from = crop_from or image_size
    fn = extract_fn or make_extract_fn(net, donate=False,
                                       with_quality=with_quality)
    n = (rows[1] - rows[0]) if rows is not None else source.index.count

    def _host(out):
        return (tuple(np.asarray(o) for o in out) if with_quality
                else np.asarray(out))

    outs = []
    done = 0
    pending = None  # one device batch in flight: jax dispatch is async,
    # so batch k's forward overlaps batch k+1's host decode (and the
    # device round trip, on tunneled setups). `progress` counts only
    # MATERIALIZED batches — done == n means the results exist, not
    # that the last dispatch is still computing.
    pending_rows = 0
    for x in _standardized_batches(source, image_size=image_size,
                                   crop_from=crop_from, batch=batch,
                                   num_threads=num_threads,
                                   loader=loader, norm=norm, rows=rows):
        out = fn(variables, x)
        if pending is not None:
            outs.append(_host(pending))
            done += pending_rows
            if progress is not None:
                progress(done, n)
        pending, pending_rows = out, x.shape[0]
    if pending is not None:
        outs.append(_host(pending))
        done += pending_rows
        if progress is not None:
            progress(done, n)
    if not outs:
        raise ValueError("nothing to extract: empty shard or row range")
    if with_quality:
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]))
    return np.concatenate(outs)


def extract_shard_to_npy(net, variables, source, output_path: str, *,
                         image_size: int, crop_from: int = 0,
                         batch: int = 256, chunk_rows: int = 0,
                         num_threads: int = 4, loader: str = "auto",
                         norm: str = "per_image",
                         extract_fn: Callable | None = None,
                         progress: Callable[[int, int], None] | None = None,
                         rows: tuple[int, int] | None = None,
                         fingerprint: str = "",
                         ) -> np.ndarray:
    """Resumable bulk extraction with O(chunk) host memory.

    :func:`extract_shard` holds every embedding in RAM and writes once
    at the end — at corpus scale (10^8 faces) that is tens of GB of
    host RAM and a crash loses hours of chip time. This variant writes
    straight into a disk-backed ``.npy`` (``np.lib.format`` memmap, so
    the finished file is a perfectly ordinary numpy array) in
    ``chunk_rows``-sized chunks, recording completed chunks in a
    ``<output>.progress.json`` sidecar after each flush (partial-range
    jobs get their own ``<output>.rows<lo>-<hi>.progress.json``, so
    concurrent-era range jobs never clobber each other's resume state).
    Re-running the same command after a crash/preemption skips finished
    chunks and recomputes at most one chunk; the sidecar is KEPT on
    completion, so an idempotent retry of an already-finished job
    recomputes nothing. The reference had no equivalent — its extractor
    was a sess.run loop with a single save at the end [TF1-IDIOM,
    SURVEY.md §3.2].

    ``rows``: restrict to a [lo, hi) record range — embeddings land at
    file offsets ``lo..hi`` of the FULL-length output, so disjoint
    ranges run sequentially (or from distinct jobs on a shared
    filesystem, one at a time) fill one file. An existing output is
    never silently recreated: incompatible shape/dtype raises, and a
    sidecar from a different range just means this range starts from
    its own beginning.

    ``fingerprint``: caller-supplied model/config identity string,
    recorded in the sidecar. A resumed run whose fingerprint differs
    (different checkpoint, quant mode, preprocessing...) discards the
    previous progress and recomputes its whole range instead of
    silently mixing embeddings from two models in one file
    (``cli.extract`` passes a digest of the restored weights).

    Returns the finished array (memmap, read mode).
    """
    import json
    import os

    n_total = source.index.count
    row_lo, row_hi = rows if rows is not None else (0, n_total)
    if not 0 <= row_lo < row_hi <= n_total:
        raise ValueError(f"rows [{row_lo}, {row_hi}) out of range for "
                         f"a {n_total}-record shard")
    if not output_path.endswith(".npy"):
        raise ValueError("resumable extraction writes .npy (the memmap "
                         f"format); got {output_path!r}")
    chunk_rows = chunk_rows or 64 * batch
    # align chunks to the batch grid so resume never re-pads a batch
    # the jitted program hasn't seen (ragged tails recompile)
    chunk_rows = max(batch, chunk_rows - chunk_rows % batch)

    if loader == "dct_domain":
        if getattr(net, "stem", None) != "dct":
            raise ValueError("loader='dct_domain' requires a stem='dct' "
                             "backbone (e.g. dct_resnet_50)")
        crop_from = crop_from or image_size

    # Partial ranges get range-scoped sidecars: two sharded jobs over
    # the same output must not overwrite each other's resume state.
    full_range = (row_lo, row_hi) == (0, n_total)
    sidecar = output_path + ("" if full_range
                             else f".rows{row_lo}-{row_hi}") \
        + ".progress.json"
    # The meta block is the resume contract: progress is only reused
    # when EVERY field matches, including the model/preprocess identity
    # (fingerprint) — otherwise a resumed run would silently mix
    # embeddings from two different models/configs in one output.
    meta = {"total_rows": n_total, "rows": [row_lo, row_hi],
            "chunk_rows": chunk_rows, "batch": batch,
            "image_size": image_size, "crop_from": crop_from,
            "loader": loader, "norm": norm, "fingerprint": fingerprint}
    done_chunks: set[int] = set()
    out = None
    if os.path.exists(output_path):
        # Never silently clobber: an existing output is either this
        # extraction's earlier progress (possibly a DIFFERENT row range
        # of the same corpus — sequential range jobs share one file) or
        # the wrong file, which the caller must delete explicitly.
        out = np.lib.format.open_memmap(output_path, mode="r+")
        if (out.ndim != 2 or out.shape[0] != n_total
                or out.dtype != np.float32):
            raise ValueError(
                f"{output_path} exists with shape {out.shape} "
                f"{out.dtype}, incompatible with this {n_total}-row "
                "extraction; delete it to start over")
        if os.path.exists(sidecar):
            try:
                with open(sidecar) as f:
                    prev = json.load(f)
            except (OSError, json.JSONDecodeError):
                prev = None
            if prev and all(prev.get(k) == v for k, v in meta.items()):
                done_chunks = set(prev.get("done", []))
            # else: sidecar belongs to another range/config — this
            # range simply starts from scratch (rows outside it are
            # untouched either way)

    def _save_sidecar():
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            json.dump({**meta, "done": sorted(done_chunks)}, f)
        os.replace(tmp, sidecar)

    fn = extract_fn or make_extract_fn(net, donate=False)
    chunks = list(range(row_lo, row_hi, chunk_rows))
    done_rows = sum(min(c + chunk_rows, row_hi) - c
                    for c in chunks if c in done_chunks)
    for clo in chunks:
        chi = min(clo + chunk_rows, row_hi)
        if clo in done_chunks:
            continue
        embs = []
        for x in _standardized_batches(
                source, image_size=image_size, crop_from=crop_from,
                batch=batch, num_threads=num_threads, loader=loader,
                norm=norm, rows=(clo, chi)):
            embs.append(fn(variables, x))
        chunk = np.concatenate([np.asarray(e, np.float32)
                                for e in embs])
        if out is None:
            out = np.lib.format.open_memmap(
                output_path, mode="w+", dtype=np.float32,
                shape=(n_total, chunk.shape[1]))
        if chunk.shape[1] != out.shape[1]:
            raise ValueError(
                f"embedding dim {chunk.shape[1]} vs existing "
                f"{output_path} dim {out.shape[1]}; delete the file "
                "if the model changed")
        out[clo:chi] = chunk
        out.flush()
        done_chunks.add(clo)
        _save_sidecar()
        done_rows += chi - clo
        if progress is not None:
            progress(done_rows, row_hi - row_lo)
    if out is None:  # everything was already done, file validated above
        out = np.lib.format.open_memmap(output_path, mode="r+")
    # The sidecar is kept on completion (all chunks recorded done): an
    # idempotent retry of a finished job — common after a scheduler
    # loses a node's "succeeded" status — must skip straight through,
    # not re-extract the corpus. It is a few hundred bytes.
    return np.lib.format.open_memmap(output_path, mode="r")


def _standardized_batches(source, *, image_size: int, crop_from: int = 0,
                          batch: int = 256, num_threads: int = 4,
                          limit_batches: int = 0, loader: str = "auto",
                          norm: str = "per_image",
                          rows: tuple[int, int] | None = None):
    """Yield the eval-chain standardized image batches of a shard
    (decode → resize to crop_from → center crop → standardize).

    ``rows``: half-open [lo, hi) record range — the unit of work for
    resumable/multi-job extraction. Default: the whole shard.

    ``norm``: "per_image" (reference tf.image semantics) or "fixed"
    ((x-127.5)/127.5 — imported InsightFace-ecosystem checkpoints,
    ops.preprocess.fixed_standardization). Pixel loaders only; the
    dct_domain path bakes per-image standardization into its
    frequency-domain prepare step.
    """
    from tf_face_toolbox_tpu.ops.preprocess import preprocess_eval

    crop_from = crop_from or image_size + 8
    if crop_from < image_size:
        raise ValueError(
            f"crop_from ({crop_from}) must be >= image_size "
            f"({image_size}): the eval chain center-crops image_size "
            f"out of the crop_from-sized resize")
    if loader == "auto":
        from tf_face_toolbox_tpu.data.native import native_available
        loader = "native" if native_available() else "python"
    n = source.index.count
    row_lo, row_hi = rows if rows is not None else (0, n)
    if not 0 <= row_lo <= row_hi <= n:
        raise ValueError(f"rows [{row_lo}, {row_hi}) out of range for "
                         f"a {n}-record shard")
    windows = [list(range(lo, min(lo + batch, row_hi)))
               for lo in range(row_lo, row_hi, batch)]
    if limit_batches:
        windows = windows[:limit_batches]

    if loader == "dct_domain":
        if norm != "per_image":
            raise ValueError(
                "loader='dct_domain' standardizes in the frequency "
                "domain (per-image only); fixed-norm imported models "
                "use a pixel loader")
        if crop_from != image_size:
            raise ValueError(
                f"loader='dct_domain' needs crop_from == image_size "
                f"(got {crop_from} vs {image_size}): center-cropping "
                f"coefficients would need a block-aligned offset; pack "
                f"the shard with --recode_size={image_size}")
        if image_size % 8:
            raise ValueError("image_size must be a multiple of 8 for "
                             "the dct domain")
        from tf_face_toolbox_tpu.data.native import NativeShardReader
        from tf_face_toolbox_tpu.ops.dct import prepare_coefficients
        reader = NativeShardReader(source.index.path,
                                   num_threads=num_threads)
        try:
            for bi, ids in enumerate(windows):
                if bi + 1 < len(windows):
                    reader.prefetch(windows[bi + 1])
                coef, qtab = reader.dct_batch(ids, image_size,
                                              image_size)
                yield prepare_coefficients(jnp.asarray(coef),
                                           jnp.asarray(qtab))
        finally:
            reader.close()
        return

    if loader in ("native", "native_dct"):
        from tf_face_toolbox_tpu.data.native import NativeShardReader
        if loader == "native_dct":
            from tf_face_toolbox_tpu.ops.jpeg_tpu import decode_dct
        reader = NativeShardReader(source.index.path,
                                   num_threads=num_threads)
        try:
            for bi, ids in enumerate(windows):
                if bi + 1 < len(windows):  # readahead next window
                    reader.prefetch(windows[bi + 1])
                if loader == "native_dct":
                    coef, qtab = reader.dct_batch(ids, crop_from,
                                                  crop_from)
                    u8 = decode_dct(jnp.asarray(coef),
                                    jnp.asarray(qtab))
                else:
                    u8 = jnp.asarray(
                        reader.decode_batch(ids, crop_from, crop_from))
                yield preprocess_eval(u8, image_size, image_size,
                                      norm)
        finally:
            reader.close()
        return

    from tf_face_toolbox_tpu.data.pipeline import _DecodePool, _resize_u8
    transform = lambda im: _resize_u8(im, crop_from, crop_from)  # noqa: E731
    pool = _DecodePool(source, num_threads) if num_threads > 1 else None
    try:
        for ids in windows:
            if pool is not None:
                records = pool.decode(ids, transform)
            else:
                records = [(transform(source.record(i)[0]), 0)
                           for i in ids]
            images = np.stack([r[0] for r in records])
            yield preprocess_eval(jnp.asarray(images), image_size,
                                  image_size, norm)
    finally:
        if pool is not None:
            pool.close()


def calibrate_on_shard(network: str, variables, source, *,
                       image_size: int, crop_from: int = 0,
                       batch: int = 128, num_batches: int = 4,
                       embedding_dim: int = 512, loader: str = "auto",
                       norm: str = "per_image",
                       dtype=jnp.float32, **net_kwargs):
    """Static-int8 calibration over the first ``num_batches`` batches of
    an eval shard (the serving distribution). Returns ``variables`` with
    the frozen ``quant_stats`` for ``quantized="static"`` serving."""
    from tf_face_toolbox_tpu.models import calibrate_quant_stats

    batches = _standardized_batches(
        source, image_size=image_size, crop_from=crop_from, batch=batch,
        limit_batches=num_batches, loader=loader, norm=norm)
    return calibrate_quant_stats(network, variables, batches,
                                 embedding_dim=embedding_dim,
                                 dtype=dtype, **net_kwargs)


def extract_dataset(net, variables, batches: Iterable[np.ndarray],
                    extract_fn: Callable | None = None) -> np.ndarray:
    """Extract embeddings for a stream of image batches (host loop).

    Mirrors the reference's per-batch sess.run loop (SURVEY.md §3.2 hot
    loop) but with async dispatch: the next batch's H2D transfer overlaps
    the current batch's compute because jax dispatch is non-blocking.
    """
    fn = extract_fn or make_extract_fn(net)
    outs = []
    for batch in batches:
        outs.append(fn(variables, jnp.asarray(batch)))
    return np.concatenate([np.asarray(o) for o in outs], axis=0)
