"""Embedding serving daemon CLI.

Loads a checkpoint (or imported .npz variables), warms ONE fixed-batch
compiled extractor, and serves HTTP with dynamic request batching
(serving/server.py):

    python -m tf_face_toolbox_tpu.cli.serve \
        --checkpoint_dir=/models/run --network=resnet_v1_50 \
        --port=8000 --max_batch=64 --max_wait_ms=5

    curl -s -X POST --data-binary @face.jpg localhost:8000/embed
    curl -s localhost:8000/healthz ; curl -s localhost:8000/stats
"""

from __future__ import annotations

import jax.numpy as jnp
from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_dir", "", "orbax train dir")
flags.DEFINE_string("variables_npz", "",
                    "serve imported variables (cli.import_tf1/keras) "
                    "instead of a checkpoint")
flags.DEFINE_string("bundle", "",
                    "boot from one-file deployment bundles "
                    "(cli.export) — each bundle's own config record "
                    "supplies network/stem/head/embedding_dim/"
                    "image_size/crop_from/input_norm/quant mode, so "
                    "those flags are ignored and int8 scales need no "
                    "calibration shard here. A comma-separated "
                    "[name=]path list serves SEVERAL models from one "
                    "daemon (route with ?model=<name> on HTTP / the "
                    "tfft-model metadata key on gRPC; first entry is "
                    "the default; name defaults to the bundle's "
                    "network)")
flags.DEFINE_string("network", "resnet_v1_50", "backbone name")
flags.DEFINE_enum("stem", "face", ["face", "imagenet", "space2depth"],
                  "backbone stem")
flags.DEFINE_enum("head", "gap", ["gap", "flatten"], "embedding head")
flags.DEFINE_enum("input_norm", "per_image", ["per_image", "fixed"],
                  "input standardization: per_image = the reference's "
                  "tf.image chain; fixed = (x-127.5)/127.5, what "
                  "imported InsightFace-ecosystem checkpoints "
                  "(cli.import_torch, iresnet_*) serve with")
flags.DEFINE_integer("embedding_dim", 512, "embedding size")
flags.DEFINE_integer("image_size", 112, "served input size")
flags.DEFINE_integer("crop_from", 0,
                     "eval source scale (0 = image_size + 8; requests "
                     "are resized here, then center-cropped on device "
                     "— the same chain as cli.extract)")
flags.DEFINE_bool("bf16", True, "bfloat16 compute")
flags.DEFINE_bool("use_ema", False, "serve the EMA weights")
flags.DEFINE_enum("engine", "auto", ["auto", "flax", "folded"],
                  "eval forward: auto = BN-folded when applicable")
flags.DEFINE_enum("quant_mode", "none", ["none", "dynamic", "static"],
                  "int8 serving; static needs --calibrate_data")
flags.DEFINE_string("calibrate_data", "",
                    "FaceShard sampled for static-int8 scales at boot")
flags.DEFINE_integer("calibrate_batches", 4,
                     "calibration batches (of --max_batch)")
flags.DEFINE_string("host", "127.0.0.1", "bind address")
flags.DEFINE_integer("port", 8000, "bind port")
flags.DEFINE_string("unix_socket", "",
                    "serve over an AF_UNIX socket at this path instead "
                    "of TCP (rolling restarts: the next daemon takes "
                    "the path over atomically while this one drains)")
flags.DEFINE_enum("transport", "http", ["http", "grpc"],
                  "wire protocol: http (stdlib front-end) or grpc "
                  "(raw-bytes tfft.Embedding service, "
                  "serving/grpc_server.py); both honor --host/--port/"
                  "--unix_socket and share the drain story")
flags.DEFINE_string("gallery", "",
                    "enable the 1:N endpoints (/enroll, /identify, "
                    "/gallery, /gallery/save) with this .npz snapshot "
                    "path: loaded at boot when it exists, saved on "
                    "drain. Bound to the default model's embedding "
                    "space; HTTP transport only")
flags.DEFINE_float("enroll_min_quality", 0.0,
                   "default feature-norm quality floor for /enroll "
                   "(0 = accept all; override per request with "
                   "&min_quality=)")
flags.DEFINE_enum("gallery_dtype", "float32",
                  ["float32", "bfloat16", "int8"],
                  "device store dtype for the gallery: bfloat16 halves "
                  "HBM (2x capacity, measured bit-identical scores); "
                  "int8 quarters it (4x capacity, two-stage search — "
                  "s8 MXU coarse pass + exact f32 rescore of the "
                  "candidates; docs/design.md gallery table)")
flags.DEFINE_float("gallery_hbm_gb", 8.0,
                   "gallery device-store budget; enrollments past it "
                   "are refused with HTTP 507 (0 = unbounded)")
flags.DEFINE_enum("gallery_overflow", "refuse", ["refuse", "stream"],
                  "past --gallery_hbm_gb: 'refuse' enrollments (507) "
                  "or 'stream' — keep enrolling and serve /identify "
                  "via exact slab-streamed search (latency degrades "
                  "to O(gallery bytes / PCIe), HBM stays bounded)")
flags.DEFINE_integer(
    "gallery_shards", 0,
    "shard the gallery over this many devices (DistributedGallery: "
    "rows striped over a data mesh, per-shard top-k merged over ICI; "
    "capacity scales to shards x --gallery_hbm_gb). 0 = single-device "
    "store; -1 = all visible devices. Sharded stores are refuse-only "
    "(--gallery_overflow=stream is single-device)")
flags.DEFINE_integer("max_batch", 64, "device batch (pad-to-batch)")
flags.DEFINE_float("max_wait_ms", 5.0,
                   "straggler wait after the first request of a batch")
flags.DEFINE_float("watch_interval", 0.0,
                   "poll --checkpoint_dir every N seconds and hot-swap "
                   "onto new checkpoints without dropping traffic "
                   "(TF-Serving-style version polling; 0 = off)")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()

    from tf_face_toolbox_tpu.serving.server import (
        DynamicBatcher,
        EmbeddingService,
        serve,
    )

    dtype = jnp.bfloat16 if FLAGS.bf16 else jnp.float32
    quant = False if FLAGS.quant_mode == "none" else FLAGS.quant_mode
    if FLAGS.bundle:
        if FLAGS.checkpoint_dir or FLAGS.variables_npz:
            raise SystemExit("--bundle is self-contained; drop "
                             "--checkpoint_dir/--variables_npz")
        if quant or FLAGS.calibrate_data:
            raise SystemExit("--bundle bakes the quant mode and scales "
                             "in at export time; drop --quant_mode/"
                             "--calibrate_data")
        if FLAGS.watch_interval > 0:
            raise SystemExit("--watch_interval polls a train dir; "
                             "bundles are immutable artifacts")
    else:
        if quant == "static" and not FLAGS.calibrate_data:
            raise SystemExit("--quant_mode=static needs --calibrate_data "
                             "(a shard sampled for activation scales)")
        if bool(FLAGS.checkpoint_dir) == bool(FLAGS.variables_npz):
            raise SystemExit("pass exactly one of --checkpoint_dir / "
                             "--variables_npz / --bundle")
        if FLAGS.watch_interval > 0 and not FLAGS.checkpoint_dir:
            raise SystemExit("--watch_interval polls a --checkpoint_dir")
    if FLAGS.engine == "folded" and quant:
        raise SystemExit("--engine folded serves fp; int8 uses flax")

    # --bundle takes a comma-separated list of [name=]path entries —
    # more than one boots the TF-Serving-style multi-model server
    # (serving/server.py serve() docstring): each bundle gets its own
    # service/batcher; requests route with ?model=<name> on HTTP or
    # the tfft-model metadata key on gRPC (name defaults to the
    # bundle's network), first entry is the default model.
    bundle_specs = []
    if FLAGS.bundle:
        for entry in FLAGS.bundle.split(","):
            name, sep, path = entry.partition("=")
            bundle_specs.append((name.strip() if sep else None,
                                 (path if sep else entry).strip()))

    def boot_bundle(path):
        """One bundle → (EmbeddingService ready to warm, meta)."""
        import jax

        from tf_face_toolbox_tpu.serving.bundle import (
            network_from_meta, read_bundle)

        bundle_vars, meta = read_bundle(path)
        q = (False if meta["quant_mode"] == "none"
             else meta["quant_mode"])
        if FLAGS.engine == "folded" and q:
            raise SystemExit(f"--engine folded serves fp; bundle {path} "
                             f"bakes in int8 ({meta['quant_mode']})")
        net = network_from_meta(meta, dtype=dtype)
        variables = jax.tree.map(jnp.asarray, bundle_vars)
        apply_fn = None
        if FLAGS.engine != "flax" and not q:
            from tf_face_toolbox_tpu.serving import make_serving_apply
            try:
                apply_fn = make_serving_apply(net, variables)
            except ValueError as e:
                if FLAGS.engine == "folded":
                    raise SystemExit(f"--engine folded: {e}") from e
                logging.info("serving engine not applicable (%s); "
                             "using net.apply", e)
        logging.info("bundle %s: %s step=%s quant=%s norm=%s", path,
                     meta["network"], meta.get("step"),
                     meta["quant_mode"], meta["input_norm"])
        service = EmbeddingService(
            net, variables, image_size=int(meta["image_size"]),
            crop_from=int(meta.get("crop_from", 0)),
            batch=FLAGS.max_batch, apply_fn=apply_fn, dtype=dtype,
            norm=meta["input_norm"], step=meta.get("step"))
        return service, meta

    def prepare(net, variables, *, boot=False):
        """Post-restore serving prep (static-int8 calibration + BN
        fold) — shared verbatim by boot and hot reload, so a reloaded
        model goes through exactly the chain the booted one did.
        ``boot`` gates the exit-the-process error translation: inside
        the watcher thread a failure must stay an ordinary exception
        (logged, retried next poll), never a SystemExit — which
        BaseException-ness would silently kill the watcher."""
        if quant == "static":
            from tf_face_toolbox_tpu.data.pipeline import FaceShardSource
            from tf_face_toolbox_tpu.extract import calibrate_on_shard

            logging.info("calibrating static-int8 scales on %d batches "
                         "of %s", FLAGS.calibrate_batches,
                         FLAGS.calibrate_data)
            variables = calibrate_on_shard(
                FLAGS.network, variables,
                FaceShardSource(FLAGS.calibrate_data),
                image_size=FLAGS.image_size, crop_from=FLAGS.crop_from,
                batch=min(FLAGS.max_batch, 128),
                num_batches=FLAGS.calibrate_batches,
                embedding_dim=FLAGS.embedding_dim, dtype=dtype,
                norm=FLAGS.input_norm,
                stem=FLAGS.stem, head_variant=FLAGS.head)
        apply_fn = None
        if FLAGS.engine != "flax" and not quant:
            from tf_face_toolbox_tpu.serving import make_serving_apply
            try:
                apply_fn = make_serving_apply(net, variables)
            except ValueError as e:
                if FLAGS.engine == "folded":
                    if boot:
                        raise SystemExit(f"--engine folded: {e}") from e
                    raise
                logging.info("serving engine not applicable (%s); "
                             "using net.apply", e)
        return variables, apply_fn

    if bundle_specs:
        batcher_map = {}
        for name, path in bundle_specs:
            svc, meta = boot_bundle(path)
            key = name or meta["network"]
            if key in batcher_map:
                raise SystemExit(f"duplicate model name {key!r}; "
                                 "disambiguate with --bundle name=path")
            logging.info("warming %s (b%d)...", key, FLAGS.max_batch)
            svc.warmup()
            batcher_map[key] = DynamicBatcher(
                svc, max_wait_ms=FLAGS.max_wait_ms)
        # one UNNAMED model → the plain single-model server (same
        # payload shapes as checkpoint/npz boots); several, or an
        # explicit name= (the user will route by it) → the model router
        single_unnamed = (len(bundle_specs) == 1
                          and bundle_specs[0][0] is None)
        batcher = (next(iter(batcher_map.values()))
                   if single_unnamed else batcher_map)
        all_batchers = list(batcher_map.values())
        watcher = None
        return _serve_front_end(batcher, all_batchers, watcher)

    boot_step = None
    if FLAGS.variables_npz:
        import jax

        from tf_face_toolbox_tpu.interop.port import load_variables_npz
        from tf_face_toolbox_tpu.models import create_network

        kwargs = dict(stem=FLAGS.stem, head_variant=FLAGS.head)
        if quant:
            kwargs["quantized"] = quant
        net = create_network(FLAGS.network,
                             embedding_dim=FLAGS.embedding_dim,
                             dtype=dtype, **kwargs)
        variables = jax.tree.map(jnp.asarray,
                                 load_variables_npz(FLAGS.variables_npz))
    else:
        from tf_face_toolbox_tpu.pretrained import load_variables
        from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

        # step read BEFORE the restore (the ordering rebuild() also
        # uses): if a newer checkpoint lands during the restore, the
        # recorded step undershoots what was loaded and the watcher's
        # first poll reloads — reading after would overshoot and make
        # the watcher skip the new version forever
        boot_step = CheckpointManager(FLAGS.checkpoint_dir).latest_step()
        net, variables = load_variables(
            FLAGS.checkpoint_dir, FLAGS.network, FLAGS.embedding_dim,
            FLAGS.image_size, dtype, use_ema=FLAGS.use_ema,
            stem=FLAGS.stem, head=FLAGS.head, quantized=quant)

    variables, apply_fn = prepare(net, variables, boot=True)

    service = EmbeddingService(net, variables,
                               image_size=FLAGS.image_size,
                               crop_from=FLAGS.crop_from,
                               batch=FLAGS.max_batch,
                               apply_fn=apply_fn, dtype=dtype,
                               norm=FLAGS.input_norm, step=boot_step)
    logging.info("warming the b%d compiled extractor...", FLAGS.max_batch)
    service.warmup()
    batcher = DynamicBatcher(service, max_wait_ms=FLAGS.max_wait_ms)

    watcher = None
    if FLAGS.watch_interval > 0:
        from tf_face_toolbox_tpu.pretrained import load_variables
        from tf_face_toolbox_tpu.serving.reload import CheckpointWatcher
        from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

        def rebuild():
            # step read BEFORE restore: if a newer checkpoint lands in
            # between, the recorded step undershoots and the next poll
            # simply reloads again — converges, never serves stale
            step = CheckpointManager(FLAGS.checkpoint_dir).latest_step()
            _, v = load_variables(
                FLAGS.checkpoint_dir, FLAGS.network, FLAGS.embedding_dim,
                FLAGS.image_size, dtype, use_ema=FLAGS.use_ema,
                stem=FLAGS.stem, head=FLAGS.head, quantized=quant)
            v, a = prepare(net, v)
            return v, a, step

        watcher = CheckpointWatcher(service, FLAGS.checkpoint_dir,
                                    rebuild,
                                    interval=FLAGS.watch_interval).start()
        logging.info("watching %s every %.1fs for new checkpoints",
                     FLAGS.checkpoint_dir, FLAGS.watch_interval)
    return _serve_front_end(batcher, [batcher], watcher)


def _serve_front_end(batcher, all_batchers, watcher):
    """Bind the transport, block until SIGTERM/SIGINT, drain, exit.

    ``batcher`` is what the front-end serves (one DynamicBatcher or the
    multi-model ``{name: batcher}`` map); ``all_batchers`` is the flat
    list to close at drain time."""
    from tf_face_toolbox_tpu.serving.server import serve

    gallery = None
    if FLAGS.gallery:
        if FLAGS.transport == "grpc":
            raise SystemExit("--gallery endpoints are HTTP-only")
        import os

        from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

        first = (next(iter(batcher.values())) if isinstance(batcher, dict)
                 else batcher)
        dim = getattr(first.service._net, "embedding_dim", 0)
        if not dim:       # nets without the attr: probe one warm batch
            import numpy as _np
            dim = first.service.embed_batch(_np.zeros(
                (1, first.service.crop_from, first.service.crop_from, 3),
                "uint8")).shape[1]
        if FLAGS.gallery_shards:
            if FLAGS.gallery_overflow == "stream":
                raise SystemExit(
                    "--gallery_overflow=stream is single-device; a "
                    "sharded gallery (--gallery_shards) is refuse-only "
                    "— past capacity, use cli.search offline")
            import jax

            from tf_face_toolbox_tpu.parallel.mesh import create_mesh
            from tf_face_toolbox_tpu.serving.distributed_gallery import (
                DistributedGallery,
            )

            n = (len(jax.devices()) if FLAGS.gallery_shards < 0
                 else FLAGS.gallery_shards)
            store_cls = DistributedGallery
            gkw = dict(dtype=FLAGS.gallery_dtype,
                       hbm_limit_gb=FLAGS.gallery_hbm_gb,
                       mesh=create_mesh(data=n))
            logging.info("gallery sharded over %d devices", n)
        else:
            store_cls = DeviceGallery
            gkw = dict(dtype=FLAGS.gallery_dtype,
                       hbm_limit_gb=FLAGS.gallery_hbm_gb,
                       overflow=FLAGS.gallery_overflow)
        if os.path.exists(FLAGS.gallery):
            gallery = store_cls.load(FLAGS.gallery, **gkw)
            if gallery.dim != dim:
                raise SystemExit(
                    f"--gallery={FLAGS.gallery} holds {gallery.dim}-d "
                    f"embeddings; the served model produces {dim}-d")
            logging.info("gallery loaded: %d enrolled", len(gallery))
        else:
            gallery = store_cls(dim, **gkw)
    if FLAGS.transport == "grpc":
        from tf_face_toolbox_tpu.serving.grpc_server import serve_grpc

        server = serve_grpc(batcher, host=FLAGS.host, port=FLAGS.port,
                            unix_socket=FLAGS.unix_socket or None)
        where = (f"unix:{FLAGS.unix_socket}" if FLAGS.unix_socket else
                 f"grpc://{FLAGS.host}:{server.bound_port}")
    else:
        server = serve(batcher, host=FLAGS.host, port=FLAGS.port,
                       unix_socket=FLAGS.unix_socket or None,
                       gallery=gallery,
                       enroll_min_quality=FLAGS.enroll_min_quality)
        where = (f"unix:{FLAGS.unix_socket}" if FLAGS.unix_socket else
                 f"http://{FLAGS.host}:{server.server_address[1]}")
    models = (" models=" + ",".join(batcher)
              if isinstance(batcher, dict) else "")
    print(f"serving on {where} "
          f"(batch={FLAGS.max_batch}, wait={FLAGS.max_wait_ms}ms)"
          f"{models}",
          flush=True)
    import signal
    import threading

    stop = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: stop.set())
    stop.wait()
    # graceful drain for rolling restarts: stop accepting, let running
    # handlers finish against the still-live batcher, then shut it down
    logging.info("draining: no new connections; completing in-flight")
    if watcher is not None:
        watcher.stop()
    if FLAGS.transport == "grpc":
        # gRPC's native drain: refuse new RPCs, finish in-flight ones
        if not server.stop(grace=30).wait(timeout=35):
            logging.warning("drain timeout: abandoning stuck RPCs")
    else:
        server.shutdown()       # stop the accept loop
        # server_close does NOT join daemon handler threads (py3.12);
        # wait_idle tracks in-flight requests explicitly, against the
        # still-live batcher so they complete normally
        if not server.wait_idle(timeout=30):
            logging.warning("drain timeout: abandoning stuck handlers")
        server.server_close()
    for b in all_batchers:
        b.close()
    if gallery is not None and FLAGS.gallery:
        n = gallery.save(FLAGS.gallery)
        logging.info("gallery snapshot: %d enrolled -> %s", n,
                     FLAGS.gallery)
    print("drained; bye", flush=True)


if __name__ == "__main__":
    app.run(main)
