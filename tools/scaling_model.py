"""Falsifiable v5e-8 scaling prediction for the multi-chip configs
(VERDICT r3 next-step #3).

Multi-chip *correctness* is already covered (CPU-mesh equality tests,
two-process jax.distributed runs, the driver's dryrun); what was
missing is a *performance model* a first real multi-chip run can
falsify. This tool derives one from first principles plus measured
single-chip step rates:

1. Build the REAL train step (full CONFIG_5/CONFIG_7 shapes — batch
   2048, 112², the real identity counts) over a virtual n-device CPU
   mesh and lower it. The shard_map program carries every collective
   explicitly (psum → stablehlo.all_reduce etc.), with PER-SHARD
   operand shapes and replica_groups — so the communication volume is
   read off the compiler IR, not hand math.
2. Classify each collective by mesh axis (data / model / all) from its
   replica_groups, and convert local operand bytes to per-chip ICI
   traffic with the standard ring-algorithm costs:
       all_reduce      2·S·(g−1)/g   sent per chip
       all_gather        S·(g−1)     (S = local input)
       reduce_scatter  S·(g−1)/g     (S = local input)
       collective_permute S
3. Combine with the measured single-chip step rate (docs/design.md:
   3.2k faces/sec b256 imagenet-stem, 1.96k face-stem, augment on) and
   an ICI bandwidth assumption to predict step time and scaling
   efficiency at the target mesh.

Bandwidth model (documented so the first real run can correct it):
v5e spec is 1,600 Gbps/chip aggregate bidirectional ICI. A ring
all-reduce sends and receives concurrently on bidirectional links, so
the time model is sent_bytes / one_way_bw with one_way_bw =
--ici_gbps/2 per chip (default 1600 → 100 GB/s one-way). --overlap
models XLA's backward/all-reduce overlap (0 = fully exposed comm, the
conservative bound; the table reports both 0 and 1).

    TFFT_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    python tools/scaling_model.py --config v5e8_data_parallel \\
        --data 8 --model 1 --measured_faces_per_sec 1960

Emits one JSON object: per-collective inventory + the prediction.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import argparse  # noqa: E402
import json  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "i32": 4, "ui32": 4, "i64": 8,
          "ui8": 1, "i8": 1, "f64": 8, "i1": 1, "u8": 1, "pred": 1,
          "i16": 2, "ui16": 2}

_COLLECTIVES = ("all_reduce", "all_gather", "reduce_scatter",
                "collective_permute", "all_to_all")


def _elem_bytes(ty: str) -> int:
    return _BYTES.get(ty, 4)


def collect_collectives(lowered) -> list[dict]:
    """Walk a ``jax.jit(...).lower(...)`` module and inventory every
    collective op: kind, per-shard operand bytes, replica group size,
    and the raw groups (for axis classification)."""
    from jax._src.lib.mlir import ir

    mod = lowered.compiler_ir(dialect="stablehlo")
    found: list[dict] = []

    def visit(op):
        name = op.operation.name
        if any(k in name for k in _COLLECTIVES):
            local = 0
            for v in op.operands:
                try:
                    t = v.type
                    n = int(np.prod(t.shape)) if t.shape else 1
                    local += n * _elem_bytes(str(t.element_type))
                except Exception:
                    pass
            groups = None
            try:
                rg = op.attributes["replica_groups"]
                groups = np.array(ir.DenseIntElementsAttr(rg)).tolist()
            except Exception:
                pass
            # collective_permute has source_target_pairs instead
            gsize = len(groups[0]) if groups else 2
            found.append({
                "kind": name.split(".")[-1],
                "local_bytes": int(local),
                "group_size": int(gsize),
                "groups": groups,
            })
        for r in op.operation.regions:
            for b in r.blocks:
                for o in b.operations:
                    visit(o)

    for o in mod.body.operations:
        visit(o)
    return found


def classify_axis(groups, data: int, model: int) -> str:
    """Match replica_groups against the (data, model) mesh layout
    (device id = d*model + m, the create_mesh ordering)."""
    if groups is None:
        return "pairs"
    gs = sorted(tuple(sorted(g)) for g in groups)
    all_ids = tuple(range(data * model))
    if gs == [all_ids]:
        return "all"
    data_groups = sorted(tuple(sorted(d * model + m for d in range(data)))
                         for m in range(model))
    if gs == data_groups:
        return "data"
    model_groups = sorted(tuple(sorted(d * model + m for m in range(model)))
                          for d in range(data))
    if gs == model_groups:
        return "model"
    return "other"


def ici_sent_bytes(kind: str, local: int, g: int) -> float:
    """Ring-algorithm bytes SENT per chip for one collective."""
    if g <= 1:
        return 0.0
    if kind == "all_reduce":
        return 2.0 * local * (g - 1) / g
    if kind == "all_gather":
        return float(local) * (g - 1)
    if kind == "reduce_scatter":
        return float(local) * (g - 1) / g
    if kind == "all_to_all":
        return float(local) * (g - 1) / g
    return float(local)   # collective_permute


def analyze(step_fn, state, images, labels, *, data: int,
            model: int) -> dict:
    lowered = jax.jit(step_fn).lower(state, images, labels)
    inv = collect_collectives(lowered)
    # aggregate identical records
    agg: dict = {}
    for rec in inv:
        axis = classify_axis(rec["groups"], data, model)
        key = (rec["kind"], axis, rec["local_bytes"], rec["group_size"])
        agg.setdefault(key, 0)
        agg[key] += 1
    rows = []
    total_sent = 0.0
    for (kind, axis, local, g), count in sorted(agg.items()):
        sent = ici_sent_bytes(kind, local, g) * count
        total_sent += sent
        rows.append({"kind": kind, "axis": axis, "count": count,
                     "local_mb": round(local / 1e6, 3),
                     "group_size": g,
                     "ici_sent_mb_per_chip": round(sent / 1e6, 3)})
    return {"collectives": rows,
            "ici_sent_mb_per_chip_per_step": round(total_sent / 1e6, 2)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="v5e8_data_parallel")
    p.add_argument("--data", type=int, default=8)
    p.add_argument("--model", type=int, default=1)
    p.add_argument("--measured_faces_per_sec", type=float, default=0.0,
                   help="measured SINGLE-chip training rate at this "
                        "config's per-chip batch (docs/design.md rows); "
                        "0 skips the time prediction")
    p.add_argument("--ici_gbps", type=float, default=1600.0,
                   help="aggregate bidirectional ICI Gbps per chip "
                        "(v5e spec: 1600)")
    args = p.parse_args()

    if os.environ.get("TFFT_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from tf_face_toolbox_tpu.configs import get_config
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    cfg = get_config(args.config)
    n = args.data * args.model
    mesh = create_mesh(data=args.data, model=args.model)
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    step_fn = make_train_step(net, cfg, mesh, state)
    if cfg.augment:
        images = jax.ShapeDtypeStruct(
            (cfg.global_batch, cfg.crop_from, cfg.crop_from, 3),
            jnp.uint8)
    else:
        images = jax.ShapeDtypeStruct(
            (cfg.global_batch, cfg.image_size, cfg.image_size, 3),
            jnp.float32)
    labels = jax.ShapeDtypeStruct((cfg.global_batch,), jnp.int32)

    report = {"config": args.config,
              "mesh": {"data": args.data, "model": args.model},
              "global_batch": cfg.global_batch,
              "per_chip_batch": cfg.global_batch // n}
    report.update(analyze(step_fn, state, images, labels,
                          data=args.data, model=args.model))

    params_mb = sum(x.size * x.dtype.itemsize for x in
                    jax.tree_util.tree_leaves(state.params)) / 1e6
    report["backbone_param_mb"] = round(params_mb, 1)

    if args.measured_faces_per_sec > 0:
        one_way_gbps = args.ici_gbps / 2.0
        t_comp = report["per_chip_batch"] / args.measured_faces_per_sec
        t_comm = (report["ici_sent_mb_per_chip_per_step"] * 1e6
                  / (one_way_gbps / 8 * 1e9))
        pred = {}
        for overlap, tagname in ((0.0, "no_overlap"), (1.0, "full_overlap")):
            t_step = t_comp + (1.0 - overlap) * t_comm
            pred[tagname] = {
                "step_ms": round(t_step * 1e3, 2),
                "faces_per_sec": round(cfg.global_batch / t_step, 1),
                "scaling_efficiency": round(t_comp / t_step, 4),
            }
        report["prediction"] = {
            "assumes": {
                "single_chip_faces_per_sec": args.measured_faces_per_sec,
                "ici_gbps_bidirectional": args.ici_gbps,
                "time_model": "sent_bytes / (ici_gbps/2)",
            },
            "compute_ms_per_step": round(t_comp * 1e3, 2),
            "comm_ms_per_step_exposed": round(t_comm * 1e3, 3),
            **pred,
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
