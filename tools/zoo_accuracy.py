"""Discriminating zoo accuracy protocol (v2 — VERDICT r4 #3).

The r4 protocol (tools/margin_study.py: 200 identities, 400 steps,
200 held-out pairs) saturates at its own ceiling: accuracy granularity
is 1/200 = 0.005, so five of six zoo entries tied at 0.995 and the
number carried no information beyond "trains correctly".

v2 scales every axis that bounds the protocol's resolution:

- **1000 structured identities** at noise 4.0 (harder separation task:
  a 1.2M-param net can no longer match a 24M-param net);
- **800 steps, batch 256**, batches synthesized ON DEVICE from a
  150 MB resident template bank (the tunnel's H2D is too slow to
  stage batches — the distill_demo/qat_study recipe), so the longer
  schedule costs device time only;
- **4000 held-out pairs** (100 identities x 8 fresh images; 2000 same
  / 2000 diff, same/diff interleaved so each of the 10 folds mixes
  classes) — granularity 2.5e-4, and every accuracy ships with its
  95% binomial CI (+/- 1.96*sqrt(p(1-p)/4000), ~+/-0.003 at p=0.99).

The resnet_v1_50 anchor runs first by default: the protocol is
calibrated so it lands measurably BELOW 1.0-saturation, which is what
lets entries separate (a ceiling protocol cannot rank).

    python tools/zoo_accuracy.py [net ...|all]        # anchor + nets
    python tools/zoo_accuracy.py --distill mobilefacenet
        # closes the small-net gap with the repo's own deployment
        # story: r50 teacher (this same protocol) -> embedding-space
        # distillation mixed with the margin loss -> re-eval

Results go to docs/design.md's measured-zoo table.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("TFFT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TFFT_PLATFORM"])

from tf_face_toolbox_tpu.extract import flip_averaged_embeddings  # noqa: E402
from tf_face_toolbox_tpu.models import create_network  # noqa: E402
from tf_face_toolbox_tpu.ops.verification import verify_folds  # noqa: E402
from tf_face_toolbox_tpu.parallel.mesh import create_mesh  # noqa: E402
from tf_face_toolbox_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    create_train_state,
    make_train_step,
)

NUM_IDS, SIZE, B = 1000, 112, 256
# Difficulty knobs (module globals set by --noise/--fine/--steps BEFORE
# any jit traces). FINE shrinks the identity-specific template
# component against a SHARED base pattern — the fine-grained regime
# real face recognition lives in (all faces share structure; identity
# is a small deviation) — so capacity-limited nets separate from large
# ones instead of everyone denoising an easy task to the ceiling.
NOISE = 4.0
FINE = 1.0
STEPS = 800
EVAL_IDS, EVAL_PER_ID = 100, 8          # 800 held-out images
PAIRS_PER_SIDE = 2000                   # 2000 same + 2000 diff
B_EVAL = 200

# Per-net TrainConfig overrides. ViTs: SGD at the CNN lr diverges on
# transformers at this step count; 0.02 + longer warmup trains.
NETS = {
    "resnet_v1_50": dict(),             # the anchor (imagenet stem)
    "resnet_v1_50.face": dict(network="resnet_v1_50", stem="face"),
    "resnet_v1_50.s2d": dict(network="resnet_v1_50",
                             stem="space2depth"),
    "dct_resnet_50": dict(),
    "iresnet_50": dict(),
    "iresnet_100": dict(),
    "mobilefacenet": dict(),
    "mobilefacenet_x2": dict(),
    "dct_vit_small": dict(base_lr=0.02, warmup_steps=100),
    "dct_vit_tiny": dict(base_lr=0.02, warmup_steps=100),
}


def make_templates() -> np.ndarray:
    """Per-identity smooth sinusoid templates (vectorized over the
    identity axis — 1000 x 112^2 x 3 builds in ~1 s, 150 MB).

    With FINE < 1 every identity shares one base pattern and differs
    only by FINE x its own sinusoids, then the bank is re-standardized
    — identity signal-to-shared-structure shrinks by FINE while the
    additive NOISE stays, which is the discriminating regime."""
    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.02, 0.2, (NUM_IDS + 1, 6)).astype(np.float32)
    phases = rng.uniform(0, 6.28, (NUM_IDS + 1, 6)).astype(np.float32)
    y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)

    def bank(f, p):
        t = np.empty(f.shape[:1] + (SIZE, SIZE, 3), np.float32)
        for c in range(3):
            t[..., c] = (
                np.sin(f[:, None, None, 2 * c] * y * 6.28
                       + p[:, None, None, 2 * c])
                + np.cos(f[:, None, None, 2 * c + 1] * x * 6.28
                         + p[:, None, None, 2 * c + 1]))
        return t

    t = bank(freqs[:NUM_IDS], phases[:NUM_IDS])
    if FINE < 1.0:
        base = bank(freqs[NUM_IDS:], phases[NUM_IDS:])  # (1, S, S, 3)
        t = base + FINE * t
    return (t - t.mean()) / (t.std() + 1e-6)


_TPL = None


def templates_dev():
    global _TPL
    if _TPL is None:
        _TPL = jax.device_put(jnp.asarray(make_templates()))
    return _TPL


@jax.jit
def make_batch(tpl, key):
    kl, kn = jax.random.split(key)
    labels = jax.random.randint(kl, (B,), 0, NUM_IDS)
    imgs = tpl[labels] + NOISE * jax.random.normal(
        kn, (B, SIZE, SIZE, 3))
    return imgs, labels.astype(jnp.int32)


def train_net(name: str, cfg_kw: dict, teacher=None,
              teacher_net=None, steps: int | None = None):
    steps = STEPS if steps is None else steps
    defaults = dict(network=name, num_classes=NUM_IDS, image_size=SIZE,
                    global_batch=B, dtype=jnp.bfloat16, augment=False,
                    base_lr=0.05, warmup_steps=50, weight_decay=5e-4,
                    margin_scale=32.0, margin_m2=0.3, margin_m3=0.0,
                    lr_boundaries=(int(steps * 0.625),
                                   int(steps * 0.875)))
    cfg_kw = dict(cfg_kw)                # NETS entries are reused
    stem = cfg_kw.pop("stem", "imagenet")
    cfg = TrainConfig(**{**defaults, **cfg_kw})
    mesh = create_mesh()
    net = create_network(cfg.network, embedding_dim=cfg.embedding_dim,
                         dtype=cfg.dtype, stem=stem)
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=net)
    tkw = {}
    if teacher is not None:
        tkw = dict(teacher=(teacher_net, teacher))
    step_fn = make_train_step(net, cfg, mesh, state, **tkw)
    tpl = templates_dev()
    t0 = time.time()
    for step in range(steps):
        imgs, labels = make_batch(tpl, jax.random.key(1000 + step))
        state, m = step_fn(state, imgs, labels)
        if step == 0 or (step + 1) % 200 == 0:
            print(f"  [{name}] step {step + 1} "
                  f"loss {float(m['loss']):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return state, net


def held_out_embeddings(state, net) -> tuple[np.ndarray, np.ndarray]:
    """EVAL_IDS x EVAL_PER_ID fresh noisy images of TRAINED identities
    (the margin-study convention), embedded flip-averaged on device in
    fixed B_EVAL chunks (one compile shape)."""
    extract = jax.jit(lambda v, im: flip_averaged_embeddings(
        lambda vv, xx: net.apply(vv, xx, train=False), v, im))
    r = np.random.default_rng(999)
    ids = r.choice(NUM_IDS, EVAL_IDS, replace=False)
    labels = np.repeat(ids, EVAL_PER_ID).astype(np.int32)
    tpl = templates_dev()
    v = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def synth(t, key, lab):
        # templates ride as an ARGUMENT: a closure would bake the
        # (ids, 112, 112, 3) bank into the compiled program as a
        # constant — 600 MB at 4000 ids, refused by the remote-compile
        # transport (HTTP 413) and wasteful everywhere else
        return t[lab] + NOISE * jax.random.normal(
            key, (B_EVAL, SIZE, SIZE, 3))

    chunks = []
    n = len(labels)
    assert n % B_EVAL == 0
    for i in range(0, n, B_EVAL):
        imgs = synth(tpl, jax.random.key(7000 + i),
                     jnp.asarray(labels[i:i + B_EVAL]))
        chunks.append(np.asarray(extract(v, imgs)))
    return np.concatenate(chunks), labels


def build_pairs(labels: np.ndarray, seed: int = 1234):
    """2000 same + 2000 diff pairs over the held-out set, interleaved
    same/diff so every verify_folds fold mixes both classes."""
    rng = np.random.default_rng(seed)
    by_id: dict[int, np.ndarray] = {}
    for lab in np.unique(labels):
        by_id[int(lab)] = np.where(labels == lab)[0]
    ids = sorted(by_id)
    per_id = PAIRS_PER_SIDE // len(ids)          # 20 of the 28 combos
    same = []
    for lab in ids:
        rows = by_id[lab]
        combos = [(int(rows[i]), int(rows[j]))
                  for i in range(len(rows))
                  for j in range(i + 1, len(rows))]
        pick = rng.permutation(len(combos))[:per_id]
        same.extend(combos[p] for p in pick)
    diff = []
    while len(diff) < PAIRS_PER_SIDE:
        a, b = rng.choice(len(ids), 2, replace=False)
        diff.append((int(rng.choice(by_id[ids[a]])),
                     int(rng.choice(by_id[ids[b]]))))
    i1 = np.empty(2 * PAIRS_PER_SIDE, np.int64)
    i2 = np.empty(2 * PAIRS_PER_SIDE, np.int64)
    lab = np.empty(2 * PAIRS_PER_SIDE, np.int64)
    i1[0::2] = [p[0] for p in same]
    i2[0::2] = [p[1] for p in same]
    lab[0::2] = 1
    i1[1::2] = [p[0] for p in diff]
    i2[1::2] = [p[1] for p in diff]
    lab[1::2] = 0
    return i1, i2, lab


def evaluate(state, net) -> dict:
    emb, labels = held_out_embeddings(state, net)
    i1, i2, lab = build_pairs(labels)
    sims = np.sum(emb[i1] * emb[i2], axis=1) / (
        np.linalg.norm(emb[i1], axis=1)
        * np.linalg.norm(emb[i2], axis=1) + 1e-12)
    rep = verify_folds(sims, lab)
    acc = float(rep["accuracy_mean"])
    n = len(lab)
    ci = 1.96 * float(np.sqrt(max(acc * (1 - acc), 1e-12) / n))
    return {"accuracy": acc, "ci95": ci, "n_pairs": n,
            "fold_std": float(rep["accuracy_std"])}


def run_entry(name: str, teacher=None, teacher_net=None) -> dict:
    t0 = time.time()
    state, net = train_net(name, NETS.get(name, {}), teacher=teacher,
                           teacher_net=teacher_net)
    r = evaluate(state, net)
    r["wall_s"] = time.time() - t0
    tag = name + (" (distilled)" if teacher is not None else "")
    print(f"{tag:28s} verification {r['accuracy']:.4f} "
          f"± {r['ci95']:.4f} (95% binomial CI, n={r['n_pairs']}; "
          f"fold std {r['fold_std']:.4f}; {r['wall_s']:.0f}s)",
          flush=True)
    return r, state, net


def main():
    global NOISE, FINE, STEPS, NUM_IDS, EVAL_IDS
    ap = argparse.ArgumentParser()
    ap.add_argument("nets", nargs="*",
                    default=["resnet_v1_50", "mobilefacenet"])
    ap.add_argument("--distill", default="",
                    help="train this student against a teacher "
                         "(trained first on the same protocol) with "
                         "distill_alpha mixing")
    ap.add_argument("--teacher", default="resnet_v1_50",
                    help="teacher net for --distill; under protocol "
                         "v2 iresnet_50 is the strongest teacher")
    ap.add_argument("--distill_alpha", type=float, default=0.7)
    ap.add_argument("--noise", type=float, default=NOISE)
    ap.add_argument("--fine", type=float, default=FINE)
    ap.add_argument("--steps", type=int, default=STEPS)
    ap.add_argument("--ids", type=int, default=NUM_IDS)
    args = ap.parse_args()
    NOISE, FINE, STEPS, NUM_IDS = (args.noise, args.fine, args.steps,
                                   args.ids)
    EVAL_IDS = min(EVAL_IDS, NUM_IDS)   # quick runs with --ids < 100
    print(f"protocol: ids={NUM_IDS} noise={NOISE} fine={FINE} "
          f"steps={STEPS} pairs={2 * PAIRS_PER_SIDE}", flush=True)
    names = args.nets
    if names == ["all"]:
        names = list(NETS)

    if args.distill:
        _, tstate, tnet = run_entry(args.teacher)
        tvars = {"params": tstate.params,
                 "batch_stats": tstate.batch_stats}
        kw = dict(NETS.get(args.distill, {}))
        kw["distill_alpha"] = args.distill_alpha
        t0 = time.time()
        state, net = train_net(args.distill, kw, teacher=tvars,
                               teacher_net=tnet)
        r = evaluate(state, net)
        r["wall_s"] = time.time() - t0
        print(f"{args.distill + ' (distilled)':28s} verification "
              f"{r['accuracy']:.4f} ± {r['ci95']:.4f} "
              f"(alpha={args.distill_alpha}; {r['wall_s']:.0f}s)",
              flush=True)
        return

    for n in names:
        run_entry(n)


if __name__ == "__main__":
    main()
