"""Margin-variant comparison on real TPU hardware.

Trains ResNet-50 on structured synthetic identities (noise 3.5x template
scale) and evaluates held-out pair verification.
Measured on v5e-1 (400 steps, batch 256):

    softmax                      0.980
    cosface    (m3=0.2)          0.990
    arcface    (m2=0.3)          0.995
    magface    (m 0.2..0.45)     0.995   (r3 adaptive family)
    adaface    (m=0.25)          0.995
    curricular (m2=0.3)          0.990
    arcface + K=3 subcenters     0.995

The canonical margin ordering reproduces end-to-end through this stack,
and every r3 adaptive/metric head trains to margin-family accuracy on
hardware. Run: python tools/margin_study.py [variant ...|all]
(from the repo root; ~5 min per variant)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np, dataclasses
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tf_face_toolbox_tpu.parallel.mesh import create_mesh
from tf_face_toolbox_tpu.train.trainer import TrainConfig, create_train_state, make_train_step
from tf_face_toolbox_tpu.models import create_network
from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
from tf_face_toolbox_tpu.ops.verification import verify_pairs

NUM_IDS, SIZE, B = 200, 112, 256
rng = np.random.default_rng(0)
freqs = rng.uniform(0.02, 0.2, (NUM_IDS, 6)); phases = rng.uniform(0, 6.28, (NUM_IDS, 6))
y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
templates = np.zeros((NUM_IDS, SIZE, SIZE, 3), np.float32)
for i in range(NUM_IDS):
    for c in range(3):
        templates[i,:,:,c] = (np.sin(freqs[i,2*c]*y*6.28 + phases[i,2*c]) +
                              np.cos(freqs[i,2*c+1]*x*6.28 + phases[i,2*c+1]))
templates = (templates - templates.mean()) / (templates.std() + 1e-6)
NOISE = 3.5   # harder than the demo so variants separate

def run_variant(tag, m2, m3, **cfg_kw):
    # every default is overridable — tools/zoo_accuracy.py reuses this
    # harness with network=<zoo entry> (+ lr/warmup tweaks)
    defaults = dict(network='resnet_v1_50', num_classes=NUM_IDS,
                    image_size=SIZE, global_batch=B, dtype=jnp.bfloat16,
                    augment=False, base_lr=0.05, warmup_steps=50,
                    weight_decay=5e-4, margin_scale=32.0,
                    lr_boundaries=(250, 350))
    cfg = TrainConfig(margin_m2=m2, margin_m3=m3,
                      **{**defaults, **cfg_kw})
    mesh = create_mesh()
    # stem='imagenet' keeps the r50 baseline comparable; nets with a
    # structural pin (iresnet/mobilefacenet/dct_vit) override it with
    # a warning inside create_network
    net = create_network(cfg.network, embedding_dim=cfg.embedding_dim,
                         dtype=cfg.dtype, stem='imagenet')
    state, net = create_train_state(cfg, jax.random.key(0), mesh, net=net)
    step_fn = make_train_step(net, cfg, mesh, state)
    extract = jax.jit(lambda v, im: flip_averaged_embeddings(
        lambda vv, xx: net.apply(vv, xx, train=False), v, im))
    drng = np.random.default_rng(1)
    pool = []
    for i in range(40):
        labels = drng.integers(0, NUM_IDS, B)
        imgs = (templates[labels] + NOISE*drng.normal(size=(B,SIZE,SIZE,3))).astype(np.float32)
        pool.append((jax.device_put(jnp.asarray(imgs)), jax.device_put(jnp.asarray(labels.astype(np.int32)))))
    for step in range(400):
        imgs, labels = pool[step % len(pool)]
        state, m = step_fn(state, imgs, labels)
    # eval
    r = np.random.default_rng(999)
    labels = np.repeat(r.choice(NUM_IDS, 20, replace=False), 6).astype(np.int32)
    imgs = (templates[labels] + NOISE*r.normal(size=(120, SIZE, SIZE, 3))).astype(np.float32)
    v = {"params": state.params, "batch_stats": state.batch_stats}
    emb = np.asarray(extract(v, jnp.asarray(imgs)))
    same, diff = [], []
    for i in range(120):
        for j in range(i+1, 120):
            (same if labels[i]==labels[j] else diff).append((i,j))
    same, diff = same[:100], diff[:100]
    i1 = np.array([p[0] for p in same+diff]); i2 = np.array([p[1] for p in same+diff])
    lab = np.array([1]*100+[0]*100)
    order = np.argsort(np.tile(np.arange(100), 2), kind='stable')
    acc = verify_pairs(emb[i1][order], emb[i2][order], lab[order])["accuracy_mean"]
    print("%s: final loss %.3f, held-out verification %.3f" % (tag, float(m['loss']), acc), flush=True)

VARIANTS = {
    'softmax':    lambda: run_variant('softmax  (m2=0,   m3=0)', 0.0, 0.0),
    'cosface':    lambda: run_variant('cosface  (m2=0,   m3=0.2)', 0.0, 0.2),
    'arcface':    lambda: run_variant('arcface  (m2=0.3, m3=0)', 0.3, 0.0),
    # r3 adaptive/metric family (paper-default hyperparameters scaled
    # to this synthetic task's 0.2-0.3 margin regime)
    'magface':    lambda: run_variant(
        'magface  (m 0.2..0.45)', 0.0, 0.0, margin_mode='magface',
        magface=__import__('tf_face_toolbox_tpu.ops.losses',
                           fromlist=['MagFaceConfig']).MagFaceConfig(
            l_m=0.2, u_m=0.45, lambda_g=5.0)),
    'adaface':    lambda: run_variant(
        'adaface  (m=0.25)', 0.0, 0.0, margin_mode='adaface',
        adaface=__import__('tf_face_toolbox_tpu.ops.losses',
                           fromlist=['AdaFaceConfig']).AdaFaceConfig(
            m=0.25)),
    'curricular': lambda: run_variant(
        'curricular (m2=0.3)', 0.3, 0.0, margin_mode='curricular'),
    'subcenter':  lambda: run_variant(
        'arcface+K=3 subcenters', 0.3, 0.0, subcenters=3),
    'center':     lambda: run_variant(
        'cosface + center(5e-4)', 0.0, 0.2, center_weight=5e-4),
    'triplet':    lambda: run_variant(
        'cosface + triplet(0.2)', 0.0, 0.2, triplet_weight=0.2),
}

if __name__ == '__main__':
    names = sys.argv[1:] or ['softmax', 'cosface', 'arcface']
    if names == ['all']:
        names = list(VARIANTS)
    for n in names:
        VARIANTS[n]()
