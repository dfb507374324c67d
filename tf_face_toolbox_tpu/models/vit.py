"""FaceViT — a JPEG-block-token Vision Transformer for face embeddings.

Beyond the reference's zoo (ref: SURVEY.md §2a lists ResNet / SE /
ResNeXt / DenseNet only): a ViT whose tokens ARE the JPEG 8×8 blocks,
following the JPEG-domain line the DCT ResNet already rides (PAPERS.md:
"RGB no more: Minimally-decoded JPEG Vision Transformers", Park &
Johnson 2022; Gueguen et al. 2018). A 112² crop is 14×14 = 196 blocks
of 192 DCT coefficients — which is exactly a patch-8 ViT token grid,
except the linear patch embedding composes with a fixed orthonormal
rotation (the DCT) that the JPEG codec has already paid for. The net
therefore accepts either standardized pixels (training/augment path —
the in-net ``block_dct`` is an exact linear re-layout) or prepared
coefficients from ``ops/dct.prepare_coefficients`` (the ZERO-decode
serving path: entropy decode on host, nothing else), one param tree for
both, same contract as ``ResNet(stem="dct")``.

TPU-first notes (this is the most MXU-shaped architecture in the zoo):

- Every FLOP is a dense matmul with contraction ≥192: token projection
  (192→W), QKV/out projections (W→3W / W→W) and the MLP (W→4W→W) all
  sit on full 128-lane MXU tiles; there is no small-channel 56²-stage
  problem to engineer around at all.
- Attention over 196 tokens is tiny (the T×T score matrix is 0.04% of
  the linear-layer FLOPs at W=384) — no flash/blocked attention needed;
  XLA fuses scale+softmax between the two einsums. Softmax runs in f32
  (bf16 exp over 196 logits loses real precision; the cast is free
  inside the fusion).
- LayerNorm statistics are computed in f32 and the result cast back to
  the compute dtype — the standard bf16-transformer recipe; the
  residual stream itself stays bf16 to halve HBM traffic.
- No data-dependent control flow; ``train`` only toggles the frequency
  BatchNorm and the head, so the eval graph is one static program.

Serving: fp via ``net.apply`` (flip-averaged extraction works in the
frequency domain through the shared stem="dct" dispatch in
``extract.py``). int8 is refused loudly — the static-int8 residual
carry covers the ConvBN block library only, and a W8A8 transformer is
its own accuracy project.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tf_face_toolbox_tpu.models.layers import EmbeddingHead, dense_kernel_init


def _layer_norm_f32(x: jax.Array, scale: jax.Array,
                    bias: jax.Array) -> jax.Array:
    """LayerNorm with f32 statistics, output in x's original dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * scale + bias).astype(dtype)


def resize_pos_embedding(variables: dict, new_hw: tuple[int, int],
                         old_hw: tuple[int, int] | None = None) -> dict:
    """Adapt a FaceViT param tree to a new token grid (input size).

    The learned positional embedding pins the grid a model was
    initialized at; serving or fine-tuning at another 8-multiple crop
    size needs it re-laid-out. Standard ViT recipe: reshape the (1, T,
    W) table to its 2-D grid, bilinearly resize to the new grid
    (jax.image half-pixel semantics, matching the rest of this stack's
    resize convention), flatten back. Every other parameter is
    resolution-independent. Returns a NEW variables dict (input
    untouched).

    ``old_hw`` defaults to the square grid implied by the stored token
    count; pass it explicitly for non-square models.
    """
    pos = variables["params"]["pos_embedding"]
    t, w = pos.shape[1], pos.shape[2]
    if old_hw is None:
        side = int(round(t ** 0.5))
        if side * side != t:
            raise ValueError(
                f"stored pos_embedding has {t} tokens, not a square "
                "grid; pass old_hw explicitly")
        old_hw = (side, side)
    if old_hw[0] * old_hw[1] != t:
        raise ValueError(f"old_hw {old_hw} != stored token count {t}")
    grid = jnp.asarray(pos, jnp.float32).reshape(1, *old_hw, w)
    resized = jax.image.resize(grid, (1, *new_hw, w), method="bilinear")
    new_pos = resized.reshape(1, new_hw[0] * new_hw[1], w)
    out = dict(variables)
    out["params"] = dict(variables["params"])
    out["params"]["pos_embedding"] = new_pos
    return out


class LayerNormF32(nn.Module):
    """f32-statistics LayerNorm with f32 params (bf16-safe)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,),
                          jnp.float32)
        return _layer_norm_f32(x, scale, bias)


class MultiHeadAttention(nn.Module):
    """Standard dot-product MHA as two einsums around an f32 softmax."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, t, w = x.shape
        assert w % self.num_heads == 0, (w, self.num_heads)
        dh = w // self.num_heads
        qkv = nn.Dense(3 * w, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=dense_kernel_init, name="qkv")(x)
        qkv = qkv.reshape(n, t, 3, self.num_heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(
            jnp.asarray(dh, jnp.float32)).astype(self.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs.astype(self.dtype), v)
        out = out.reshape(n, t, w)
        return nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=dense_kernel_init, name="out")(out)


class EncoderBlock(nn.Module):
    """Pre-LN transformer block: LN→MHA→add, LN→MLP(GELU)→add.

    ``drop_path``: stochastic depth (Huang et al. 2016, the standard
    ViT training regularizer) — in train mode each residual BRANCH is
    dropped per sample with this probability and the kept samples are
    rescaled by 1/keep, so eval needs no correction. Uses the trainer's
    existing 'dropout' PRNG stream; eval mode is deterministic and
    identical to drop_path=0.
    """

    num_heads: int
    mlp_ratio: int = 4
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def _drop_path(self, y: jax.Array, train: bool) -> jax.Array:
        if self.drop_path <= 0.0 or not train:
            return y
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                    (y.shape[0], 1, 1))
        return jnp.where(mask, y / jnp.asarray(keep, y.dtype),
                         jnp.zeros((), y.dtype))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        w = x.shape[-1]
        y = LayerNormF32(name="ln1")(x)
        y = MultiHeadAttention(self.num_heads, dtype=self.dtype,
                               name="attn")(y)
        x = x + self._drop_path(y, train)
        y = LayerNormF32(name="ln2")(x)
        y = nn.Dense(self.mlp_ratio * w, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=dense_kernel_init, name="mlp1")(y)
        y = nn.gelu(y)
        y = nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=dense_kernel_init, name="mlp2")(y)
        return x + self._drop_path(y, train)


class FaceViT(nn.Module):
    """JPEG-block-token ViT; factory contract like the rest of the zoo:
    ``apply(variables, images, train) → (N, embedding_dim) f32``
    (un-normalized — extraction L2-normalizes).

    Input H and W must be divisible by 8 (one token per JPEG block);
    the learned positional embedding pins the token grid at init time,
    so a model initialized at 112² serves 112² (same contract as
    MobileFaceNet's GDConv spatial weights).
    """

    depth: int = 12
    width: int = 384
    num_heads: int = 6
    mlp_ratio: int = 4
    embedding_dim: int = 512
    dropout_rate: float = 0.0
    # stochastic depth: per-block rate ramps linearly from 0 to this
    # value at the last block (the DeiT/ViT convention)
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Uniform-surface knobs: stem="dct" is structural (the token IS the
    # 8×8 DCT block — this is what makes the zero-decode serving path
    # apply); head pinned to the zoo's gap→FC→BN embedding head.
    stem: str = "dct"
    head_variant: str = "gap"
    quantized: bool | str = False

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        if self.stem != "dct":
            raise ValueError("FaceViT's tokens are structurally the 8×8 "
                             f"DCT blocks; got stem={self.stem!r}")
        if self.head_variant != "gap":
            raise ValueError("FaceViT's head is structurally gap→FC→BN; "
                             f"got head_variant={self.head_variant!r}")
        if self.quantized:
            raise ValueError(
                "int8 serving is not supported for the ViT family (the "
                "static-int8 residual carry covers the ConvBN block "
                "library only); serve fp — every layer is already a "
                "full-tile MXU matmul")
        from tf_face_toolbox_tpu.ops import dct as dct_ops

        x = images
        if x.shape[-1] == 3:
            x = dct_ops.block_dct(x.astype(self.dtype))
        elif x.shape[-1] != 192:
            raise ValueError(
                f"dct tokens want (N,H,W,3) pixels or (N,h,w,192) "
                f"coefficients, got trailing dim {x.shape[-1]}")
        x = x.astype(self.dtype)
        # Frequency norm (same role as the dct ResNet stem's BN):
        # coefficient magnitudes span orders of magnitude across the
        # band; BN equalizes them before the shared token projection.
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="freq_bn")(x)
        n, h, w, c = x.shape
        t = h * w
        x = x.reshape(n, t, c)
        x = nn.Dense(self.width, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=dense_kernel_init, name="token_proj")(x)
        pos = self.param("pos_embedding",
                         nn.initializers.normal(stddev=0.02),
                         (1, t, self.width), jnp.float32)
        x = x + pos.astype(self.dtype)
        for i in range(self.depth):
            rate = (self.drop_path_rate * i / max(self.depth - 1, 1))
            x = EncoderBlock(self.num_heads, mlp_ratio=self.mlp_ratio,
                             drop_path=rate, dtype=self.dtype,
                             name=f"Block_{i}")(x, train)
        x = LayerNormF32(name="ln_final")(x)
        # The zoo's shared gap→FC→BN head; tokens stand in for the
        # spatial map (mean over axes (1,2) == mean over tokens).
        return EmbeddingHead(
            embedding_dim=self.embedding_dim,
            variant="gap",
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )(x.reshape(n, 1, t, self.width), train)
