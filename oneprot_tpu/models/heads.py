"""Post-backbone heads: pooling → projection → L2-norm (+ logit scale).

Re-implements the semantics of the reference BaseEncoder head stack
(reference src/models/components/base_encoder.py:129-194) as flax modules:
  - MeanPooling (mask-aware), CLSTokenPooling, Attention1dPooling
    (base_encoder.py:88-126)
  - projections: identity / LayerNorm+Linear(no bias) / LayerNorm-MLP-GELU
    with hidden=(d_model+output_dim)//2 (base_encoder.py:147-169)
  - L2 normalize + LearnableLogitScaling init 1/0.07, exp clipped at 100
    (base_encoder.py:6-38)
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch.nn.functional.normalize(p=2) semantics (norm clamped at eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def mean_pool(features: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Mask-aware mean over the length axis (base_encoder.py:105-118)."""
    if features.ndim == 2:
        return features
    if mask is None:
        return jnp.mean(features, axis=1)
    m = mask.astype(features.dtype)[..., None]
    return jnp.sum(features * m, axis=1) / jnp.sum(m, axis=1)


def cls_pool(features: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    return features[:, 0]


class Attention1dPooling(nn.Module):
    """Masked conv-attention pooling (base_encoder.py:88-103).

    The reference's MaskedConv1d with kernel_size=1 is exactly a per-position
    dense layer to 1 logit; masked positions get -inf before softmax.
    """

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
        if mask is not None:
            x_in = x * mask.astype(x.dtype)[..., None]
        else:
            x_in = x
        attn = nn.Dense(1, name="attn")(x_in)[..., 0]  # [B, L]
        if mask is not None:
            attn = jnp.where(mask.astype(bool), attn, -jnp.inf)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        return jnp.sum(attn[..., None] * x, axis=1)


class Projection(nn.Module):
    """proj_type: None/'identity' | 'linear' | 'mlp' (base_encoder.py:147-169)."""

    d_model: int
    output_dim: int
    proj_type: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.proj_type == "linear":
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)
            x = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                         name="dense")(x)
            return x
        if self.proj_type == "mlp":
            hidden = (self.d_model + self.output_dim) // 2
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
            x = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="dense1")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
            x = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                         name="dense2")(x)
            return x
        # identity (also when d_model == output_dim and proj_type is None)
        return x


class LogitScale(nn.Module):
    """exp-parameterized temperature, init log(1/0.07), clipped at 100
    (base_encoder.py:15-38). Kept in the param tree even when not learnable
    so the reference's explicit test-step access pattern has an equivalent
    (oneprot_module.py:142)."""

    logit_scale_init: float = 1.0 / 0.07
    learnable: bool = True
    max_logit_scale: float = 100.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = lambda key, shape: jnp.full(shape, math.log(self.logit_scale_init))
        if self.learnable:
            log_scale = self.param("log_logit_scale", init, ())
        else:
            log_scale = jnp.asarray(math.log(self.logit_scale_init))
        scale = jnp.minimum(jnp.exp(log_scale), self.max_logit_scale)
        return scale.astype(x.dtype) * x


class EncoderHead(nn.Module):
    """pooling → projection → l2-norm (+ optional logit scale).

    `pool` and `project` are exposed as separate methods so frozen
    backbones can cache the pooled representation (pooling is parameter-
    free for mean/cls; `pooling_is_cacheable` reports that) and re-run only
    the trainable projection during training.
    """

    d_model: int
    output_dim: int
    proj_type: Optional[str] = None
    pooling_type: str = "mean"
    use_logit_scale: bool = False
    learnable_logit_scale: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.pooling_type == "attention1d":
            self.attention1d = Attention1dPooling()
        self.proj = Projection(
            d_model=self.d_model,
            output_dim=self.output_dim,
            proj_type=self.proj_type,
            dtype=self.dtype,
        )
        if self.use_logit_scale:
            self.logit_scale = LogitScale(
                learnable=self.learnable_logit_scale)

    @property
    def pooling_is_cacheable(self) -> bool:
        return self.pooling_type in ("mean", "cls")

    def pool(self, features: jax.Array,
             mask: Optional[jax.Array] = None) -> jax.Array:
        if self.pooling_type == "mean":
            return mean_pool(features, mask)
        if self.pooling_type == "cls":
            return cls_pool(features, mask)
        if self.pooling_type == "attention1d":
            return self.attention1d(features, mask)
        return features  # identity / None

    def project(self, pooled: jax.Array) -> jax.Array:
        out = l2_normalize(self.proj(pooled).astype(jnp.float32), axis=-1)
        if self.use_logit_scale:
            out = self.logit_scale(out)
        return out

    def __call__(
        self, features: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        return self.project(self.pool(features, mask))


def empty_slot_filler(d: int) -> jax.Array:
    """Deterministic non-constant filler for EMPTY pack slots — the single
    definition. The cached packed path (train/feature_cache.py) must
    reproduce it bit-exactly for the cached==uncached step equality, so
    never duplicate this expression."""
    return jnp.arange(d, dtype=jnp.float32) / d - 0.5


def segment_mean_pool(features: jax.Array, token_mask: jax.Array,
                      segment_ids: jax.Array, num_segments: int):
    """Per-segment mask-aware mean for PACKED rows (sequence packing).

    features [B, L, H]; token_mask [B, L] (1 = real token); segment_ids
    [B, L] int (pads may be -1). Returns (pooled [B, P, H],
    counts [B, P]) where P = num_segments; empty slots pool to zeros.
    The one-hot contraction runs as a single [P, L] x [L, H] matmul per
    row — MXU-friendly, no scatters.
    """
    seg = segment_ids[:, :, None]
    slots = jnp.arange(num_segments)[None, None, :]
    hot = (seg == slots) & (token_mask[:, :, None] > 0)  # [B, L, P]
    # counts MUST accumulate in f32: under bf16 training a bf16 sum rounds
    # integers above 256 (8-bit mantissa), skewing the mean divisor for
    # long segments by up to ~0.4% (advisor round-2 finding). The 0/1
    # one-hot itself is exact in bf16, so the MXU contraction keeps the
    # compute dtype.
    onehot = hot.astype(features.dtype)
    counts = hot.astype(jnp.float32).sum(axis=1)         # [B, P]
    pooled = jnp.einsum("blp,blh->bph", onehot, features,
                        preferred_element_type=jnp.float32)
    pooled = pooled / jnp.maximum(counts[..., None], 1.0)
    # empty slots pool to EXACTLY zero, and the L2-normalize after the
    # projection has a NaN gradient at the zero vector (0/0 in the norm
    # vjp) which poisons the whole backward even under a zero cotangent.
    # Fill empty slots with a NON-CONSTANT vector (a constant one recreates
    # the zero after the head's LayerNorm centers it); their features are
    # masked out of the loss, so any finite value is fine.
    H = features.shape[-1]
    filler = empty_slot_filler(H)[None, None, :]
    empty = (counts <= 0).astype(jnp.float32)[..., None]
    pooled = pooled + empty * filler
    return pooled.astype(features.dtype), counts


def segment_cls_pool(features: jax.Array, token_mask: jax.Array,
                     segment_ids: jax.Array, num_segments: int):
    """Per-segment CLS (first-token) pooling for PACKED rows.

    The packed equivalent of pooling_type='cls' (the reference's text
    tower pools the [CLS] token, text_encoder.py): slot s of each row
    selects the FIRST token of segment s. Segments are laid out
    consecutively by the packer, so 'first token' = the position where
    segment_ids changes. Same contract as segment_mean_pool: returns
    (pooled [B, P, H], counts [B, P]) with the deterministic filler on
    empty slots."""
    seg = segment_ids[:, :, None]
    slots = jnp.arange(num_segments)[None, None, :]
    prev = jnp.concatenate(
        [jnp.full_like(segment_ids[:, :1], -2), segment_ids[:, :-1]], axis=1)
    is_start = ((segment_ids != prev) & (segment_ids >= 0)
                & (token_mask > 0))
    hot = (seg == slots) & is_start[:, :, None]          # [B, L, P]
    onehot = hot.astype(features.dtype)
    # counts still reflect segment token totals (empty-slot detection +
    # parity with the mean-pool contract)
    counts = ((seg == slots) & (token_mask[:, :, None] > 0)).astype(
        jnp.float32).sum(axis=1)                          # [B, P]
    pooled = jnp.einsum("blp,blh->bph", onehot, features,
                        preferred_element_type=jnp.float32)
    H = features.shape[-1]
    filler = empty_slot_filler(H)[None, None, :]
    empty = (counts <= 0).astype(jnp.float32)[..., None]
    pooled = pooled + empty * filler
    return pooled.astype(features.dtype), counts


def segment_pool(features: jax.Array, token_mask: jax.Array,
                 segment_ids: jax.Array, num_segments: int,
                 pooling_type: str = "mean"):
    """Dispatch per-segment pooling by the head's pooling_type.

    Only pooling types with a per-segment implementation are accepted: a
    silent fallback would let a packed train step pool differently than
    the unpacked eval path (e.g. attention1d eval vs mean train) with no
    error — train/eval feature divergence is strictly worse than failing
    fast. Disable packing or switch pooling to use the other types."""
    if pooling_type == "cls":
        return segment_cls_pool(features, token_mask, segment_ids,
                                num_segments)
    if pooling_type != "mean":
        raise NotImplementedError(
            f"segment (packed) pooling has no '{pooling_type}' variant; "
            "use pooling_type 'mean'/'cls' with sequence packing, or "
            "disable packing for this tower")
    return segment_mean_pool(features, token_mask, segment_ids,
                             num_segments)
