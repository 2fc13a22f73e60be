"""Attention dispatch: Pallas flash attention on TPU, jnp reference elsewhere.

This is the single dominant op of the whole framework (ESM2/BERT forwards are
the device hot loop, SURVEY §3.5), so it gets a fused, IO-aware kernel
(FlashAttention-2 style tiling, see oneprot_tpu/kernels/flash_attention.py).

The jnp reference path is also the correctness oracle for kernel tests.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _tpu_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def reference_attention(
    q: jax.Array,  # [B, H, Lq, D]
    k: jax.Array,  # [B, H, Lk, D]
    v: jax.Array,  # [B, H, Lk, D]
    bias: Optional[jax.Array] = None,  # broadcastable to [B, H, Lq, Lk]
) -> jax.Array:
    """Plain XLA attention; fp32 softmax for stability."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Multi-head attention with optional additive bias (padding mask).

    q/k/v: [B, H, L, D]. bias: [B, 1, 1, Lk] or [B, H, Lq, Lk], additive
    (0 for keep, large negative for masked).
    """
    if use_pallas is None:
        env = os.environ.get("ONEPROT_USE_PALLAS", "auto")
        if env == "0":
            use_pallas = False
        elif env == "1":
            use_pallas = True
        else:
            use_pallas = _tpu_available()
    if use_pallas:
        from oneprot_tpu.kernels.flash_attention import flash_attention, supports

        if supports(q, k, v, bias):
            return flash_attention(q, k, v, bias)
    return reference_attention(q, k, v, bias)
