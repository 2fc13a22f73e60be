"""Precision policy for TPU training.

The reference trains fp32 (no AMP configured; `precision: 16` commented out in
reference configs/trainer/default.yaml). On TPU the idiomatic policy is:
bf16 compute (MXU-native), fp32 parameters and optimizer state, fp32 loss /
logit math where softmax stability matters.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT = Policy()
FP32 = Policy(compute_dtype=jnp.float32)


def get_policy(name: str) -> Policy:
    name = (name or "bf16").lower()
    if name in ("bf16", "bfloat16", "mixed"):
        return DEFAULT
    if name in ("fp32", "float32", "32", "full"):
        return FP32
    raise ValueError(f"Unknown precision policy: {name}")
