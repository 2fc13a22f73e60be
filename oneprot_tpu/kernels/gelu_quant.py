"""Fused exact-GELU -> per-token int8 quantization (int8 hub MLP epilogue).

Between the frozen hub's int8 fc1 and fc2 GEMMs the production path pays
three full HBM passes over the [tokens, 4H] intermediate: write gelu(y),
read it for the per-token abs-max, read it again to quantize (the abs-max
must complete before the int8 write can start, so XLA cannot fuse the
three into one). This kernel does gelu + row abs-max + quantize in ONE
read -> one int8 (+scales) write: each grid step holds a [bm, 4H] block
in VMEM where the cross-column reduce is free.

Measured on v5e at the ESM2-650M MLP shapes (T=16384, H=1280, I=5120,
bf16 intermediates): 2.744 -> 2.287 ms per fc1+gelu+quant+fc2 block
(scripts/microbench_mlp_epilogue.py), i.e. ~15 ms/step off the 33-layer
hub forward. Output drift vs the unfused path is ~1e-2 max-rel — the
same order as the int8 quantization step itself (the fused path computes
gelu in f32 from the bf16 input; the unfused path computes it in bf16).

GELU is exact (erf), not tanh-approximate: Mosaic lowers neither erf nor
erfc, so the kernel evaluates Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7,
four orders below the int8 step of ~8e-3).

Forward-only by design: this feeds Int8Dense, which is only valid under
the frozen hub's stop_gradient (round() has zero gradient). Replaces the
recompute the reference pays every step for its frozen tower
(/root/reference/src/models/oneprot_module.py:95).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_poly(x: jax.Array) -> jax.Array:
    """Abramowitz-Stegun 7.1.26 erf, |err| < 1.5e-7 (f32 in, f32 out)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_quant_reference(y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """jnp oracle: f32 exact gelu + per-row symmetric abs-max int8 quant.

    Returns (q int8 [..., N], scales f32 [..., 1]).
    """
    g = jax.nn.gelu(y.astype(jnp.float32), approximate=False)
    s = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True),
                    1e-12) / 127.0
    return jnp.round(g / s).astype(jnp.int8), s


def _kernel(y_ref, q_ref, s_ref):
    yf = y_ref[:].astype(jnp.float32)
    g = 0.5 * yf * (1.0 + _erf_poly(yf * (2.0 ** -0.5)))
    s = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True),
                    1e-12) / 127.0
    q_ref[:] = jnp.round(g / s).astype(jnp.int8)
    s_ref[:] = s


def gelu_quant_pallas(y: jax.Array, *, bm: int,
                      interpret: bool = False):
    """[M, N] -> (int8 [M, N], f32 scales [M, 1]); grid over row blocks."""
    M, N = y.shape
    return pl.pallas_call(
        _kernel,
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((bm, N), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((bm, N), lambda i: (i, 0)),
                   pl.BlockSpec((bm, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((M, N), jnp.int8),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * M * N,
            bytes_accessed=M * N * (y.dtype.itemsize + 1) + M * 4,
            transcendentals=M * N),
        interpret=interpret,
    )(y)


def _pick_bm(m: int, n: int, itemsize: int) -> Optional[int]:
    """Largest row-block (multiple of 8, dividing m) whose f32 compute +
    input + int8 output fit comfortably in VMEM (~16 MB/core)."""
    budget = 10 * 1024 * 1024
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if m % bm:
            continue
        if bm * n * (4 + itemsize + 1) <= budget:
            return bm
    return None


def fused_gelu_quant(y: jax.Array):
    """Dispatcher: fused gelu+quant on TPU-capable shapes, else None (the
    caller falls back to the unfused gelu + Int8Dense internal quant).

    Accepts [..., N]; leading dims are flattened into rows. Under an active
    multi-device mesh the kernel runs per-shard inside shard_map (pallas is
    opaque to GSPMD), with the leading axis batch-sharded — same policy as
    fused_mha.
    """
    env = os.environ.get("ONEPROT_USE_PALLAS", "auto")
    if env == "0":
        return None
    from oneprot_tpu.kernels.attention import (
        _tpu_available,
        sharded_kernel_dispatch,
    )

    use_pallas = True if env == "1" else _tpu_available()
    if not use_pallas:
        return None

    N = y.shape[-1]
    if N % 128 or y.ndim < 2:
        return None
    interpret = not _tpu_available()

    def fn(y_):
        m = 1
        for d in y_.shape[:-1]:
            m *= d
        bm = _pick_bm(m, N, y_.dtype.itemsize)
        if bm is None:  # static per-shard shape: consistent across shards
            g = jax.nn.gelu(y_.astype(jnp.float32), approximate=False)
            s = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True),
                            1e-12) / 127.0
            return jnp.round(g / s).astype(jnp.int8), s
        q, s = gelu_quant_pallas(y_.reshape(m, N), bm=bm,
                                 interpret=interpret)
        return q.reshape(*y_.shape[:-1], N), s.reshape(*y_.shape[:-1], 1)

    return sharded_kernel_dispatch(fn, (y,), (y.ndim,), (y.ndim, y.ndim))
