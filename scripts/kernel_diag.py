"""Diagnose the flash kernel's time composition: MXU-only vs VPU-only vs full.

Same grid/block structure as the production kernel (bq=512, bk=1024,
B16 H20 L1024 D64), but the body is stripped to isolate units:
  mxu:  s = q@k^T; o = s.astype(bf16)[:, :64] @ v      (no softmax)
  vpu:  softmax ops on a preloaded s-sized block        (no matmuls)
  full: the real body
Also sweeps heads-per-program to amortize per-program overhead.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LOG2E = 1.4426950408889634
_NEG_INF = -1e30

B, H, L, D = 16, 20, 1024, 64
BQ = 512


def _mxu_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = s.astype(q.dtype)
    o_ref[0] = jax.lax.dot_general(p, v_ref[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _vpu_kernel(q_ref, k_ref, v_ref, o_ref):
    # softmax-shaped VPU work on a fake s (broadcast of q cols to [bq, L])
    q = q_ref[0]
    s = jnp.broadcast_to(q[:, 0:1], (BQ, L)) * 1.0001  # fp32? q is bf16
    s = s.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pb = (p / l).astype(q.dtype)
    o_ref[0] = jnp.broadcast_to(jnp.sum(pb, axis=-1, keepdims=True),
                                (BQ, D)).astype(o_ref.dtype)


def _full_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0] * jnp.asarray((1 / 8) * _LOG2E, q_ref.dtype)
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(p.astype(q.dtype), v_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def run(kernel, tag, iters=50):
    q_map = lambda p, i: (p, i, 0)
    kv_map = lambda p, i: (p, 0, 0)
    call = pl.pallas_call(
        kernel,
        grid=(B * H, L // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B * H, L, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B * H, L, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B * H, L, D), jnp.bfloat16)

    @jax.jit
    def loop(q):
        def body(qq, _):
            return call(qq, k, v).astype(qq.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    o = loop(q)
    float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    o = loop(q)
    float(jnp.sum(o.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    flops = 4 * B * H * L * L * D
    print(f"{tag}: {dt*1e3:7.3f} ms  ({flops/dt/1e12:5.1f} TF/s-equiv)")


if __name__ == "__main__":
    run(_mxu_kernel, "mxu-only ")
    run(_vpu_kernel, "vpu-only ")
    run(_full_kernel, "full     ")


# -- MXU orientation variants -------------------------------------------------

def _mxu_kt_kernel(q_ref, kt_ref, v_ref, o_ref):
    # kt is pre-transposed [D, L]: natural [M,K]@[K,N] orientation
    q = q_ref[0]
    s = jax.lax.dot_general(q, kt_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = s.astype(q.dtype)
    o_ref[0] = jax.lax.dot_general(p, v_ref[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def run_kt(tag, iters=50):
    q_map = lambda p, i: (p, i, 0)
    kv_map = lambda p, i: (p, 0, 0)
    call = pl.pallas_call(
        _mxu_kt_kernel,
        grid=(B * H, L // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, L), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B * H, L, D), jnp.bfloat16)
    kt = jnp.asarray(rng.randn(B * H, D, L), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B * H, L, D), jnp.bfloat16)

    @jax.jit
    def loop(q):
        def body(qq, _):
            return call(qq, kt, v).astype(qq.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    o = loop(q); float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    o = loop(q); float(jnp.sum(o.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    flops = 4 * B * H * L * L * D
    print(f"{tag}: {dt*1e3:7.3f} ms  ({flops/dt/1e12:5.1f} TF/s-equiv)")


def _sonly_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = jnp.broadcast_to(
        jnp.sum(s, axis=-1, keepdims=True), (BQ, D)).astype(o_ref.dtype)


def _pvonly_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]
    p = jnp.broadcast_to(q[:, 0:1], (BQ, L)).astype(q.dtype)
    o_ref[0] = jax.lax.dot_general(p, v_ref[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


print("-- orientation/unit variants --")
run(_sonly_kernel, "s-only   ")
run(_pvonly_kernel, "pv-only  ")
run_kt("mxu-kt   ")
