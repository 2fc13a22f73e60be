"""Experimental flash-attention variants: VPU-op reduction + pipelining.

Variants vs oneprot_tpu/kernels/flash_attention.py (v1):
  A: static k loop, scale*log2e folded into q prescale, bias prescaled
  B: k-blocks on the grid, scratch accumulators, skip padded k blocks via
     clamped index_map + pl.when (Mosaic pipelines grid steps)
  C: manually software-pipelined unrolled k loop (issue block i+1's QK^T
     before block i's softmax so MXU and VPU overlap)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634
_NEG_INF = -1e30
_LSE_LANES = 8


def _prep(q, bias, B, Lk, scale):
    if bias is None:
        bias_b = jnp.zeros((B, 1, Lk), jnp.float32)
    else:
        bias_b = bias.reshape(B, 1, Lk).astype(jnp.float32) * _LOG2E
    return bias_b


# ---------------------------------------------------------------------------
# Variant A: static loop + fold
# ---------------------------------------------------------------------------


def _fwd_kernel_a(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                  *, block_k, lk, scale):
    in_dtype = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale * _LOG2E, in_dtype)
    block_q, d = q.shape
    num_k = lk // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[0, :, pl.ds(i * block_k, block_k)]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        corr = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(in_dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l_fin, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(m_fin + jnp.log2(l_safe),
                                  (block_q, _LSE_LANES)).astype(jnp.float32)


def fwd_a(q, k, v, bias, block_q=512, block_k=1024):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (D ** 0.5)
    bias_b = _prep(q, bias, B, Lk, scale)
    qr = q.reshape(B * H, Lq, D)
    kr = k.reshape(B * H, Lk, D)
    vr = v.reshape(B * H, Lk, D)
    q_map = lambda p, i: (p, i, 0)
    kv_map = lambda p, i: (p, 0, 0)
    bias_map = lambda p, i: (p // H, 0, 0)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_a, block_k=block_k, lk=Lk, scale=scale),
        grid=(B * H, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), bias_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LSE_LANES), q_map,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lq, _LSE_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qr, kr, vr, bias_b)
    return out.reshape(B, H, Lq, D), lse.reshape(B, H, Lq, _LSE_LANES)


# ---------------------------------------------------------------------------
# Variant B: k on the grid + scratch accumulators + skip
# ---------------------------------------------------------------------------


def _fwd_kernel_b(lens_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                  acc_ref, m_ref, l_ref, *, block_k, lk, scale, heads):
    in_dtype = q_ref.dtype
    j = pl.program_id(2)
    num_j = pl.num_programs(2)
    b = pl.program_id(0) // heads
    seq_len = lens_ref[b]
    n_k = jnp.maximum((seq_len + block_k - 1) // block_k, 1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(j < n_k)
    def _():
        q = q_ref[0] * jnp.asarray(scale * _LOG2E, in_dtype)
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[0]
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        corr = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
            p.astype(in_dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == num_j - 1)
    def _():
        l_safe = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            m_ref[:, 0:1] + jnp.log2(l_safe),
            lse_ref.shape[1:]).astype(jnp.float32)


def fwd_b(q, k, v, bias, lens=None, block_q=512, block_k=256):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (D ** 0.5)
    bias_b = _prep(q, bias, B, Lk, scale)
    if lens is None:
        lens = jnp.full((B,), Lk, jnp.int32)
    qr = q.reshape(B * H, Lq, D)
    kr = k.reshape(B * H, Lk, D)
    vr = v.reshape(B * H, Lk, D)
    num_k = Lk // block_k

    def clamp(j, lref, p):
        n_k = jnp.maximum((lref[p // H] + block_k - 1) // block_k, 1)
        return jnp.minimum(j, n_k - 1)

    q_map = lambda p, i, j, lref: (p, i, 0)
    kv_map = lambda p, i, j, lref: (p, clamp(j, lref, p), 0)
    bias_map = lambda p, i, j, lref: (p // H, 0, clamp(j, lref, p))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, Lq // block_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), bias_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda p, i, j, lref: (p, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LSE_LANES),
                         lambda p, i, j, lref: (p, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, _LSE_LANES), jnp.float32),
            pltpu.VMEM((block_q, _LSE_LANES), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_b, block_k=block_k, lk=Lk, scale=scale,
                          heads=H),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lq, _LSE_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
    )(lens.astype(jnp.int32), qr, kr, vr, bias_b)
    return out.reshape(B, H, Lq, D), lse.reshape(B, H, Lq, _LSE_LANES)


# ---------------------------------------------------------------------------
# Variant C: manual software pipeline, unrolled static k loop
# ---------------------------------------------------------------------------


def _fwd_kernel_c(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                  *, block_k, lk, scale):
    in_dtype = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale * _LOG2E, in_dtype)
    block_q, d = q.shape
    num_k = lk // block_k

    def qk(idx):
        k_blk = k_ref[0, idx * block_k:(idx + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return s + bias_ref[0, :, idx * block_k:(idx + 1) * block_k]

    acc = jnp.zeros((block_q, d), jnp.float32)
    m = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)

    s_next = qk(0)
    for idx in range(num_k):
        s = s_next
        if idx + 1 < num_k:
            s_next = qk(idx + 1)  # MXU for block idx+1 overlaps VPU below
        v_blk = v_ref[0, idx * block_k:(idx + 1) * block_k, :]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        corr = jnp.exp2(m - m_new)
        p = jnp.exp2(s - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(in_dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = m_new

    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log2(l_safe),
                                  (block_q, _LSE_LANES)).astype(jnp.float32)


def fwd_c(q, k, v, bias, block_q=512, block_k=256):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (D ** 0.5)
    bias_b = _prep(q, bias, B, Lk, scale)
    qr = q.reshape(B * H, Lq, D)
    kr = k.reshape(B * H, Lk, D)
    vr = v.reshape(B * H, Lk, D)
    q_map = lambda p, i: (p, i, 0)
    kv_map = lambda p, i: (p, 0, 0)
    bias_map = lambda p, i: (p // H, 0, 0)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_c, block_k=block_k, lk=Lk, scale=scale),
        grid=(B * H, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), bias_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LSE_LANES), q_map,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lq, _LSE_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qr, kr, vr, bias_b)
    return out.reshape(B, H, Lq, D), lse.reshape(B, H, Lq, _LSE_LANES)


if __name__ == "__main__":
    import os
    import sys
    import time

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from oneprot_tpu.kernels.flash_attention import _fwd as fwd_v1

    B, H, L, D = 16, 20, 1024, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    mean_frac = float(os.environ.get("LENFRAC", "1.0"))
    lens_np = np.full((B,), int(L * mean_frac), np.int32)
    mask = (np.arange(L)[None] < lens_np[:, None])
    bias = jnp.asarray(np.where(mask, 0.0, -1e9)[:, None, None, :],
                       jnp.float32)
    lens = jnp.asarray(lens_np)

    flops = 4 * B * H * L * L * D

    def bench(fn, tag, iters=50):
        @jax.jit
        def loop(q):
            def body(qq, _):
                o = fn(qq)[0]
                return o.astype(qq.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=iters)
            return out

        o = loop(q)
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        o = loop(q)
        float(jnp.sum(o.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s")
        return o

    bench(lambda qq: fwd_v1(qq, k, v, bias), "v1 (bq512 bk1024)   ")
    bench(lambda qq: fwd_a(qq, k, v, bias, 512, 1024), "vA (bq512 bk1024)   ")
    for bq, bk in [(512, 256), (512, 512), (256, 256)]:
        bench(lambda qq, bq=bq, bk=bk: fwd_b(
            qq, k, v, bias, lens, block_q=bq, block_k=bk),
            f"vB (bq{bq} bk{bk})    ")
    for bq, bk in [(512, 256), (512, 512), (256, 256), (512, 128)]:
        bench(lambda qq, bq=bq, bk=bk: fwd_c(
            qq, k, v, bias, block_q=bq, block_k=bk),
            f"vC (bq{bq} bk{bk})    ")

    a = np.asarray(fwd_v1(q, k, v, bias)[0], np.float32)
    for name, f in [("A", lambda: fwd_a(q, k, v, bias)),
                    ("B", lambda: fwd_b(q, k, v, bias, lens)),
                    ("C", lambda: fwd_c(q, k, v, bias))]:
        d = np.asarray(f()[0], np.float32)
        print(f"max abs diff v1 vs {name}:", np.abs(a - d).max())
