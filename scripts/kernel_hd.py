"""Prototype: flash attention consuming [B, L, H*D] directly + fused rotary.

Pallas needs the last block dim divisible by 128, so each program handles a
HEAD PAIR (2*D=128 lanes) and splits the two heads in VMEM. Grid is
(B, H//2, Lq/bq). This kills all reshape/transpose copies around the kernel
(7 per layer in the current HLO) and fuses rotary in.

Compares the full attention subgraph (projection output -> context, incl.
rotary) between:
  path1 (current): reshape/transpose -> XLA rotary -> pallas [B,H,L,D] ->
                   transpose back
  path2 (new):     one pallas call on [B,L,H*D] with rotary in-kernel
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
_LSE_LANES = 8

B, H, L, D = 16, 20, 1024, 64
HD = H * D


def _rot_half_pair(x, d):
    # rotate_half applied independently to each d-wide half of a [*, 2d] block
    a1, a2, b1, b2 = (x[:, :d // 2], x[:, d // 2:d],
                      x[:, d:d + d // 2], x[:, d + d // 2:])
    return jnp.concatenate([-a2, a1, -b2, b1], axis=-1)


def _fwd_kernel_pair(q_ref, k_ref, v_ref, bias_ref, cos_ref, sin_ref,
                     o_ref, lse_ref, *, block_k, lk, scale, d):
    in_dtype = q_ref.dtype
    q2 = q_ref[0]                                    # [bq, 2d] head pair
    block_q = q2.shape[0]
    i_q = pl.program_id(2)
    q_sl = pl.ds(i_q * block_q, block_q)
    cos_q = cos_ref[q_sl, :]                         # [bq, 2d] (cos tiled x2)
    sin_q = sin_ref[q_sl, :]
    q2 = q2 * cos_q + _rot_half_pair(q2, d) * sin_q
    q2 = q2 * jnp.asarray(scale * _LOG2E, in_dtype)
    qa, qb = q2[:, :d], q2[:, d:]
    num_k = lk // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry                  # [bq,2d],[bq,16],[bq,16]
        sl = pl.ds(i * block_k, block_k)
        k2 = k_ref[0, sl, :]
        # k rotary: cos/sin rows for this k block come from the same tables
        # (they are [Lk, 2d]; Lq == Lk here)
        ck = cos_ref[sl, :] if cos_ref.shape[0] == lk else None
        k2 = k2 * ck + _rot_half_pair(k2, d) * (
            sin_ref[sl, :])
        v2 = v_ref[0, sl, :]
        bias_blk = bias_ref[0, :, sl]

        sa = jax.lax.dot_general(qa, k2[:, :d], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sb = jax.lax.dot_general(qb, k2[:, d:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sa = sa + bias_blk
        sb = sb + bias_blk
        ma = jnp.max(sa, axis=-1, keepdims=True)
        mb = jnp.max(sb, axis=-1, keepdims=True)
        m_pa, m_pb = m_prev[:, 0:1], m_prev[:, 8:9]
        m_na = jnp.maximum(m_pa, ma)
        m_nb = jnp.maximum(m_pb, mb)
        corr_a = jnp.exp2(m_pa - m_na)
        corr_b = jnp.exp2(m_pb - m_nb)
        pa = jnp.exp2(sa - m_na)
        pb = jnp.exp2(sb - m_nb)
        l_na = l_prev[:, 0:1] * corr_a + jnp.sum(pa, axis=-1, keepdims=True)
        l_nb = l_prev[:, 8:9] * corr_b + jnp.sum(pb, axis=-1, keepdims=True)
        oa = jax.lax.dot_general(pa.astype(in_dtype), v2[:, :d],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ob = jax.lax.dot_general(pb.astype(in_dtype), v2[:, d:],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        corr2 = jnp.concatenate(
            [jnp.broadcast_to(corr_a, (block_q, d)),
             jnp.broadcast_to(corr_b, (block_q, d))], axis=-1)
        acc = acc * corr2 + jnp.concatenate([oa, ob], axis=-1)
        m_new = jnp.concatenate(
            [jnp.broadcast_to(m_na, (block_q, 8)),
             jnp.broadcast_to(m_nb, (block_q, 8))], axis=-1)
        l_new = jnp.concatenate(
            [jnp.broadcast_to(l_na, (block_q, 8)),
             jnp.broadcast_to(l_nb, (block_q, 8))], axis=-1)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, 2 * d), jnp.float32)
    m0 = jnp.full((block_q, 16), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 16), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l_fin, 1e-30)
    l2 = jnp.concatenate(
        [jnp.broadcast_to(l_safe[:, 0:1], (block_q, d)),
         jnp.broadcast_to(l_safe[:, 8:9], (block_q, d))], axis=-1)
    o_ref[0] = (acc / l2).astype(o_ref.dtype)
    lse_ref[0] = (m_fin + jnp.log2(l_safe)).astype(jnp.float32)


def fwd_pair(q, k, v, bias, cos2, sin2, block_q=512, block_k=1024):
    """q/k/v: [B, L, H*D]; cos2/sin2: [L, 2D]. Returns ctx [B, L, H*D]."""
    Bq, Lq, hd = q.shape
    Lk = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    if bias is None:
        bias_b = jnp.zeros((Bq, 1, Lk), jnp.float32)
    else:
        bias_b = bias.reshape(Bq, 1, Lk).astype(jnp.float32) * _LOG2E
    H2 = H // 2

    q_map = lambda b, h, i: (b, i, h)
    kv_map = lambda b, h, i: (b, 0, h)
    bias_map = lambda b, h, i: (b, 0, 0)
    cs_map = lambda b, h, i: (0, 0)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_pair, block_k=block_k, lk=Lk,
                          scale=scale, d=D),
        grid=(Bq, H2, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, 2 * D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, 2 * D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), bias_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 2 * D), cs_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 2 * D), cs_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, 2 * D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 16), lambda b, h, i: (b * H2 + h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bq, Lq, hd), q.dtype),
            jax.ShapeDtypeStruct((Bq * H2, Lq, 16), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v, bias_b, cos2.astype(q.dtype), sin2.astype(q.dtype))
    return out, lse


if __name__ == "__main__":
    from oneprot_tpu.kernels.flash_attention import flash_attention
    from oneprot_tpu.models.esm2 import apply_rotary, rotary_cos_sin

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, HD), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, L, HD), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, L, HD), jnp.bfloat16)
    lens_np = np.full((B,), L, np.int32)
    mask = (np.arange(L)[None] < lens_np[:, None])
    bias = jnp.asarray(np.where(mask, 0.0, -1e9)[:, None, None, :],
                       jnp.float32)
    cos, sin = rotary_cos_sin(L, D, jnp.float32)
    cos2 = jnp.concatenate([cos, cos], axis=-1)
    sin2 = jnp.concatenate([sin, sin], axis=-1)

    def path1(q, k, v):
        qh = q.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        qh = apply_rotary(qh, cos.astype(qh.dtype), sin.astype(qh.dtype))
        kh = apply_rotary(kh, cos.astype(kh.dtype), sin.astype(kh.dtype))
        ctx = flash_attention(qh, kh, vh, bias)
        return ctx.transpose(0, 2, 1, 3).reshape(B, L, HD)

    def path2(q, k, v):
        return fwd_pair(q, k, v, bias, cos2, sin2)[0]

    def bench(fn, tag, iters=50):
        @jax.jit
        def loop(q):
            def body(qq, _):
                return fn(qq, k, v).astype(qq.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=iters)
            return out

        o = loop(q); float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        o = loop(q); float(jnp.sum(o.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        flops = 4 * B * H * L * L * D
        print(f"{tag}: {dt*1e3:7.3f} ms  ({flops/dt/1e12:5.1f} TF/s-equiv)")

    bench(path1, "path1 transpose+rotary+pallas")
    for bq, bk in [(512, 1024), (512, 512), (1024, 512), (1024, 1024),
                   (256, 1024)]:
        bench(lambda qq, kk, vv, bq=bq, bk=bk: fwd_pair(
            qq, kk, vv, bias, cos2, sin2, block_q=bq, block_k=bk)[0],
            f"path2 fused pair bq{bq} bk{bk} ")
    a = np.asarray(jax.jit(path1)(q, k, v), np.float32)
    b2 = np.asarray(jax.jit(path2)(q, k, v), np.float32)
    print("max abs diff:", np.abs(a - b2).max())
