"""Fused flash-attention Pallas kernel (FlashAttention-2 tiling) for TPU.

Forward + backward as Pallas kernels behind jax.custom_vjp; additive
key-padding-bias aware. Replaces the cuDNN attention inside the reference's
ESM2/BERT forwards (reference src/models/components/sequence_encoder.py:78).

Layout notes (see /opt/skills/guides/pallas_guide.md):
  - all tensor blocks keep the (>=8, 128k) tile rule; the softmax
    normalizer/LSE is stored as [B*H, Lq, 8] (8 lanes replicated) so its
    blocks tile legally, and row statistics stay 2-D inside kernels
  - fp32 accumulation on the MXU via preferred_element_type
  - grid dim 0 (batch*heads) is parallel; the q/k block loops are arbitrary
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
_LOG2E = 1.4426950408889634  # softmax in exp2 domain (exp2 is cheaper on the VPU)
_NEG_INF = -1e30
_LSE_LANES = 8


def supports(q, k, v, bias) -> bool:
    """Shapes the kernel handles: 128-divisible seq blocks, head dim >=64
    (smaller head dims pad poorly onto the lane dim — XLA wins there)."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if D % 8 != 0 or D < 64 or D > 256:
        return False
    if Lq < 128 or Lk < 128:
        return False
    if Lq % 128 or Lk % 128:
        # _block_q/_block_k fall back to L itself, so testing against them
        # was a tautology; an unbucketed length like 2056 would launch a
        # single [L, L] f32 score tile and fail Mosaic/VMEM compile
        # instead of falling back to the XLA reference path
        return False
    if bias is not None and bias.shape != (B, 1, 1, Lk):
        return False
    return True


def _block_q(L: int) -> int:
    for b in (DEFAULT_BLOCK_Q, 128):
        if L % b == 0:
            return b
    return L


def _block_k(L: int) -> int:
    for b in (DEFAULT_BLOCK_K, 256, 128):
        if L % b == 0:
            return b
    return L


def _canonical_bias(bias, B, Lk):
    """[B, 1, Lk] key-padding bias (the only mask form the encoders emit —
    padding masks; no causal/long-context path needed, SURVEY §5)."""
    if bias is None:
        return jnp.zeros((B, 1, Lk), jnp.float32)
    return bias.reshape(B, 1, Lk).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                *, block_k, lk, scale):
    # operands stay in the input dtype (bf16 in production) so the MXU runs
    # native bf16 passes; accumulation/softmax stats are fp32 via
    # preferred_element_type (fp32 operands would cost ~4x MXU throughput)
    in_dtype = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, in_dtype)        # [bq, D]
    block_q, d = q.shape
    num_k = lk // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry                    # [bq,D],[bq,1],[bq,1]
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bq, bk] fp32
        s = (s + bias_ref[0, :, pl.ds(i * block_k, block_k)].astype(
            jnp.float32)) * _LOG2E                     # base-2 domain
        m_cur = jnp.max(s, axis=-1, keepdims=True)     # [bq, 1]
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
    lse2 = m_fin + jnp.log2(l_safe)                    # [bq, 1], base-2
    lse_ref[0] = jnp.broadcast_to(lse2, (block_q, _LSE_LANES)).astype(jnp.float32)


def _fwd(q, k, v, bias):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    block_q = _block_q(Lq)
    block_k = _block_k(Lk)
    scale = 1.0 / (D ** 0.5)
    bias_b = _canonical_bias(bias, B, Lk)

    qr = q.reshape(B * H, Lq, D)
    kr = k.reshape(B * H, Lk, D)
    vr = v.reshape(B * H, Lk, D)

    q_map = lambda p, i: (p, i, 0)
    kv_map = lambda p, i: (p, 0, 0)
    bias_map = lambda p, i: (p // H, 0, 0)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, lk=Lk, scale=scale),
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
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, block_k, lk, scale):
    in_dtype = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, in_dtype)
    do = do_ref[0]
    lse = lse_ref[0][:, 0:1]                           # [bq, 1]
    delta = delta_ref[0][:, 0:1]
    block_q, d = q.shape
    num_k = lk // block_k

    def body(i, dq_acc):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = (s + bias_ref[0, :, pl.ds(i * block_k, block_k)].astype(
            jnp.float32)) * _LOG2E
        p = jnp.exp2(s - lse)                          # lse is base-2
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(in_dtype)
        return dq_acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_k, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q, lq, scale):
    in_dtype = k_ref.dtype
    k_blk = k_ref[0]                                   # [bk, D]
    v_blk = v_ref[0]
    bias_blk = bias_ref[0].astype(jnp.float32)         # [1, bk]
    block_k, d = k_blk.shape
    num_q = lq // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :] * jnp.asarray(
            scale, in_dtype)
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), 0:1]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), 0:1]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = (s + bias_blk) * _LOG2E
        p = jnp.exp2(s - lse)                          # [bq, bk]; lse base-2
        p_lo = p.astype(in_dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(in_dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    # q inside body is already scaled, so ds^T @ q_scaled IS dL/dk — no
    # further scale factor (dq differs: dL/dq = (ds @ k) * scale)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(res, g):
    q, k, v, bias, out, lse = res
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    block_q = _block_q(Lq)
    block_k = _block_k(Lk)
    scale = 1.0 / (D ** 0.5)
    bias_b = _canonical_bias(bias, B, Lk)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None],
                             delta.shape + (_LSE_LANES,))

    qr = q.reshape(B * H, Lq, D)
    kr = k.reshape(B * H, Lk, D)
    vr = v.reshape(B * H, Lk, D)
    dor = g.reshape(B * H, Lq, D)
    lser = lse.reshape(B * H, Lq, _LSE_LANES)
    deltar = delta.reshape(B * H, Lq, _LSE_LANES)

    q_map = lambda p, i: (p, i, 0)
    full3 = lambda p, i: (p, 0, 0)
    bias_map = lambda p, i: (p // H, 0, 0)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, lk=Lk, scale=scale),
        grid=(B * H, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), bias_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LSE_LANES), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LSE_LANES), q_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qr, kr, vr, bias_b, dor, lser, deltar)

    k_map = lambda p, j: (p, j, 0)
    bias_k_map = lambda p, j: (p // H, 0, j)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, lq=Lq, scale=scale),
        grid=(B * H, Lk // block_k),
        in_specs=[
            pl.BlockSpec((1, Lq, D), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), bias_k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, D), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, _LSE_LANES), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, _LSE_LANES), full3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), k_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lk, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Lk, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qr, kr, vr, bias_b, dor, lser, deltar)

    return (
        dq.reshape(B, H, Lq, D),
        dk.reshape(B, H, Lk, D),
        dv.reshape(B, H, Lk, D),
        None,
    )


@jax.custom_vjp
def flash_attention(q, k, v, bias=None):
    out, _ = _fwd(q, k, v, bias)
    return out


def _flash_fwd(q, k, v, bias):
    out, lse = _fwd(q, k, v, bias)
    return out, (q, k, v, bias, out, lse)


flash_attention.defvjp(_flash_fwd, _bwd)
