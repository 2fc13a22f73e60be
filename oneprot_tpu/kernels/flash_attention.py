"""Fused flash-attention Pallas kernel (FlashAttention-2 tiling) for TPU.

Forward + backward as Pallas kernels behind jax.custom_vjp; additive-bias
(padding mask) aware. Replaces the cuDNN attention inside the reference's
ESM2/BERT forwards (reference src/models/components/sequence_encoder.py:78).

See /opt/skills/guides/pallas_guide.md for the kernel-language rules followed
here (static shapes, (8/16,128) tiling, fp32 accumulation on the MXU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
_NEG_INF = -1e30


def supports(q, k, v, bias) -> bool:
    """Shapes the kernel handles: seq divisible into blocks, head dim <=256."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if D > 256:
        return False
    if Lq < 128 or Lk < 128:
        return False
    if Lq % _block_q(Lq) or Lk % _block_k(Lk):
        return False
    if bias is not None and bias.shape not in (
        (B, 1, 1, Lk),
        (B, H, Lq, Lk),
    ):
        return False
    return True


def _block_q(L: int) -> int:
    for b in (DEFAULT_BLOCK_Q, 128):
        if L % b == 0:
            return b
    return L


def _block_k(L: int) -> int:
    for b in (DEFAULT_BLOCK_K, 128):
        if L % b == 0:
            return b
    return L


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, block_k, lk, scale):
    """One (batch*head, q_block) program: stream K/V blocks, online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale  # [block_q, D]
    block_q = q.shape[0]
    d = q.shape[1]
    num_k = lk // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        s = s + bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :].astype(jnp.float32)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * correction + jnp.sum(p, axis=-1)
        acc = acc * correction[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l_fin, 1e-30)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0] = (m_fin + jnp.log(l_safe)).astype(jnp.float32)


def _fwd(q, k, v, bias):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    block_q = _block_q(Lq)
    block_k = _block_k(Lk)
    scale = 1.0 / (D ** 0.5)
    bias_b = _canonical_bias(bias, B, Lk, q.dtype)

    grid = (B * H, Lq // block_q)

    def q_map(p, i):
        return (p, i * block_q, 0)

    def kv_map(p, i):
        return (p, 0, 0)

    def bias_map(p, i):
        return (p // H, 0, 0)

    qr = q.reshape(B * H, Lq, D)
    kr = k.reshape(B * H, Lk, D)
    vr = v.reshape(B * H, Lk, D)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, lk=Lk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), bias_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q), lambda p, i: (p, i * block_q),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qr, kr, vr, bias_b)
    return out.reshape(B, H, Lq, D), lse.reshape(B, H, Lq)


def _canonical_bias(bias, B, Lk, dtype):
    """Kernel consumes a [B, 1, Lk] key-padding bias (the only form the
    framework's encoders emit: padding masks, SURVEY §5 long-context absent)."""
    if bias is None:
        return jnp.zeros((B, 1, Lk), jnp.float32)
    if bias.shape == (B, 1, 1, Lk):
        return bias.reshape(B, 1, Lk).astype(jnp.float32)
    raise NotImplementedError(f"bias shape {bias.shape}")


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, block_k, lk, scale):
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]
    block_q, d = q.shape
    num_k = lk // block_k

    def body(i, dq_acc):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :].astype(jnp.float32)
        p = jnp.exp(s - lse[:, None])
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        return dq_acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, num_k, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q, lq, scale):
    k_blk = k_ref[0].astype(jnp.float32)  # [block_k, D]
    v_blk = v_ref[0].astype(jnp.float32)
    bias_blk = bias_ref[0, 0].astype(jnp.float32)  # [block_k]
    block_k, d = k_blk.shape
    num_q = lq // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32) * scale
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, pl.ds(i * block_q, block_q)]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_blk[None, :]
        p = jnp.exp(s - lse[:, None])  # [block_q, block_k]
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(res, g):
    q, k, v, bias, out, lse = res
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    block_q = _block_q(Lq)
    block_k = _block_k(Lk)
    scale = 1.0 / (D ** 0.5)
    bias_b = _canonical_bias(bias, B, Lk, q.dtype)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    qr = q.reshape(B * H, Lq, D)
    kr = k.reshape(B * H, Lk, D)
    vr = v.reshape(B * H, Lk, D)
    dor = g.reshape(B * H, Lq, D)
    lser = lse.reshape(B * H, Lq)
    deltar = delta.reshape(B * H, Lq)

    def full_kv(p, i):
        return (p, 0, 0)

    def q_map(p, i):
        return (p, i * block_q, 0)

    def lse_map(p, i):
        return (p, i * block_q)

    def bias_map(p, i):
        return (p // H, 0, 0)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, lk=Lk, scale=scale),
        grid=(B * H, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), full_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), full_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), bias_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q), lse_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q), lse_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qr, kr, vr, bias_b, dor, lser, deltar)

    def k_map(p, j):
        return (p, j * block_k, 0)

    def full_q(p, j):
        return (p, 0, 0)

    def full_lse(p, j):
        return (p, 0)

    def bias_k_map(p, j):
        return (p // H, 0, j * block_k)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, lq=Lq, scale=scale),
        grid=(B * H, Lk // block_k),
        in_specs=[
            pl.BlockSpec((1, Lq, D), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), bias_k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, D), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq), full_lse, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq), full_lse, memory_space=pltpu.VMEM),
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
            dimension_semantics=("parallel", "arbitrary"),
        ),
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
