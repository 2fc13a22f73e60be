"""Tied-row flash attention for the MSA Transformer (fwd-only Pallas kernel).

The MSA encoder's row attention (oneprot_tpu/models/msa_transformer.py
`TiedRowAttention`, mirroring fair-esm's esm_msa1b used by the reference,
reference src/models/components/msa_encoder.py:18-21) ties one attention map
across all R MSA rows:

    logits[b,h,i,j] = sum_r q[b,r,i,h,:] . k[b,r,j,h,:] * scale + col_bias
    ctx[b,r,i,h,:]  = sum_j softmax_j(logits) * v[b,r,j,h,:]

Under plain XLA this materializes the [B, H, L, L] fp32 logits and probs in
HBM (~100 MB per layer at L=1024, B=4, H=12) and re-reads them for the PV
contraction. This kernel streams key blocks flash-style (logits never leave
VMEM), accumulates the row-tied QK sum on the MXU with the row dim unrolled,
and pays ONE online softmax for all R rows' PV products — the VPU softmax
cost is amortized R-fold vs ordinary per-row attention.

Structure: grid (B, H/2, q-blocks, k-blocks); each program owns a head pair
(2 x 64 = 128 lanes, like kernels/flash_mha.py). The k-block axis is the
innermost sequential ("arbitrary") dim; the online-softmax state (running
max/denominator and the per-row PV accumulators) lives in VMEM scratch and
carries across k iterations; the output block is written on the last one.

Forward only by design: the reference ALWAYS freezes the MSA tower
(msa_encoder.py:30-32), so this op sits behind `stop_gradient` and is never
differentiated.

Numerics asserted against the jnp einsum path in tests/test_kernels.py
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_D = 64                    # per-head lanes (MSA-1b head dim is exactly 64)
_PAIR = 2 * _D
_LOG2E = 1.4426950408889634
_NEG = -1e30


def supports(B: int, R: int, L: int, H: int, head_dim: int) -> bool:
    if head_dim != _D or H % 2 != 0:
        return False
    if L < 256 or L % 128 != 0:
        return False
    return True


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref,
            *, scale, rows, num_k):
    """One (batch, head-pair, q-block, k-block) program.

    q_ref: [1, R, bq, 128]; k_ref/v_ref: [1, R, bk, 128];
    bias_ref: [1, 1, bk]; o_ref: [1, R, bq, 128].
    Scratch: m_ref/l_ref [2, bq, 128] (running max / denom per head,
    broadcast over lanes), acc_ref [R, bq, 128] (PV accumulators, heads
    concatenated on lanes).
    """
    in_dtype = q_ref.dtype
    bq = q_ref.shape[2]
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bias_blk = bias_ref[0]                               # [1, bk]
    qscale = jnp.asarray(scale * _LOG2E, in_dtype)

    # tied logits: sum over rows, per head of the pair
    sa = jnp.zeros((bq, k_ref.shape[2]), jnp.float32)
    sb = jnp.zeros_like(sa)
    for r in range(rows):
        q2 = q_ref[0, r] * qscale
        k2 = k_ref[0, r]
        sa = sa + jax.lax.dot_general(
            q2[:, :_D], k2[:, :_D], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sb = sb + jax.lax.dot_general(
            q2[:, _D:], k2[:, _D:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    sa = sa + bias_blk
    sb = sb + bias_blk

    m_a = m_ref[0, :, :1]
    m_b = m_ref[1, :, :1]
    ma = jnp.maximum(m_a, jnp.max(sa, axis=-1, keepdims=True))
    mb = jnp.maximum(m_b, jnp.max(sb, axis=-1, keepdims=True))
    corr_a = jnp.exp2(m_a - ma)
    corr_b = jnp.exp2(m_b - mb)
    pa = jnp.exp2(sa - ma)
    pb = jnp.exp2(sb - mb)
    l_ref[0] = jnp.broadcast_to(
        l_ref[0, :, :1] * corr_a + jnp.sum(pa, axis=-1, keepdims=True),
        l_ref[0].shape)
    l_ref[1] = jnp.broadcast_to(
        l_ref[1, :, :1] * corr_b + jnp.sum(pb, axis=-1, keepdims=True),
        l_ref[1].shape)
    m_ref[0] = jnp.broadcast_to(ma, m_ref[0].shape)
    m_ref[1] = jnp.broadcast_to(mb, m_ref[1].shape)

    corr128 = jnp.concatenate(
        [jnp.broadcast_to(corr_a, (bq, _D)),
         jnp.broadcast_to(corr_b, (bq, _D))], axis=-1)
    pa_lo = pa.astype(in_dtype)
    pb_lo = pb.astype(in_dtype)
    for r in range(rows):
        v2 = v_ref[0, r]
        pv_a = jax.lax.dot_general(
            pa_lo, v2[:, :_D], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        pv_b = jax.lax.dot_general(
            pb_lo, v2[:, _D:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[r] = acc_ref[r] * corr128 + jnp.concatenate(
            [pv_a, pv_b], axis=-1)

    @pl.when(j == num_k - 1)
    def _():
        l_a = jnp.maximum(l_ref[0, :, :1], 1e-30)
        l_b = jnp.maximum(l_ref[1, :, :1], 1e-30)
        inv = jnp.concatenate(
            [jnp.broadcast_to(1.0 / l_a, (bq, _D)),
             jnp.broadcast_to(1.0 / l_b, (bq, _D))], axis=-1)
        for r in range(rows):
            o_ref[0, r] = (acc_ref[r] * inv).astype(o_ref.dtype)


def tied_row_attention(
    q: jax.Array,            # [B, R, L, H*64]
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    col_bias: Optional[jax.Array] = None,   # [B, 1, 1, L] additive
    scale: Optional[float] = None,          # default (64*R)^-0.5 tied scale
    interpret: bool = False,
) -> jax.Array:
    """Row-tied MSA attention; returns [B, R, L, H*64].

    `scale` defaults to head_dim^-0.5 * R^-0.5 (the tied-attention scaling
    in msa_transformer.py). Differentiation is unsupported (frozen tower).
    """
    B, R, L, hd = q.shape
    H = num_heads
    D = hd // H
    if not supports(B, R, L, H, D):
        raise ValueError(f"unsupported tied-row shape {q.shape} H={H}")
    if scale is None:
        scale = (D ** -0.5) * (R ** -0.5)

    H2 = H // 2
    # block sizes bounded by VMEM: q/k/v/o blocks are [R, block, 128] plus
    # the [R, block_q, 128] f32 accumulator
    per_elem = 2 if q.dtype == jnp.bfloat16 else 4
    blk = 256
    while blk > 128 and R * blk * _PAIR * (4 * per_elem + 4) > 10 * 2 ** 20:
        blk //= 2
    block = blk if L % blk == 0 else 128
    num_k = L // block

    if col_bias is None:
        bias_b = jnp.zeros((B, 1, L), jnp.float32)
    else:
        bias_b = col_bias.reshape(B, 1, L).astype(jnp.float32) * _LOG2E

    q_map = lambda b, h, i, j: (b, 0, i, h)
    kv_map = lambda b, h, i, j: (b, 0, j, h)
    bias_map = lambda b, h, i, j: (b, 0, j)

    call = pl.pallas_call(
        functools.partial(_kernel, scale=scale, rows=R, num_k=num_k),
        grid=(B, H2, L // block, num_k),
        in_specs=[
            pl.BlockSpec((1, R, block, _PAIR), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, block, _PAIR), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, block, _PAIR), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), bias_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, block, _PAIR), q_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, L, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block, 128), jnp.float32),
            pltpu.VMEM((2, block, 128), jnp.float32),
            pltpu.VMEM((R, block, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
        interpret=interpret,
    )

    # Forward-only guard: this kernel has no backward, which is fine for the
    # always-frozen MSA tower (reference msa_encoder.py:30-32) — but if a
    # caller ever differentiates through it (tower unfrozen with
    # ONEPROT_TIED_ROW=1), fail with a clear message instead of an obscure
    # Pallas autodiff error (advisor round-1 finding).
    wrapped = jax.custom_vjp(lambda q_, k_, v_, b_: call(q_, k_, v_, b_))

    def _vjp_fwd(q_, k_, v_, b_):
        return call(q_, k_, v_, b_), None

    def _vjp_bwd(_res, _g):
        raise NotImplementedError(
            "tied_row_attention is a forward-only kernel: it requires the "
            "MSA tower to stay frozen (stop_gradient). Unset "
            "ONEPROT_TIED_ROW=1 or keep the tower frozen.")

    wrapped.defvjp(_vjp_fwd, _vjp_bwd)
    return wrapped(q, k, v, bias_b)
