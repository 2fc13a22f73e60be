"""Fused multi-head flash attention in [B, L, H*64] layout (head pairs).

Replaces the [B, H, L, D] kernel for the transformer encoders' hot path
(ESM2/BERT forwards — reference src/models/components/sequence_encoder.py:78):
consuming the QKV projections' natural [B, L, H*D] output kills the
reshape/transpose layout copies XLA otherwise materializes around
`pallas_call` (7 copies * ~42 MB per 650M-hub layer in the round-1 HLO), and
rotary position embeddings are applied inside the kernel so q/k never take
an extra XLA pass.

Design:
  - Pallas requires the last block dim divisible by 128, so each program
    handles a HEAD PAIR (2 x 64 lanes); the two heads are sliced in VMEM.
    Head dims < 64 are zero-padded to 64 half-wise by the dispatcher
    (oneprot_tpu/kernels/attention.py) so in-kernel rotate_half stays
    correct; zero pad lanes don't change logits and the true 1/sqrt(D)
    scale is passed in explicitly.
  - softmax runs in the exp2 domain with scale*log2(e) folded into the q
    prescale and log2(e) folded into the bias — no per-element multiplies.
  - with `lens` given (true sequence lengths, padding at the end), the
    kernels SKIP work on padding: query blocks past the length write zeros
    and exit; key blocks past the length are skipped via lax.cond. With
    length-bucketed batches at ~70% mean fill this halves attention work
    (work scales as (len/bucket)^2).
  - backward follows FlashAttention-2: dq kernel over q blocks, dk/dv
    kernel over k blocks, with lse (base-2) and delta precomputed; rotary
    is re-applied in-kernel and gradients are rotated back with the
    transpose rotation.

Numerics are asserted against the jnp reference path in
tests/test_kernels.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D_PAD = 64                 # padded per-head lane width
_PAIR = 2 * D_PAD          # lanes per program
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453
_NEG_INF = -1e30
_LSE_LANES = 16            # 8 lanes per head in the pair

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
SKIP_BLOCK = 256           # block size when length-skipping is active


def _block(L: int, default: int) -> int:
    for b in (default, 512, 256, 128):
        if L % b == 0 and b <= L:
            return b
    return L


def supports(B: int, H: int, Lq: int, Lk: int, bias_shape) -> bool:
    if H % 2 != 0:
        return False
    if Lq != Lk or Lq < 128 or Lq % 128 != 0:
        return False
    if bias_shape is not None and tuple(bias_shape) != (B, 1, 1, Lk):
        return False
    return True


def _rot_half_pair(x, d):
    """rotate_half applied independently to each head of a [*, 2d] pair."""
    a1, a2 = x[:, :d // 2], x[:, d // 2:d]
    b1, b2 = x[:, d:d + d // 2], x[:, d + d // 2:]
    return jnp.concatenate([-a2, a1, -b2, b1], axis=-1)


def _apply_rot(x, cos, sin, d):
    return x * cos + _rot_half_pair(x, d) * sin


def _apply_rot_t(g, cos, sin, d):
    """Transpose (= inverse) rotation: R^T g = g*cos - rotate_half(g)*sin."""
    return g * cos - _rot_half_pair(g, d) * sin


def _num_k(len_b, block: int, total: int):
    """ceil(len_b / block), clamped to [1, total/block]."""
    n = (len_b + block - 1) // block
    return jnp.clip(n, 1, total // block)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(lens_ref, q_ref, k_ref, v_ref, bias_ref, cos_ref, sin_ref,
                o_ref, lse_ref, *, block_k, lk, scale, rotary, skip):
    in_dtype = q_ref.dtype
    d = D_PAD
    block_q = q_ref.shape[1]
    i_q = pl.program_id(2)
    len_b = lens_ref[pl.program_id(0)]

    def compute():
        q2 = q_ref[0]                                   # [bq, 128]
        if rotary:
            slq = pl.ds(i_q * block_q, block_q)
            q2 = _apply_rot(q2, cos_ref[slq, :], sin_ref[slq, :], d)
        q2 = q2 * jnp.asarray(scale * _LOG2E, in_dtype)
        qa, qb = q2[:, :d], q2[:, d:]
        num_k = lk // block_k

        def block(idx, carry=None):
            sl = pl.ds(idx * block_k, block_k)
            k2 = k_ref[0, sl, :]
            if rotary:
                k2 = _apply_rot(k2, cos_ref[sl, :], sin_ref[sl, :], d)
            bias_blk = bias_ref[0, :, sl]
            v2 = v_ref[0, sl, :]
            sa = jax.lax.dot_general(qa, k2[:, :d], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sb = jax.lax.dot_general(qb, k2[:, d:], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sa = sa + bias_blk
            sb = sb + bias_blk
            ma = jnp.max(sa, axis=-1, keepdims=True)
            mb = jnp.max(sb, axis=-1, keepdims=True)
            if carry is None:
                pa = jnp.exp2(sa - ma)
                pb = jnp.exp2(sb - mb)
                l_a = jnp.sum(pa, axis=-1, keepdims=True)
                l_b = jnp.sum(pb, axis=-1, keepdims=True)
                acc_a = jax.lax.dot_general(
                    pa.astype(in_dtype), v2[:, :d], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_b = jax.lax.dot_general(
                    pb.astype(in_dtype), v2[:, d:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc_a, acc_b, ma, mb, l_a, l_b
            acc_a, acc_b, m_a, m_b, l_a, l_b = carry
            m_na = jnp.maximum(m_a, ma)
            m_nb = jnp.maximum(m_b, mb)
            corr_a = jnp.exp2(m_a - m_na)
            corr_b = jnp.exp2(m_b - m_nb)
            pa = jnp.exp2(sa - m_na)
            pb = jnp.exp2(sb - m_nb)
            l_a = l_a * corr_a + jnp.sum(pa, axis=-1, keepdims=True)
            l_b = l_b * corr_b + jnp.sum(pb, axis=-1, keepdims=True)
            acc_a = acc_a * corr_a + jax.lax.dot_general(
                pa.astype(in_dtype), v2[:, :d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_b = acc_b * corr_b + jax.lax.dot_general(
                pb.astype(in_dtype), v2[:, d:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc_a, acc_b, m_na, m_nb, l_a, l_b

        carry = block(0)
        if skip:
            n_k = _num_k(len_b, block_k, lk)
            for idx in range(1, num_k):
                carry = jax.lax.cond(
                    idx < n_k, lambda c: block(idx, c), lambda c: c, carry)
        else:
            for idx in range(1, num_k):
                carry = block(idx, carry)

        acc_a, acc_b, m_a, m_b, l_a, l_b = carry
        la = jnp.maximum(l_a, 1e-30)
        lb = jnp.maximum(l_b, 1e-30)
        o_ref[0] = jnp.concatenate([acc_a / la, acc_b / lb],
                                   axis=-1).astype(o_ref.dtype)
        lse_ref[0] = jnp.concatenate(
            [jnp.broadcast_to(m_a + jnp.log2(la), (block_q, 8)),
             jnp.broadcast_to(m_b + jnp.log2(lb), (block_q, 8))],
            axis=-1).astype(jnp.float32)

    if skip:
        active = i_q * block_q < len_b

        @pl.when(active)
        def _():
            compute()

        @pl.when(jnp.logical_not(active))
        def _():
            # fully-padded query rows: downstream is mask-aware (pooling
            # masks them; as keys they're bias-masked), any finite value is
            # unused — write zeros
            o_ref[0] = jnp.zeros_like(o_ref[0])
            lse_ref[0] = jnp.zeros_like(lse_ref[0])
    else:
        compute()


def _fwd(q, k, v, bias_b, cos_p, sin_p, lens, scale, rotary, skip,
         interpret=False):
    B, Lq, hd = q.shape
    Lk = k.shape[1]
    H2 = hd // _PAIR
    block_q = _block(Lq, SKIP_BLOCK if skip else DEFAULT_BLOCK_Q)
    block_k = _block(Lk, SKIP_BLOCK if skip else DEFAULT_BLOCK_K)

    q_map = lambda b, h, i, lref: (b, i, h)
    kv_map = lambda b, h, i, lref: (b, 0, h)
    bias_map = lambda b, h, i, lref: (b, 0, 0)
    cs_map = lambda b, h, i, lref: (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H2, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, _PAIR), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, _PAIR), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, _PAIR), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), bias_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lq, _PAIR), cs_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lq, _PAIR), cs_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, _PAIR), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LSE_LANES),
                         lambda b, h, i, lref: (b * H2 + h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, lk=Lk, scale=scale,
                          rotary=rotary, skip=skip),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H2, Lq, _LSE_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(lens, q, k, v, bias_b, cos_p, sin_p)
    return out, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(lens_ref, q_ref, k_ref, v_ref, bias_ref, cos_ref, sin_ref,
                   do_ref, lse_ref, delta_ref, dq_ref,
                   *, block_k, lk, scale, rotary, skip):
    in_dtype = q_ref.dtype
    d = D_PAD
    block_q = q_ref.shape[1]
    i_q = pl.program_id(2)
    len_b = lens_ref[pl.program_id(0)]

    def compute():
        q2 = q_ref[0]
        if rotary:
            slq = pl.ds(i_q * block_q, block_q)
            cos_q, sin_q = cos_ref[slq, :], sin_ref[slq, :]
            q2r = _apply_rot(q2, cos_q, sin_q, d)
        else:
            cos_q = sin_q = None
            q2r = q2
        qf = q2r * jnp.asarray(scale * _LOG2E, in_dtype)
        do2 = do_ref[0]
        lse2 = lse_ref[0]                                # [bq, 16]
        delta2 = delta_ref[0]
        lse_a, lse_b = lse2[:, 0:1], lse2[:, 8:9]
        dl_a, dl_b = delta2[:, 0:1], delta2[:, 8:9]
        qa, qb = qf[:, :d], qf[:, d:]
        doa, dob = do2[:, :d], do2[:, d:]
        num_k = lk // block_k

        def block(idx, carry):
            dq_a, dq_b = carry
            sl = pl.ds(idx * block_k, block_k)
            k2 = k_ref[0, sl, :]
            if rotary:
                k2 = _apply_rot(k2, cos_ref[sl, :], sin_ref[sl, :], d)
            v2 = v_ref[0, sl, :]
            bias_blk = bias_ref[0, :, sl]
            for (qh, doh, lseh, dlh, kh, vh, side) in (
                    (qa, doa, lse_a, dl_a, k2[:, :d], v2[:, :d], 0),
                    (qb, dob, lse_b, dl_b, k2[:, d:], v2[:, d:], 1)):
                s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                p = jnp.exp2(s + bias_blk - lseh)
                dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                ds = (p * (dp - dlh)).astype(in_dtype)
                upd = jax.lax.dot_general(ds, kh, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                if side == 0:
                    dq_a = dq_a + upd
                else:
                    dq_b = dq_b + upd
            return dq_a, dq_b

        carry = (jnp.zeros((block_q, d), jnp.float32),
                 jnp.zeros((block_q, d), jnp.float32))
        if skip:
            n_k = _num_k(len_b, block_k, lk)
            carry = block(0, carry)
            for idx in range(1, num_k):
                carry = jax.lax.cond(
                    idx < n_k, lambda c: block(idx, c), lambda c: c, carry)
        else:
            for idx in range(num_k):
                carry = block(idx, carry)

        dq2 = jnp.concatenate(list(carry), axis=-1) * scale
        if rotary:
            dq2 = _apply_rot_t(dq2, cos_q.astype(jnp.float32),
                               sin_q.astype(jnp.float32), d)
        dq_ref[0] = dq2.astype(dq_ref.dtype)

    if skip:
        active = i_q * block_q < len_b

        @pl.when(active)
        def _():
            compute()

        @pl.when(jnp.logical_not(active))
        def _():
            dq_ref[0] = jnp.zeros_like(dq_ref[0])
    else:
        compute()


def _bwd_dkv_kernel(lens_ref, q_ref, k_ref, v_ref, bias_ref, cos_ref,
                    sin_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                    *, block_q, lq, scale, rotary, skip):
    in_dtype = k_ref.dtype
    d = D_PAD
    j = pl.program_id(2)
    block_k = k_ref.shape[1]
    len_b = lens_ref[pl.program_id(0)]

    def compute():
        k2 = k_ref[0]                                    # [bk, 128]
        if rotary:
            slk = pl.ds(j * block_k, block_k)
            cos_k, sin_k = cos_ref[slk, :], sin_ref[slk, :]
            k2r = _apply_rot(k2, cos_k, sin_k, d)
        else:
            cos_k = sin_k = None
            k2r = k2
        v2 = v_ref[0]
        bias_blk = bias_ref[0]                           # [1, bk]
        num_q = lq // block_q

        def block(idx, carry):
            dk_a, dk_b, dv_a, dv_b = carry
            sl = pl.ds(idx * block_q, block_q)
            q2 = q_ref[0, sl, :]
            if rotary:
                q2 = _apply_rot(q2, cos_ref[sl, :], sin_ref[sl, :], d)
            qf = q2 * jnp.asarray(scale * _LOG2E, in_dtype)
            do2 = do_ref[0, sl, :]
            lse2 = lse_ref[0, sl, :]
            delta2 = delta_ref[0, sl, :]
            for side in (0, 1):
                qh = qf[:, :d] if side == 0 else qf[:, d:]
                doh = do2[:, :d] if side == 0 else do2[:, d:]
                kh = k2r[:, :d] if side == 0 else k2r[:, d:]
                vh = v2[:, :d] if side == 0 else v2[:, d:]
                lseh = lse2[:, 0:1] if side == 0 else lse2[:, 8:9]
                dlh = delta2[:, 0:1] if side == 0 else delta2[:, 8:9]
                s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                p = jnp.exp2(s + bias_blk - lseh)        # [bq, bk]
                p_lo = p.astype(in_dtype)
                dv_upd = jax.lax.dot_general(
                    p_lo, doh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                ds = (p * (dp - dlh)).astype(in_dtype)
                dk_upd = jax.lax.dot_general(
                    ds, qh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if side == 0:
                    dv_a, dk_a = dv_a + dv_upd, dk_a + dk_upd
                else:
                    dv_b, dk_b = dv_b + dv_upd, dk_b + dk_upd
            return dk_a, dk_b, dv_a, dv_b

        carry = (jnp.zeros((block_k, d), jnp.float32),
                 jnp.zeros((block_k, d), jnp.float32),
                 jnp.zeros((block_k, d), jnp.float32),
                 jnp.zeros((block_k, d), jnp.float32))
        if skip:
            # only q blocks within the true length contribute (pad q rows
            # have do == 0 exactly)
            n_q = _num_k(len_b, block_q, lq)
            carry = block(0, carry)
            for idx in range(1, num_q):
                carry = jax.lax.cond(
                    idx < n_q, lambda c: block(idx, c), lambda c: c, carry)
        else:
            for idx in range(num_q):
                carry = block(idx, carry)

        dk_a, dk_b, dv_a, dv_b = carry
        # qf carries scale*log2e; dk needs only scale -> multiply by ln2
        dk2 = jnp.concatenate([dk_a, dk_b], axis=-1) * _LN2
        if rotary:
            dk2 = _apply_rot_t(dk2, cos_k.astype(jnp.float32),
                               sin_k.astype(jnp.float32), d)
        dk_ref[0] = dk2.astype(dk_ref.dtype)
        dv_ref[0] = jnp.concatenate([dv_a, dv_b],
                                    axis=-1).astype(dv_ref.dtype)

    if skip:
        # key blocks past the length receive no probability mass -> zero
        # gradients; skip all work
        active = j * block_k < len_b

        @pl.when(active)
        def _():
            compute()

        @pl.when(jnp.logical_not(active))
        def _():
            dk_ref[0] = jnp.zeros_like(dk_ref[0])
            dv_ref[0] = jnp.zeros_like(dv_ref[0])
    else:
        compute()


def _bwd(scale, rotary, skip, interpret, res, g):
    q, k, v, bias_b, cos_p, sin_p, lens, out, lse = res
    B, Lq, hd = q.shape
    Lk = k.shape[1]
    H2 = hd // _PAIR
    block_q = _block(Lq, SKIP_BLOCK if skip else 512)
    block_k = _block(Lk, SKIP_BLOCK if skip else 512)

    # delta[b, l, head] = sum_d(dout * out) per head, laid out like lse:
    # [B*H2, L, 16] with lanes 0:8 = head a, 8:16 = head b
    go = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        B, Lq, H2, 2, D_PAD).sum(-1)                     # [B, Lq, H2, 2]
    delta = jnp.repeat(go, 8, axis=-1)                   # [B, Lq, H2, 16]
    delta = delta.transpose(0, 2, 1, 3).reshape(B * H2, Lq, _LSE_LANES)

    q_map = lambda b, h, i, lref: (b, i, h)
    kv_full = lambda b, h, i, lref: (b, 0, h)
    bias_full = lambda b, h, i, lref: (b, 0, 0)
    cs_map = lambda b, h, i, lref: (0, 0)
    lse_q = lambda b, h, i, lref: (b * H2 + h, i, 0)
    lse_full = lambda b, h, i, lref: (b * H2 + h, 0, 0)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, lk=Lk,
                          scale=scale, rotary=rotary, skip=skip),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H2, Lq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, _PAIR), q_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lk, _PAIR), kv_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lk, _PAIR), kv_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk), bias_full, memory_space=pltpu.VMEM),
                pl.BlockSpec((Lq, _PAIR), cs_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((Lq, _PAIR), cs_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, _PAIR), q_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, _LSE_LANES), lse_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, _LSE_LANES), lse_q,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, _PAIR), q_map,
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(lens, q, k, v, bias_b, cos_p, sin_p, g, lse, delta)

    k_map = lambda b, h, j, lref: (b, j, h)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, lq=Lq,
                          scale=scale, rotary=rotary, skip=skip),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H2, Lk // block_k),
            in_specs=[
                pl.BlockSpec((1, Lq, _PAIR), kv_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, _PAIR), k_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, _PAIR), k_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k),
                             lambda b, h, j, lref: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lq, _PAIR), cs_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((Lq, _PAIR), cs_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lq, _PAIR), kv_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lq, _LSE_LANES), lse_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lq, _LSE_LANES), lse_full,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, _PAIR), k_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, _PAIR), k_map,
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Lk, hd), k.dtype),
            jax.ShapeDtypeStruct((B, Lk, hd), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(lens, q, k, v, bias_b, cos_p, sin_p, g, lse, delta)

    return dq, dk, dv, None, None, None, None


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _mha_core(q, k, v, bias_b, cos_p, sin_p, lens, scale, rotary, skip,
              interpret):
    out, _ = _fwd(q, k, v, bias_b, cos_p, sin_p, lens, scale, rotary, skip,
                  interpret)
    return out


def _mha_core_fwd(q, k, v, bias_b, cos_p, sin_p, lens, scale, rotary, skip,
                  interpret):
    out, lse = _fwd(q, k, v, bias_b, cos_p, sin_p, lens, scale, rotary, skip,
                    interpret)
    return out, (q, k, v, bias_b, cos_p, sin_p, lens, out, lse)


def _mha_core_bwd(scale, rotary, skip, interpret, res, g):
    return _bwd(scale, rotary, skip, interpret, res, g)


_mha_core.defvjp(_mha_core_fwd, _mha_core_bwd)


def mha_attention(
    q: jax.Array,            # [B, L, H*D]
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    bias: Optional[jax.Array] = None,       # [B, 1, 1, L] additive
    rope_cos: Optional[jax.Array] = None,   # [L, D]
    rope_sin: Optional[jax.Array] = None,
    lens: Optional[jax.Array] = None,       # [B] true lengths (end padding)
    interpret: bool = False,
) -> jax.Array:
    """Flash MHA on [B, L, H*D] activations with optional fused rotary.

    Head dims <= 64 are padded half-wise to 64 (zero lanes change nothing;
    the true 1/sqrt(D) softmax scale is used). With `lens`, padded query/key
    blocks are skipped (requires end-padding consistent with `bias`).
    Returns [B, L, H*D].
    """
    B, L, hd = q.shape
    H = num_heads
    D = hd // H
    if D > D_PAD:
        raise ValueError(f"head dim {D} > {D_PAD} unsupported")
    scale = 1.0 / (D ** 0.5)
    rotary = rope_cos is not None
    skip = lens is not None

    def pad_halfwise(x):
        if D == D_PAD:
            return x
        xh = x.reshape(B, L, H, 2, D // 2)
        xh = jnp.pad(xh, ((0, 0),) * 3 + ((0, 0), (0, (D_PAD - D) // 2)))
        return xh.reshape(B, L, H * D_PAD)

    qp, kp, vp = pad_halfwise(q), pad_halfwise(k), pad_halfwise(v)

    if rotary:
        # per-head table [L, D] = [cos(f), cos(f)]; pad each half to 32
        # lanes (matching pad_halfwise) then tile for the head pair
        ch = rope_cos.reshape(L, 2, D // 2)
        sh = rope_sin.reshape(L, 2, D // 2)
        pad = ((0, 0), (0, 0), (0, (D_PAD - D) // 2))
        cos64 = jnp.pad(ch, pad).reshape(L, D_PAD)
        sin64 = jnp.pad(sh, pad).reshape(L, D_PAD)
        cos_p = jnp.tile(cos64, (1, 2)).astype(q.dtype)
        sin_p = jnp.tile(sin64, (1, 2)).astype(q.dtype)
    else:
        cos_p = jnp.zeros((L, _PAIR), q.dtype)
        sin_p = jnp.zeros((L, _PAIR), q.dtype)

    if bias is None:
        bias_b = jnp.zeros((B, 1, L), jnp.float32)
    else:
        bias_b = bias.reshape(B, 1, L).astype(jnp.float32) * _LOG2E
    if lens is None:
        lens_arr = jnp.full((B,), L, jnp.int32)
    else:
        lens_arr = lens.astype(jnp.int32)

    out = _mha_core(qp, kp, vp, bias_b, cos_p, sin_p, lens_arr, scale,
                    rotary, skip, interpret)
    if D == D_PAD:
        return out
    oh = out.reshape(B, L, H, 2, D_PAD // 2)
    return oh[..., :D // 2].reshape(B, L, hd)
