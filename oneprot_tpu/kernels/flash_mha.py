"""Fused multi-head flash attention in [B, L, H*d] layout (head groups).

Replaces the [B, H, L, D] kernel for the transformer encoders' hot path
(ESM2/BERT forwards — reference src/models/components/sequence_encoder.py:78):
consuming the QKV projections' natural [B, L, H*D] output kills the
reshape/transpose layout copies XLA otherwise materializes around
`pallas_call` (7 copies * ~42 MB per 650M-hub layer in the round-1 HLO), and
rotary position embeddings are applied inside the kernel so q/k never take
an extra XLA pass.

Design:
  - Pallas requires the last block dim divisible by 128, so each program
    handles a GROUP of G heads at d = 128/G lanes each (G=2 -> d=64 for the
    650M/BERT towers, G=4 -> d=32 for small towers); the heads are sliced
    in VMEM. True head dims < d are zero-padded to d half-wise by the
    dispatcher (oneprot_tpu/kernels/attention.py) so in-kernel rotate_half
    stays correct; zero pad lanes don't change logits and the true
    1/sqrt(D) scale is passed in explicitly. Picking the smallest d >= D
    matters: attention matmul time scales with the padded head width, so
    the ESM2-35M tower (D=24) runs its whole attention ~2x leaner at d=32
    than padded to 64.
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

D_PAD = 64                 # default / maximum padded per-head lane width
_BLOCK_LANES = 2 * D_PAD   # lanes per program (always 128)
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453
_NEG_INF = -1e30
_HEAD_LSE = 8              # lse lanes per head

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
SKIP_BLOCK = 256           # block size when length-skipping is active


def _block(L: int, default: int) -> int:
    # 384/768 serve the finer length buckets (L must divide into blocks)
    for b in (default, 768, 512, 384, 256, 128):
        if L % b == 0 and b <= L:
            return b
    return L


def _chunk_count(HG: int, Lq: int, skip: bool) -> int:
    """Head-group chunks per program (lane width = C*128).

    At short L the per-program attention tiles shrink while the program
    count grows (grid has a head-group dimension with full-L k/v blocks) —
    measured on v5e the hub forward was nearly FLAT in L at a fixed token
    budget (attention ~4x costlier than its FLOP share at L=256). Packing C
    consecutive head groups into one program restores per-program work at
    short L. C=1 recovers the old layout; the skip (length-masked) variant
    keeps C=1 (its 256-wide blocks already bound per-program work).
    """
    if skip or HG <= 1:
        return 1
    import os

    env = os.environ.get("ONEPROT_MHA_CHUNKS")
    if env:
        # experimentation override: "L:C,L:C,..."; malformed entries
        # ("512", "512:0", "512:x") are skipped instead of raising
        # ValueError/ZeroDivisionError inside jit tracing (advisor
        # round-2 finding)
        for part in env.split(","):
            try:
                l_s, c_s = part.split(":")
                l_v, c_v = int(l_s), int(c_s)
            except ValueError:
                continue
            if c_v <= 0:
                continue
            if l_v == Lq and HG % c_v == 0:
                return c_v
        return 1
    # Measured on v5e (scripts/microbench_attn.py, hub geometry): C=2 at
    # L=512 is ~12% faster fwd (2.85 -> 2.52 ms/layer); C=5 at L=256 is
    # slightly SLOWER (2.54 -> 2.72 — the short-L bottleneck is small-dot
    # issue latency, which packing more groups per program does not fix);
    # C=2 at L=1024 overflows VMEM at compile. Default: chunk only L=512.
    cap = 2 if Lq == 512 else 1
    for c in range(min(cap, HG), 0, -1):
        if HG % c == 0:
            return c
    return 1


def supports(B: int, H: int, Lq: int, Lk: int, bias_shape,
             group: int = 2) -> bool:
    if H % group != 0:
        return False
    if Lq != Lk or Lq < 128 or Lq % 128 != 0:
        return False
    if bias_shape is not None and tuple(bias_shape) != (B, 1, 1, Lk):
        return False
    return True


def _rot_half_group(x, d):
    """rotate_half applied independently to each head of a [*, G*d] group."""
    parts = []
    for g in range(x.shape[-1] // d):
        h1 = x[:, g * d:g * d + d // 2]
        h2 = x[:, g * d + d // 2:(g + 1) * d]
        parts.extend([-h2, h1])
    return jnp.concatenate(parts, axis=-1)


def _apply_rot(x, cos, sin, d):
    return x * cos + _rot_half_group(x, d) * sin


def _apply_rot_t(g, cos, sin, d):
    """Transpose (= inverse) rotation: R^T g = g*cos - rotate_half(g)*sin."""
    return g * cos - _rot_half_group(g, d) * sin


def _num_k(len_b, block: int, total: int):
    """ceil(len_b / block), clamped to [1, total/block]."""
    n = (len_b + block - 1) // block
    return jnp.clip(n, 1, total // block)


def _head(x, g, d):
    return x[:, g * d:(g + 1) * d]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(lens_ref, q_ref, k_ref, v_ref, bias_ref, cos_ref, sin_ref,
                segq_ref, segk_ref, o_ref, lse_ref, *, block_k, lk, scale,
                rotary, skip, d, chunks, segmented, fused, seg_skip):
    in_dtype = q_ref.dtype
    G = _BLOCK_LANES // d
    block_q = q_ref.shape[1]
    i_q = pl.program_id(2)
    len_b = lens_ref[pl.program_id(0)]

    def compute():
        o_parts, lse_parts = [], []
        if seg_skip:
            # packed rows: segments are contiguous, so [min, max] segment-id
            # ranges decide whether a (q block, k block) pair can contain
            # ANY same-segment pair; disjoint ranges mean every logit is
            # -inf masked and the whole block is skipped (see _segskip)
            sq = segq_ref[0]
            q_lo, q_hi = jnp.min(sq), jnp.max(sq)
        for c in range(chunks):
            lo = c * _BLOCK_LANES
            q2 = q_ref[0][:, lo:lo + _BLOCK_LANES]      # [bq, 128]
            if rotary:
                slq = pl.ds(i_q * block_q, block_q)
                q2 = _apply_rot(q2, cos_ref[slq, :], sin_ref[slq, :], d)
            q2 = q2 * jnp.asarray(scale * _LOG2E, in_dtype)
            qs = [] if fused else [_head(q2, g, d) for g in range(G)]
            num_k = lk // block_k
            if segmented:
                seg_q = segq_ref[0]                      # [bq, 1]

            def block_fused(idx, carry=None):
                """All G heads of the chunk in ONE QK dot and ONE PV dot.

                The per-head dots [bq,d]x[d,bk] leave the MXU's 128-row
                contraction half (d=64) or three-quarters (d=32) idle and
                pay per-dot issue latency G times per k block — measured
                the flat ~2.5 ms/layer attention floor at short L
                (docs/PERFORMANCE.md "where the remaining time goes").
                Packing the G heads BLOCK-DIAGONALLY into k'/v' of shape
                [G*bk, 128] makes one dot q2 @ k'^T = [S_h0 | ... | S_hG]
                with the full 128-lane contraction busy: the zero blocks
                occupy exactly the MXU passes the d-padding wasted anyway,
                so the pass count is unchanged while the dot count drops
                G-fold. Softmax uses ONE max shared across the chunk's
                heads (lse = m + log2(l_g) is max-invariant, so the lse
                contract with the backward kernels is unchanged).
                """
                sl = pl.ds(idx * block_k, block_k)
                k2 = k_ref[0, sl, lo:lo + _BLOCK_LANES]
                if rotary:
                    k2 = _apply_rot(k2, cos_ref[sl, :], sin_ref[sl, :], d)
                bias_blk = bias_ref[0, :, sl]
                if segmented:
                    seg_k = segk_ref[0, :, sl]           # [1, bk]
                    bias_blk = bias_blk + jnp.where(
                        seg_q == seg_k, 0.0, _NEG_INF)
                v2 = v_ref[0, sl, lo:lo + _BLOCK_LANES]
                zero = jnp.zeros((block_k, d), in_dtype)

                def bdiag(x):
                    return jnp.concatenate([
                        jnp.concatenate(
                            [_head(x, g, d) if gg == g else zero
                             for gg in range(G)], axis=1)
                        for g in range(G)], axis=0)     # [G*bk, 128]

                s = jax.lax.dot_general(
                    q2, bdiag(k2), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [bq, G*bk]
                s = s + jnp.concatenate([bias_blk] * G, axis=-1)
                m = jnp.max(s, axis=-1, keepdims=True)   # shared over heads
                if carry is None:
                    p = jnp.exp2(s - m)
                    ls = [jnp.sum(p[:, g * block_k:(g + 1) * block_k],
                                  axis=-1, keepdims=True)
                          for g in range(G)]
                    acc = jax.lax.dot_general(
                        p.astype(in_dtype), bdiag(v2),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [bq, 128]
                else:
                    acc0, m0 = carry[0], carry[1]
                    m_n = jnp.maximum(m0, m)
                    corr = jnp.exp2(m0 - m_n)            # [bq, 1], shared
                    p = jnp.exp2(s - m_n)
                    ls = [carry[2 + g] * corr
                          + jnp.sum(p[:, g * block_k:(g + 1) * block_k],
                                    axis=-1, keepdims=True)
                          for g in range(G)]
                    acc = acc0 * corr + jax.lax.dot_general(
                        p.astype(in_dtype), bdiag(v2),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    m = m_n
                return (acc, m) + tuple(ls)

            def block(idx, carry=None):
                sl = pl.ds(idx * block_k, block_k)
                k2 = k_ref[0, sl, lo:lo + _BLOCK_LANES]
                if rotary:
                    k2 = _apply_rot(k2, cos_ref[sl, :], sin_ref[sl, :], d)
                bias_blk = bias_ref[0, :, sl]
                if segmented:
                    # packed sequences: cross-segment logits are masked
                    seg_k = segk_ref[0, :, sl]           # [1, bk]
                    bias_blk = bias_blk + jnp.where(
                        seg_q == seg_k, 0.0, _NEG_INF)
                v2 = v_ref[0, sl, lo:lo + _BLOCK_LANES]
                accs, ms, ls = [], [], []
                for g in range(G):
                    s = jax.lax.dot_general(
                        qs[g], _head(k2, g, d), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s + bias_blk
                    m = jnp.max(s, axis=-1, keepdims=True)
                    if carry is None:
                        p = jnp.exp2(s - m)
                        l = jnp.sum(p, axis=-1, keepdims=True)
                        acc = jax.lax.dot_general(
                            p.astype(in_dtype), _head(v2, g, d),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:
                        acc0, m0, l0 = (carry[g], carry[G + g],
                                        carry[2 * G + g])
                        m_n = jnp.maximum(m0, m)
                        corr = jnp.exp2(m0 - m_n)
                        p = jnp.exp2(s - m_n)
                        l = l0 * corr + jnp.sum(p, axis=-1, keepdims=True)
                        acc = acc0 * corr + jax.lax.dot_general(
                            p.astype(in_dtype), _head(v2, g, d),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        m = m_n
                    accs.append(acc)
                    ms.append(m)
                    ls.append(l)
                return tuple(accs) + tuple(ms) + tuple(ls)

            step = block_fused if fused else block
            carry = step(0)
            if skip or seg_skip:
                n_k = _num_k(len_b, block_k, lk) if skip else None
                for idx in range(1, num_k):
                    pred = None
                    if skip:
                        pred = idx < n_k
                    if seg_skip:
                        skb = segk_ref[0, :,
                                       idx * block_k:(idx + 1) * block_k]
                        hit = jnp.logical_and(q_lo <= jnp.max(skb),
                                              jnp.min(skb) <= q_hi)
                        pred = hit if pred is None else jnp.logical_and(
                            pred, hit)
                    carry = jax.lax.cond(
                        pred, lambda cr, idx=idx: step(idx, cr),
                        lambda cr: cr, carry)
            else:
                for idx in range(1, num_k):
                    carry = step(idx, carry)

            if fused:
                acc_f, m_sh = carry[0], carry[1]
                ls = [jnp.maximum(l, 1e-30) for l in carry[2:]]
                linv = jnp.concatenate(
                    [jnp.broadcast_to(1.0 / ls[g], (block_q, d))
                     for g in range(G)], axis=-1)        # [bq, 128]
                o_parts.append(acc_f * linv)
                lse_parts.append(jnp.concatenate(
                    [jnp.broadcast_to(m_sh + jnp.log2(ls[g]),
                                      (block_q, _HEAD_LSE))
                     for g in range(G)], axis=-1))
                continue

            accs, ms, ls = carry[:G], carry[G:2 * G], carry[2 * G:]
            ls = [jnp.maximum(l, 1e-30) for l in ls]
            o_parts.append(jnp.concatenate(
                [accs[g] / ls[g] for g in range(G)], axis=-1))
            lse_parts.append(jnp.concatenate(
                [jnp.broadcast_to(ms[g] + jnp.log2(ls[g]),
                                  (block_q, _HEAD_LSE))
                 for g in range(G)], axis=-1))
        o_ref[0] = jnp.concatenate(o_parts, axis=-1).astype(o_ref.dtype)
        lse_ref[0] = jnp.concatenate(lse_parts, axis=-1).astype(jnp.float32)

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


def _seg_views(seg, B, Lq):
    """Segment ids [B, L] -> (q view [B, Lq, 1], k view [B, 1, Lq],
    segmented flag). With seg=None, tiny dummies keep the kernel signature
    stable while `segmented=False` drops all masking code."""
    if seg is None:
        dummy = jnp.zeros((B, 1, 1), jnp.int32)
        return dummy, jnp.zeros((B, 1, 1), jnp.int32), False
    seg = seg.astype(jnp.int32)
    return seg[:, :, None], seg[:, None, :], True


def _segskip(segmented: bool, Lq: int) -> bool:
    """Segment-aware block skipping for PACKED rows (VERDICT r3 #3).

    With ~5 proteins packed per 512-token row, only sum(seg_len^2)/L^2
    ~ 20-45% of attention logits are within-segment — the rest are
    computed and then -inf masked. Packed segments are contiguous, so a
    (q block, k block) pair whose segment-id ranges are disjoint is
    provably all-masked: the kernels split the k/q streaming loops into
    128-wide blocks and lax.cond-skip those pairs (forward, dq, and dk/dv).
    Numerics are exact (skipped blocks contribute zero probability mass /
    zero gradient by construction).

    MEASURED REJECTION (kept as an opt-in experiment, default OFF): on
    v5e at the packed tower shape (B=32 L=512 H=20 d=32-padded, 5
    segments/row, scripts/microbench_tower_attn.py) the skip LOSES —
    fwd 2.71 -> 4.29 ms/layer, fwd+bwd 5.37 -> 8.99 at 128-wide stream
    blocks; 3.21 / 6.67 at 256-wide. The narrow stream blocks the skip
    needs (128-256 vs the default 512-wide k stream) raise the small-dot
    issue count by 2-4x, and on this geometry the kernel is issue-bound,
    not FLOP-bound (docs/PERFORMANCE.md "Attention small-dot floor") —
    the ~60% masked-FLOP saving cannot pay for that. Same conclusion as
    the int8-QK rejection. ONEPROT_MHA_SEGSKIP=1 forces it on for
    re-measurement on future hardware where the MXU issue floor differs;
    numerics are flag-equivalent either way
    (tests/test_kernels.py::test_mha_attention_segskip_flag_equivalence).
    """
    import os

    return (os.environ.get("ONEPROT_MHA_SEGSKIP", "0") == "1"
            and segmented)


def _segskip_block() -> int:
    """Stream-block width under seg_skip (skip granularity vs per-dot
    issue cost tradeoff; see _segskip for the measurements)."""
    import os

    try:
        return int(os.environ.get("ONEPROT_MHA_SEGSKIP_BLOCK", "128"))
    except ValueError:
        return 128


def _pairfuse(G: int, Lq: int) -> bool:
    """Block-diagonal head packing in the fwd kernel (see block_fused).

    Measured on v5e (hub geometry H=20 D=64): ~6% faster at L=512 (2.53 ->
    2.38 ms/layer segmented), neutral-to-slower at L=1024 and for the G=4
    small-head towers (2.19 -> 2.31 at tower L=512) — so it engages only
    where it wins. ONEPROT_MHA_PAIRFUSE=0/1 forces it off/on everywhere.
    """
    import os

    env = os.environ.get("ONEPROT_MHA_PAIRFUSE", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return G == 2 and Lq <= 512


def _fwd(q, k, v, bias_b, cos_p, sin_p, lens, seg, scale, rotary, skip, d,
         interpret=False):
    B, Lq, hd = q.shape
    Lk = k.shape[1]
    G = _BLOCK_LANES // d
    HG = hd // _BLOCK_LANES      # head groups
    C = _chunk_count(HG, Lq, skip)
    HGC = HG // C                # chunked head-group grid dimension
    lanes = C * _BLOCK_LANES
    lse_lanes = C * G * _HEAD_LSE
    # VMEM budget: each head keeps an f32 [block_q, block_k] score block
    # alive, so G=4 halves the block size to stay inside scoped vmem
    dflt_q = DEFAULT_BLOCK_Q // (G // 2)
    dflt_k = DEFAULT_BLOCK_K // (G // 2)
    segq, segk, segmented = _seg_views(seg, B, Lq)
    seg_skip = _segskip(segmented, Lq)
    block_q = _block(Lq, SKIP_BLOCK if skip else dflt_q)
    block_k = _block(Lk, _segskip_block() if seg_skip else
                     (SKIP_BLOCK if skip else dflt_k))

    q_map = lambda b, h, i, lref: (b, i, h)
    kv_map = lambda b, h, i, lref: (b, 0, h)
    bias_map = lambda b, h, i, lref: (b, 0, 0)
    cs_map = lambda b, h, i, lref: (0, 0)
    segq_map = lambda b, h, i, lref: (b, i, 0)
    segk_map = lambda b, h, i, lref: (b, 0, 0)
    segq_spec = pl.BlockSpec(
        (1, block_q if segmented else 1, 1), segq_map,
        memory_space=pltpu.VMEM)
    segk_spec = pl.BlockSpec(
        (1, 1, Lk if segmented else 1), segk_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, HGC, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, lanes), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, lanes), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, lanes), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), bias_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lq if rotary else 1, _BLOCK_LANES), cs_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lq if rotary else 1, _BLOCK_LANES), cs_map,
                         memory_space=pltpu.VMEM),
            segq_spec,
            segk_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, lanes), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, lse_lanes),
                         lambda b, h, i, lref: (b * HGC + h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, lk=Lk, scale=scale,
                          rotary=rotary, skip=skip, d=d, chunks=C,
                          segmented=segmented, fused=_pairfuse(G, Lq),
                          seg_skip=seg_skip),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, hd), q.dtype),
            jax.ShapeDtypeStruct((B * HGC, Lq, lse_lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(lens, q, k, v, bias_b, cos_p, sin_p, segq, segk)
    return out, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(lens_ref, q_ref, k_ref, v_ref, bias_ref, cos_ref, sin_ref,
                   do_ref, lse_ref, delta_ref, segq_ref, segk_ref, dq_ref,
                   *, block_k, lk, scale, rotary, skip, d, chunks, segmented,
                   seg_skip):
    in_dtype = q_ref.dtype
    G = _BLOCK_LANES // d
    block_q = q_ref.shape[1]
    i_q = pl.program_id(2)
    len_b = lens_ref[pl.program_id(0)]
    lse8 = G * _HEAD_LSE

    def compute():
        dq_parts = []
        for c in range(chunks):
            lo = c * _BLOCK_LANES
            q2 = q_ref[0][:, lo:lo + _BLOCK_LANES]
            if rotary:
                slq = pl.ds(i_q * block_q, block_q)
                cos_q, sin_q = cos_ref[slq, :], sin_ref[slq, :]
                q2r = _apply_rot(q2, cos_q, sin_q, d)
            else:
                cos_q = sin_q = None
                q2r = q2
            qf = q2r * jnp.asarray(scale * _LOG2E, in_dtype)
            do2 = do_ref[0][:, lo:lo + _BLOCK_LANES]
            lse2 = lse_ref[0][:, c * lse8:(c + 1) * lse8]   # [bq, 8G]
            delta2 = delta_ref[0][:, c * lse8:(c + 1) * lse8]
            num_k = lk // block_k
            if segmented:
                seg_q = segq_ref[0]                      # [bq, 1]

            def block(idx, carry):
                dqs = list(carry)
                sl = pl.ds(idx * block_k, block_k)
                k2 = k_ref[0, sl, lo:lo + _BLOCK_LANES]
                if rotary:
                    k2 = _apply_rot(k2, cos_ref[sl, :], sin_ref[sl, :], d)
                v2 = v_ref[0, sl, lo:lo + _BLOCK_LANES]
                bias_blk = bias_ref[0, :, sl]
                if segmented:
                    seg_k = segk_ref[0, :, sl]           # [1, bk]
                    bias_blk = bias_blk + jnp.where(
                        seg_q == seg_k, 0.0, _NEG_INF)
                for g in range(G):
                    qh, doh = _head(qf, g, d), _head(do2, g, d)
                    kh, vh = _head(k2, g, d), _head(v2, g, d)
                    lseh = lse2[:, g * _HEAD_LSE:g * _HEAD_LSE + 1]
                    dlh = delta2[:, g * _HEAD_LSE:g * _HEAD_LSE + 1]
                    s = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    p = jnp.exp2(s + bias_blk - lseh)
                    dp = jax.lax.dot_general(
                        doh, vh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ds = (p * (dp - dlh)).astype(in_dtype)
                    dqs[g] = dqs[g] + jax.lax.dot_general(
                        ds, kh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return tuple(dqs)

            carry = tuple(jnp.zeros((block_q, d), jnp.float32)
                          for _ in range(G))
            if skip or seg_skip:
                n_k = _num_k(len_b, block_k, lk) if skip else None
                if seg_skip:
                    q_lo, q_hi = jnp.min(seg_q), jnp.max(seg_q)
                carry = block(0, carry)
                for idx in range(1, num_k):
                    pred = None
                    if skip:
                        pred = idx < n_k
                    if seg_skip:
                        skb = segk_ref[0, :,
                                       idx * block_k:(idx + 1) * block_k]
                        hit = jnp.logical_and(q_lo <= jnp.max(skb),
                                              jnp.min(skb) <= q_hi)
                        pred = hit if pred is None else jnp.logical_and(
                            pred, hit)
                    carry = jax.lax.cond(
                        pred, lambda cr, idx=idx: block(idx, cr),
                        lambda cr: cr, carry)
            else:
                for idx in range(num_k):
                    carry = block(idx, carry)

            dq2 = jnp.concatenate(list(carry), axis=-1) * scale
            if rotary:
                dq2 = _apply_rot_t(dq2, cos_q.astype(jnp.float32),
                                   sin_q.astype(jnp.float32), d)
            dq_parts.append(dq2)
        dq_ref[0] = jnp.concatenate(dq_parts, axis=-1).astype(dq_ref.dtype)

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
                    sin_ref, do_ref, lse_ref, delta_ref, segq_ref, segk_ref,
                    dk_ref, dv_ref,
                    *, block_q, lq, scale, rotary, skip, d, chunks,
                    segmented, seg_skip):
    in_dtype = k_ref.dtype
    G = _BLOCK_LANES // d
    j = pl.program_id(2)
    block_k = k_ref.shape[1]
    len_b = lens_ref[pl.program_id(0)]
    lse8 = G * _HEAD_LSE

    def compute():
        dk_parts, dv_parts = [], []
        for c in range(chunks):
            lo = c * _BLOCK_LANES
            k2 = k_ref[0][:, lo:lo + _BLOCK_LANES]       # [bk, 128]
            if rotary:
                slk = pl.ds(j * block_k, block_k)
                cos_k, sin_k = cos_ref[slk, :], sin_ref[slk, :]
                k2r = _apply_rot(k2, cos_k, sin_k, d)
            else:
                cos_k = sin_k = None
                k2r = k2
            v2 = v_ref[0][:, lo:lo + _BLOCK_LANES]
            bias_blk = bias_ref[0]                       # [1, bk]
            num_q = lq // block_q
            if segmented:
                # this program's keys: [1, bk] slice of the k-aligned view
                slk2 = pl.ds(j * block_k, block_k)
                seg_k = segk_ref[0, :, slk2]

            def block(idx, carry):
                dks = list(carry[:G])
                dvs = list(carry[G:])
                sl = pl.ds(idx * block_q, block_q)
                q2 = q_ref[0, sl, lo:lo + _BLOCK_LANES]
                if rotary:
                    q2 = _apply_rot(q2, cos_ref[sl, :], sin_ref[sl, :], d)
                qf = q2 * jnp.asarray(scale * _LOG2E, in_dtype)
                do2 = do_ref[0, sl, lo:lo + _BLOCK_LANES]
                lse2 = lse_ref[0, sl, c * lse8:(c + 1) * lse8]
                delta2 = delta_ref[0, sl, c * lse8:(c + 1) * lse8]
                bias_q = bias_blk
                if segmented:
                    seg_q = segq_ref[0, sl, :]           # [bq, 1]
                    bias_q = bias_q + jnp.where(
                        seg_q == seg_k, 0.0, _NEG_INF)
                for g in range(G):
                    qh, doh = _head(qf, g, d), _head(do2, g, d)
                    kh, vh = _head(k2r, g, d), _head(v2, g, d)
                    lseh = lse2[:, g * _HEAD_LSE:g * _HEAD_LSE + 1]
                    dlh = delta2[:, g * _HEAD_LSE:g * _HEAD_LSE + 1]
                    s = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    p = jnp.exp2(s + bias_q - lseh)      # [bq, bk]
                    p_lo = p.astype(in_dtype)
                    dvs[g] = dvs[g] + jax.lax.dot_general(
                        p_lo, doh, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dp = jax.lax.dot_general(
                        doh, vh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ds = (p * (dp - dlh)).astype(in_dtype)
                    dks[g] = dks[g] + jax.lax.dot_general(
                        ds, qh, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return tuple(dks) + tuple(dvs)

            carry = tuple(jnp.zeros((block_k, d), jnp.float32)
                          for _ in range(2 * G))
            if skip or seg_skip:
                # only q blocks within the true length contribute (pad q
                # rows have do == 0 exactly); under seg_skip, q blocks with
                # no segment in common with this program's keys contribute
                # zero probability mass
                n_q = _num_k(len_b, block_q, lq) if skip else None
                if seg_skip:
                    k_lo, k_hi = jnp.min(seg_k), jnp.max(seg_k)
                carry = block(0, carry)
                for idx in range(1, num_q):
                    pred = None
                    if skip:
                        pred = idx < n_q
                    if seg_skip:
                        sqb = segq_ref[0,
                                       idx * block_q:(idx + 1) * block_q, :]
                        hit = jnp.logical_and(jnp.min(sqb) <= k_hi,
                                              k_lo <= jnp.max(sqb))
                        pred = hit if pred is None else jnp.logical_and(
                            pred, hit)
                    carry = jax.lax.cond(
                        pred, lambda cr, idx=idx: block(idx, cr),
                        lambda cr: cr, carry)
            else:
                for idx in range(num_q):
                    carry = block(idx, carry)

            # qf carries scale*log2e; dk needs only scale -> multiply by ln2
            dk2 = jnp.concatenate(list(carry[:G]), axis=-1) * _LN2
            if rotary:
                dk2 = _apply_rot_t(dk2, cos_k.astype(jnp.float32),
                                   sin_k.astype(jnp.float32), d)
            dk_parts.append(dk2)
            dv_parts.append(jnp.concatenate(list(carry[G:]), axis=-1))
        dk_ref[0] = jnp.concatenate(dk_parts, axis=-1).astype(dk_ref.dtype)
        dv_ref[0] = jnp.concatenate(dv_parts, axis=-1).astype(dv_ref.dtype)

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


def _bwd(scale, rotary, skip, d, interpret, res, g):
    q, k, v, bias_b, cos_p, sin_p, lens, seg, out, lse = res
    B, Lq, hd = q.shape
    Lk = k.shape[1]
    G = _BLOCK_LANES // d
    HG = hd // _BLOCK_LANES
    C = _chunk_count(HG, Lq, skip)   # must match _fwd (lse layout)
    HGC = HG // C
    lanes = C * _BLOCK_LANES
    lse_lanes = C * G * _HEAD_LSE
    bwd_dflt = 512 // (G // 2)
    segq, segk, segmented = _seg_views(seg, B, Lq)
    seg_skip = _segskip(segmented, Lq)
    block_q = _block(Lq, SKIP_BLOCK if skip else bwd_dflt)
    block_k = _block(Lk, SKIP_BLOCK if skip else bwd_dflt)
    # under seg_skip only the STREAMED loops shrink to 128-wide blocks (dq
    # streams k; dkv streams q) so disjoint-segment blocks exist to skip;
    # the grid blocks keep their full width (per-program work unchanged)
    stream_k = _block(Lk, _segskip_block()) if seg_skip else block_k
    stream_q = _block(Lq, _segskip_block()) if seg_skip else block_q

    # delta[b, l, head] = sum_d(dout * out) per head, laid out like lse:
    # [B*HGC, L, C*8G] with lanes [(c*G+g)*8 : +8] = head g of chunk c
    go = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        B, Lq, HGC, C * G, d).sum(-1)                    # [B, Lq, HGC, C*G]
    delta = jnp.repeat(go, _HEAD_LSE, axis=-1)           # [B, Lq, HGC, C*8G]
    delta = delta.transpose(0, 2, 1, 3).reshape(B * HGC, Lq, lse_lanes)

    q_map = lambda b, h, i, lref: (b, i, h)
    kv_full = lambda b, h, i, lref: (b, 0, h)
    bias_full = lambda b, h, i, lref: (b, 0, 0)
    cs_map = lambda b, h, i, lref: (0, 0)
    lse_q = lambda b, h, i, lref: (b * HGC + h, i, 0)
    lse_full = lambda b, h, i, lref: (b * HGC + h, 0, 0)

    segq_q_spec = pl.BlockSpec(
        (1, block_q if segmented else 1, 1),
        lambda b, h, i, lref: (b, i, 0), memory_space=pltpu.VMEM)
    segq_full_spec = pl.BlockSpec(
        (1, Lq if segmented else 1, 1),
        lambda b, h, i, lref: (b, 0, 0), memory_space=pltpu.VMEM)
    segk_spec = pl.BlockSpec(
        (1, 1, Lk if segmented else 1),
        lambda b, h, i, lref: (b, 0, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=stream_k, lk=Lk,
                          scale=scale, rotary=rotary, skip=skip, d=d,
                          chunks=C, segmented=segmented,
                          seg_skip=seg_skip),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, HGC, Lq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, lanes), q_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lk, lanes), kv_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lk, lanes), kv_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk), bias_full, memory_space=pltpu.VMEM),
                pl.BlockSpec((Lq if rotary else 1, _BLOCK_LANES), cs_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lq if rotary else 1, _BLOCK_LANES), cs_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, lanes), q_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, lse_lanes), lse_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, lse_lanes), lse_q,
                             memory_space=pltpu.VMEM),
                segq_q_spec,
                segk_spec,
            ],
            out_specs=pl.BlockSpec((1, block_q, lanes), q_map,
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(lens, q, k, v, bias_b, cos_p, sin_p, g, lse, delta, segq, segk)

    k_map = lambda b, h, j, lref: (b, j, h)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=stream_q, lq=Lq,
                          scale=scale, rotary=rotary, skip=skip, d=d,
                          chunks=C, segmented=segmented,
                          seg_skip=seg_skip),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, HGC, Lk // block_k),
            in_specs=[
                pl.BlockSpec((1, Lq, lanes), kv_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, lanes), k_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, lanes), k_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k),
                             lambda b, h, j, lref: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lq if rotary else 1, _BLOCK_LANES), cs_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lq if rotary else 1, _BLOCK_LANES), cs_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lq, lanes), kv_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lq, lse_lanes), lse_full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lq, lse_lanes), lse_full,
                             memory_space=pltpu.VMEM),
                segq_full_spec,
                segk_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, lanes), k_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, lanes), k_map,
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
    )(lens, q, k, v, bias_b, cos_p, sin_p, g, lse, delta, segq, segk)

    return dq, dk, dv, None, None, None, None, None


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _mha_core(q, k, v, bias_b, cos_p, sin_p, lens, seg, scale, rotary, skip,
              d, interpret):
    out, _ = _fwd(q, k, v, bias_b, cos_p, sin_p, lens, seg, scale, rotary,
                  skip, d, interpret)
    return out


def _mha_core_fwd(q, k, v, bias_b, cos_p, sin_p, lens, seg, scale, rotary,
                  skip, d, interpret):
    out, lse = _fwd(q, k, v, bias_b, cos_p, sin_p, lens, seg, scale, rotary,
                    skip, d, interpret)
    return out, (q, k, v, bias_b, cos_p, sin_p, lens, seg, out, lse)


def _mha_core_bwd(scale, rotary, skip, d, interpret, res, g):
    return _bwd(scale, rotary, skip, d, interpret, res, g)


_mha_core.defvjp(_mha_core_fwd, _mha_core_bwd)


def select_d_pad(D: int, H: int) -> int:
    """Smallest supported padded head width for true head dim D: less
    padding = proportionally less attention matmul/memory work."""
    for d in (32, 64):
        if D <= d and H % (_BLOCK_LANES // d) == 0:
            return d
    return D_PAD


def mha_attention(
    q: jax.Array,            # [B, L, H*D]
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    bias: Optional[jax.Array] = None,       # [B, 1, 1, L] additive
    rope_cos: Optional[jax.Array] = None,   # [L, D]
    rope_sin: Optional[jax.Array] = None,
    lens: Optional[jax.Array] = None,       # [B] true lengths (end padding)
    segment_ids: Optional[jax.Array] = None,  # [B, L] int; packed sequences
    interpret: bool = False,
) -> jax.Array:
    """Flash MHA on [B, L, H*D] activations with optional fused rotary.

    Head dims pad half-wise to the smallest supported lane width (32 or 64;
    zero lanes change nothing, the true 1/sqrt(D) softmax scale is used).
    With `lens`, padded query/key blocks are skipped (requires end-padding
    consistent with `bias`). With `segment_ids` (sequence packing: multiple
    proteins per row), attention is block-diagonal per segment — the mask is
    built IN-KERNEL from the ids, so no [B, L, L] bias ever materializes.
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
    d_pad = select_d_pad(D, H)

    def pad_halfwise(x):
        if D == d_pad:
            return x
        xh = x.reshape(B, L, H, 2, D // 2)
        xh = jnp.pad(xh, ((0, 0),) * 3 + ((0, 0), (0, (d_pad - D) // 2)))
        return xh.reshape(B, L, H * d_pad)

    qp, kp, vp = pad_halfwise(q), pad_halfwise(k), pad_halfwise(v)
    G = _BLOCK_LANES // d_pad

    if rotary:
        # per-head table [L, D] = [cos(f), cos(f)]; pad each half (matching
        # pad_halfwise) then tile for the head group
        ch = rope_cos.reshape(L, 2, D // 2)
        sh = rope_sin.reshape(L, 2, D // 2)
        pad = ((0, 0), (0, 0), (0, (d_pad - D) // 2))
        cosd = jnp.pad(ch, pad).reshape(L, d_pad)
        sind = jnp.pad(sh, pad).reshape(L, d_pad)
        cos_p = jnp.tile(cosd, (1, G)).astype(q.dtype)
        sin_p = jnp.tile(sind, (1, G)).astype(q.dtype)
    else:
        # 1-row dummies (same trick as _seg_views): the kernels never read
        # the tables when rotary=False, but full [L, 128] zero tables
        # would still be copied HBM->VMEM and hold ~2*L*128 elements of
        # VMEM block space per program in all three kernels (~256 KB at
        # bf16 L=512 — real headroom on the BERT/text path)
        cos_p = jnp.zeros((1, _BLOCK_LANES), q.dtype)
        sin_p = jnp.zeros((1, _BLOCK_LANES), q.dtype)

    if bias is None:
        bias_b = jnp.zeros((B, 1, L), jnp.float32)
    else:
        bias_b = bias.reshape(B, 1, L).astype(jnp.float32) * _LOG2E
    if lens is None:
        lens_arr = jnp.full((B,), L, jnp.int32)
    else:
        lens_arr = lens.astype(jnp.int32)

    out = _mha_core(qp, kp, vp, bias_b, cos_p, sin_p, lens_arr, segment_ids,
                    scale, rotary, skip, d_pad, interpret)
    if D == d_pad:
        return out
    oh = out.reshape(B, L, H, 2, d_pad // 2)
    return oh[..., :D // 2].reshape(B, L, hd)
