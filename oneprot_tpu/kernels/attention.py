"""Attention dispatch: Pallas flash attention on TPU, jnp reference elsewhere.

This is the single dominant op of the whole framework (ESM2/BERT forwards are
the device hot loop, SURVEY §3.5), so it gets a fused, IO-aware kernel
(FlashAttention-2 style tiling, see oneprot_tpu/kernels/flash_attention.py).

The jnp reference path is also the correctness oracle for kernel tests.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _tpu_available() -> bool:
    """Is the platform the computation TARGETS a TPU?

    When a mesh is active, its devices' platform is authoritative: under a
    TPU-attached process (jax_platforms="axon,cpu") a `trainer=cpu` run
    places the step on CPU devices while jax.default_backend() still says
    tpu — dispatching a compiled Mosaic kernel there fails XLA's CPU
    lowering ("Only interpret mode is supported on CPU backend").
    """
    if _ACTIVE_PLATFORM is not None:
        return _ACTIVE_PLATFORM in ("tpu", "axon")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# Active mesh for GSPMD interop: pallas_call is opaque to the GSPMD
# partitioner, so when the train step is jitted over a multi-device mesh the
# kernel is wrapped in a shard_map over the data axis (per-shard pallas,
# batch-sharded activations stay put). Set by OneProtModule.init.
_ACTIVE_MESH = None
# Platform of the active mesh's devices (kept even for 1-device meshes,
# where _ACTIVE_MESH is cleared): drives the pallas-vs-XLA/interpret choice.
_ACTIVE_PLATFORM = None


def set_active_mesh(mesh) -> None:
    global _ACTIVE_MESH, _ACTIVE_PLATFORM
    _ACTIVE_PLATFORM = (
        mesh.devices.flat[0].platform if mesh is not None else None)
    _ACTIVE_MESH = mesh if mesh is not None and mesh.size > 1 else None


def sharded_kernel_dispatch(fn, args, arg_ranks, out_ranks):
    """Run `fn(*args)` per-shard under the active mesh, or directly when no
    multi-device mesh is active. pallas_call is opaque to the GSPMD
    partitioner, so every kernel entry point needs this wrap; one helper
    instead of a per-kernel copy of the mesh check / spec construction /
    dp-divisibility bail-out.

    arg_ranks[i] is the rank of args[i], whose dim 0 is batch-sharded over
    the data axis (None-valued args pass replicated). out_ranks is the
    rank of the single output, or a tuple of ranks for a tuple output.
    Returns None when the leading batch dim doesn't divide the data-axis
    size — the caller falls back to its XLA path."""
    if _ACTIVE_MESH is None:
        return fn(*args)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from oneprot_tpu.core.mesh import DATA_AXIS

    def spec(rank):
        return P(*((DATA_AXIS,) + (None,) * (rank - 1)))

    dp = _ACTIVE_MESH.shape[DATA_AXIS]
    batch = next(a.shape[0] for a in args if a is not None)
    if batch % dp != 0:
        return None
    in_specs = tuple(None if a is None else spec(r)
                     for a, r in zip(args, arg_ranks))
    out_specs = (tuple(spec(r) for r in out_ranks)
                 if isinstance(out_ranks, tuple) else spec(out_ranks))
    return shard_map(fn, mesh=_ACTIVE_MESH, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)(*args)


def _smallhead_maxl() -> int:
    """Parsed ONEPROT_ATTN_XLA_SMALLHEAD_MAXL, hardened like the repo's
    other kernel env knobs (a malformed value must not raise inside jit
    tracing of every attention call — advisor round-2 class of bug)."""
    try:
        return int(os.environ.get("ONEPROT_ATTN_XLA_SMALLHEAD_MAXL", "0"))
    except ValueError:
        return 0


def packed_segment_bias(segment_ids: jax.Array, bias=None):
    """[B, L] segment ids -> additive [B, 1, L, L] block-diagonal mask for
    PACKED rows, combined with an optional existing bias. One home for the
    XLA-fallback construction (the fused kernel builds the mask in-kernel
    from the ids and never materializes it)."""
    segmask = jnp.where(
        segment_ids[:, :, None] == segment_ids[:, None, :],
        0.0, -1e9)[:, None]                      # [B, 1, L, L]
    return segmask if bias is None else bias + segmask


def reference_attention(
    q: jax.Array,  # [B, H, Lq, D]
    k: jax.Array,  # [B, H, Lk, D]
    v: jax.Array,  # [B, H, Lk, D]
    bias: Optional[jax.Array] = None,  # broadcastable to [B, H, Lq, Lk]
) -> jax.Array:
    """Plain XLA attention; fp32 softmax for stability."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Multi-head attention with optional additive bias (padding mask).

    q/k/v: [B, H, L, D]. bias: [B, 1, 1, Lk] or [B, H, Lq, Lk], additive
    (0 for keep, large negative for masked).
    """
    if use_pallas is None:
        env = os.environ.get("ONEPROT_USE_PALLAS", "auto")
        if env == "0":
            use_pallas = False
        elif env == "1":
            use_pallas = True
        else:
            use_pallas = _tpu_available()
    # Small-head towers at short L: the d<64 padded kernel runs its dots at
    # <=25% MXU utilization and measured SLOWER than XLA's materialized
    # attention for fwd+bwd (scripts/microbench_attn.py: 3.48 vs 2.51
    # ms/layer at L=256, tower geometry). Opt-in dispatch to XLA below the
    # length threshold; memory cost is the [B,H,L,L] residuals, affordable
    # at short L.
    _maxl = _smallhead_maxl()
    if _maxl and q.shape[-1] < 64 and q.shape[2] <= _maxl:
        use_pallas = False
    if use_pallas:
        from oneprot_tpu.kernels.flash_attention import flash_attention, supports

        # Small head dims (ESM2-35M: 24, -8M: 16) pad up to the kernel's
        # minimum lane-friendly width. Zero-padding k/v leaves logits and
        # outputs unchanged; q is pre-scaled by sqrt(D_pad/D) so the kernel's
        # 1/sqrt(D_pad) softmax scale nets to 1/sqrt(D). This keeps the
        # O(L^2) probability matrix out of HBM for every tower, not just the
        # 650M hub (the fp32 [B,H,L,L] residuals of the XLA fallback are
        # what OOM'd large batches).
        d = q.shape[-1]
        d_pad = max(64, -(-d // 8) * 8)
        if d_pad != d and q.shape[2] >= 128 and k.shape[2] >= 128:
            pad = [(0, 0)] * 3 + [(0, d_pad - d)]
            q_p = jnp.pad(q * (d_pad / d) ** 0.5, pad)
            k_p = jnp.pad(k, pad)
            v_p = jnp.pad(v, pad)
            if supports(q_p, k_p, v_p, bias):
                out = _maybe_sharded_flash(q_p, k_p, v_p, bias)
                if out is not None:
                    return out[..., :d]
        if supports(q, k, v, bias):
            out = _maybe_sharded_flash(q, k, v, bias)
            if out is not None:
                return out
    return reference_attention(q, k, v, bias)


def fused_mha(q, k, v, num_heads, bias=None, rope_cos=None, rope_sin=None,
              lens=None, segment_ids=None):
    """Fused [B, L, H*D] flash MHA with in-kernel rotary (the transformer
    hot path — avoids every reshape/transpose copy around the kernel).

    Returns None when the fused path doesn't apply (caller falls back to
    the reference path). See oneprot_tpu/kernels/flash_mha.py.
    """
    env = os.environ.get("ONEPROT_USE_PALLAS", "auto")
    if env == "0":
        return None
    use_pallas = True if env == "1" else _tpu_available()
    if not use_pallas:
        return None

    from oneprot_tpu.kernels import flash_mha

    B, L, hd = q.shape
    D = hd // num_heads
    if D > flash_mha.D_PAD or hd % num_heads:
        return None
    # see dot_product_attention: small-head short-L dispatch to XLA
    _maxl = _smallhead_maxl()
    if _maxl and D < 64 and L <= _maxl:
        return None
    d_pad = flash_mha.select_d_pad(D, num_heads)
    group = (2 * flash_mha.D_PAD) // d_pad
    if not flash_mha.supports(
            B, num_heads, L, L, None if bias is None else bias.shape,
            group=group):
        return None
    if D != d_pad and D % 2 != 0:
        # pad_halfwise reshapes to (..., 2, D//2) whenever padding is
        # needed — rotary or not; an odd D would crash the reshape at
        # trace time instead of falling back as the contract promises
        return None
    if (rope_cos is not None) and (D % 4 != 0):
        return None  # half-wise padding needs an even half

    fn = lambda q, k, v, bias, lens, seg: flash_mha.mha_attention(
        q, k, v, num_heads, bias=bias, rope_cos=rope_cos,
        rope_sin=rope_sin, lens=lens, segment_ids=seg)

    return sharded_kernel_dispatch(
        fn, (q, k, v, bias, lens, segment_ids), (3, 3, 3, 4, 1, 2), 3)


def fused_tied_row(q, k, v, num_heads, col_bias=None, scale=None):
    """Fused MSA tied-row attention (frozen tower, fwd-only). Consumes the
    QKV projections' natural [B, R, L, H*D] layout. Returns None when the
    fused path doesn't apply (caller falls back to the einsum reference).

    OPT-IN (ONEPROT_TIED_ROW=1): measured SLOWER than the XLA einsum at
    MSA-1b shapes (9.4 vs 7.2 ms, B4 R32 L1024 H12 on v5e) — the tied
    contraction over (rows x head_dim) = 2048 is already MXU-optimal for
    XLA, and the [B,H,L,L] logits HBM round-trip it avoids costs less than
    the kernel's per-row small-dot loop + scratch traffic. Kept for
    VMEM-constrained regimes (very large B*H*L^2 logits).
    """
    if os.environ.get("ONEPROT_TIED_ROW", "0") != "1":
        return None
    env = os.environ.get("ONEPROT_USE_PALLAS", "auto")
    if env == "0":
        return None
    use_pallas = True if env == "1" else _tpu_available()
    if not use_pallas:
        return None

    from oneprot_tpu.kernels import tied_row_attention as tra

    B, R, L, hd = q.shape
    if hd % num_heads:
        return None
    if not tra.supports(B, R, L, num_heads, hd // num_heads):
        return None

    # non-TPU backends (ONEPROT_USE_PALLAS=1 on a CPU host) need the
    # interpreter — Mosaic can't compile for CPU (advisor round-1 finding)
    fn = lambda q, k, v, bias: tra.tied_row_attention(
        q, k, v, num_heads, col_bias=bias, scale=scale,
        interpret=not _tpu_available())

    return sharded_kernel_dispatch(fn, (q, k, v, col_bias),
                                   (4, 4, 4, 4), 4)


def _maybe_sharded_flash(q, k, v, bias):
    """Run the Pallas kernel; under a multi-device mesh, wrap in a shard_map
    over the data axis (pallas_call is opaque to the GSPMD partitioner)."""
    from oneprot_tpu.kernels.flash_attention import flash_attention

    return sharded_kernel_dispatch(flash_attention, (q, k, v, bias),
                                   (4, 4, 4, 4), 4)
