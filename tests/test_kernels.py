"""Pallas kernel tests (interpret mode on CPU) vs jnp oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from oneprot_tpu.kernels.attention import reference_attention
from oneprot_tpu.kernels.flash_attention import flash_attention, supports
from oneprot_tpu.kernels.segment_ops import (
    gather_neighbors,
    masked_neighbor_mean,
    masked_neighbor_sum,
    segment_mean,
    segment_softmax,
    segment_sum,
)


@pytest.fixture
def qkv():
    rng = np.random.RandomState(0)
    B, H, L, D = 2, 2, 256, 64
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    bias = np.zeros((B, 1, 1, L), np.float32)
    bias[:, :, :, 200:] = -1e9  # key padding
    return q, k, v, jnp.asarray(bias)


def test_supports_predicate(qkv):
    q, k, v, bias = qkv
    assert supports(q, k, v, bias)
    assert not supports(q[:, :, :64], k[:, :, :64], v[:, :, :64], None)  # short
    small = jnp.zeros((2, 2, 256, 24))  # tiny head dim -> XLA path
    assert not supports(small, small, small, None)


def test_flash_attention_fwd_matches_reference(qkv):
    q, k, v, bias = qkv
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, bias)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_attention_grads_match_reference(qkv):
    q, k, v, bias = qkv

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v, bias)))

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(reference_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{name} mismatch")


def test_flash_attention_fully_masked_rows_safe():
    """All-pad batch entry: no NaNs (empty softmax guarded by l_safe)."""
    B, H, L, D = 1, 1, 128, 64
    q = jnp.ones((B, H, L, D))
    bias = jnp.full((B, 1, 1, L), -1e9)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, q, q, bias)
    assert np.isfinite(np.asarray(out)).all()


def test_segment_ops_match_numpy():
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(10, 4), jnp.float32)
    seg = jnp.asarray([0, 0, 1, 1, 1, 2, 2, 3, 3, 3])
    s = np.asarray(segment_sum(data, seg, 4))
    m = np.asarray(segment_mean(data, seg, 4))
    for i in range(4):
        rows = np.asarray(data)[np.asarray(seg) == i]
        np.testing.assert_allclose(s[i], rows.sum(0), rtol=1e-5)
        np.testing.assert_allclose(m[i], rows.mean(0), rtol=1e-5)
    probs = np.asarray(segment_softmax(jnp.asarray(rng.randn(10)), seg, 4))
    for i in range(4):
        np.testing.assert_allclose(probs[np.asarray(seg) == i].sum(), 1.0,
                                   rtol=1e-5)


def test_gather_and_masked_reduce():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 5, 3), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 5, (2, 5, 4)), jnp.int32)
    mask = jnp.asarray(rng.rand(2, 5, 4) > 0.5, jnp.float32)
    g = np.asarray(gather_neighbors(feats, idx))
    for b in range(2):
        for n in range(5):
            for kk in range(4):
                np.testing.assert_allclose(
                    g[b, n, kk], np.asarray(feats)[b, idx[b, n, kk]])
    msgs = jnp.asarray(rng.randn(2, 5, 4, 3), jnp.float32)
    s = np.asarray(masked_neighbor_sum(msgs, mask))
    want = (np.asarray(msgs) * np.asarray(mask)[..., None]).sum(2)
    np.testing.assert_allclose(s, want, rtol=1e-5)
    mean = np.asarray(masked_neighbor_mean(msgs, mask))
    denom = np.maximum(np.asarray(mask).sum(-1, keepdims=True), 1e-9)
    np.testing.assert_allclose(mean, want / denom, rtol=1e-4)


# ---------------------------------------------------------------------------
# Fused [B, L, H*D] MHA kernel (flash_mha) vs reference path
# ---------------------------------------------------------------------------


def _mha_reference(q2d, k2d, v2d, nh, bias, cos, sin):
    """The pre-fusion ESM2 attention path (transpose + rotary + softmax)."""
    from oneprot_tpu.models.esm2 import apply_rotary

    B, L, hd = q2d.shape
    d = hd // nh
    q = q2d.reshape(B, L, nh, d).transpose(0, 2, 1, 3)
    k = k2d.reshape(B, L, nh, d).transpose(0, 2, 1, 3)
    v = v2d.reshape(B, L, nh, d).transpose(0, 2, 1, 3)
    if cos is not None:
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
    ctx = reference_attention(q, k, v, bias)
    return ctx.transpose(0, 2, 1, 3).reshape(B, L, hd)


@pytest.mark.parametrize("nh,d,rotary", [
    (4, 64, True),    # 650M-like head shape
    (4, 64, False),   # no-rope (BERT-style)
    (4, 24, True),    # 35M tower: half-wise padding path
    (2, 16, True),    # 8M: smallest head dim
])
def test_mha_attention_fwd_matches_reference(nh, d, rotary):
    from oneprot_tpu.kernels.flash_mha import mha_attention
    from oneprot_tpu.models.esm2 import rotary_cos_sin

    rng = np.random.RandomState(0)
    B, L = 2, 256
    hd = nh * d
    q = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    bias = np.zeros((B, 1, 1, L), np.float32)
    bias[:, :, :, 200:] = -1e9
    bias = jnp.asarray(bias)
    cos = sin = None
    if rotary:
        cos, sin = rotary_cos_sin(L, d, jnp.float32)

    out = mha_attention(q, k, v, nh, bias=bias, rope_cos=cos, rope_sin=sin,
                        interpret=True)
    ref = _mha_reference(q, k, v, nh, bias, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("nh,d,rotary", [(4, 64, True), (4, 24, True),
                                         (4, 64, False)])
def test_mha_attention_grads_match_reference(nh, d, rotary):
    from oneprot_tpu.kernels.flash_mha import mha_attention
    from oneprot_tpu.models.esm2 import rotary_cos_sin

    rng = np.random.RandomState(1)
    B, L = 2, 128
    hd = nh * d
    q = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    bias = np.zeros((B, 1, 1, L), np.float32)
    bias[:, :, :, 100:] = -1e9
    bias = jnp.asarray(bias)
    cos = sin = None
    if rotary:
        cos, sin = rotary_cos_sin(L, d, jnp.float32)

    def loss_fused(q, k, v):
        o = mha_attention(q, k, v, nh, bias=bias, rope_cos=cos,
                          rope_sin=sin, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_mha_reference(q, k, v, nh, bias, cos, sin)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{name} mismatch")


def test_mha_attention_multiblock_matches_single():
    """k-block loop (L > block) agrees with the reference at L=512 when
    blocks are forced small."""
    from oneprot_tpu.kernels import flash_mha
    from oneprot_tpu.models.esm2 import rotary_cos_sin

    rng = np.random.RandomState(2)
    B, L, nh, d = 1, 256, 2, 64
    hd = nh * d
    q = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    cos, sin = rotary_cos_sin(L, d, jnp.float32)
    old_q, old_k = flash_mha.DEFAULT_BLOCK_Q, flash_mha.DEFAULT_BLOCK_K
    try:
        flash_mha.DEFAULT_BLOCK_Q, flash_mha.DEFAULT_BLOCK_K = 128, 128
        out = flash_mha.mha_attention(q, k, v, nh, rope_cos=cos,
                                      rope_sin=sin, interpret=True)
    finally:
        flash_mha.DEFAULT_BLOCK_Q, flash_mha.DEFAULT_BLOCK_K = old_q, old_k
    ref = _mha_reference(q, k, v, nh, None, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("nh,d,rotary", [(4, 64, True), (4, 24, True),
                                         (4, 64, False)])
def test_mha_attention_with_lens_matches_reference(nh, d, rotary):
    """Length-skipping path: padded key/query blocks skipped, valid rows
    still match the reference exactly (fwd + grads)."""
    from oneprot_tpu.kernels.flash_mha import mha_attention
    from oneprot_tpu.models.esm2 import rotary_cos_sin

    rng = np.random.RandomState(3)
    B, L = 3, 512  # SKIP_BLOCK=256 -> 2 blocks; lens force skipping
    hd = nh * d
    q = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    lens_np = np.array([200, 512, 300], np.int32)
    mask = (np.arange(L)[None] < lens_np[:, None])
    bias = jnp.asarray(np.where(mask, 0.0, -1e9)[:, None, None, :],
                       jnp.float32)
    lens = jnp.asarray(lens_np)
    cos = sin = None
    if rotary:
        cos, sin = rotary_cos_sin(L, d, jnp.float32)

    out = mha_attention(q, k, v, nh, bias=bias, rope_cos=cos, rope_sin=sin,
                        lens=lens, interpret=True)
    ref = _mha_reference(q, k, v, nh, bias, cos, sin)
    valid = mask
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=1e-4, atol=1e-5)

    # grads: only valid positions receive upstream gradient (as in the
    # model, where pad positions are mask-isolated)
    gmask = jnp.asarray(mask[..., None].astype(np.float32))

    def loss_fused(q, k, v):
        o = mha_attention(q, k, v, nh, bias=bias, rope_cos=cos,
                          rope_sin=sin, lens=lens, interpret=True)
        return jnp.sum(jnp.sin(o) * gmask)

    def loss_ref(q, k, v):
        o = _mha_reference(q, k, v, nh, bias, cos, sin)
        return jnp.sum(jnp.sin(o) * gmask)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a[valid], b[valid], rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{name} mismatch (valid rows)")
        np.testing.assert_allclose(a[~valid], 0.0, atol=1e-6,
                                   err_msg=f"d{name} nonzero on pad rows")


class TestTiedRowAttention:
    """Fwd-only MSA tied-row flash kernel vs the einsum oracle
    (oneprot_tpu/models/msa_transformer.py TiedRowAttention math)."""

    def _oracle(self, q, k, v, nh, col_bias, scale):
        B, R, L, hd = q.shape
        d = hd // nh
        qh = q.reshape(B, R, L, nh, d)
        kh = k.reshape(B, R, L, nh, d)
        vh = v.reshape(B, R, L, nh, d)
        logits = jnp.einsum("brihd,brjhd->bhij", qh.astype(jnp.float32),
                            kh.astype(jnp.float32)) * scale
        logits = logits + col_bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhij,brjhd->brihd", probs, vh.astype(jnp.float32))
        return ctx.reshape(B, R, L, hd)

    @pytest.mark.parametrize("R,L", [(4, 256), (3, 384)])
    def test_matches_oracle(self, R, L):
        from oneprot_tpu.kernels.tied_row_attention import tied_row_attention

        B, nh, d = 2, 4, 64
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, R, L, nh * d), jnp.float32)
        k = jnp.asarray(rng.randn(B, R, L, nh * d), jnp.float32)
        v = jnp.asarray(rng.randn(B, R, L, nh * d), jnp.float32)
        # mask the tail columns like the MSA col bias does
        bias = np.zeros((B, 1, 1, L), np.float32)
        bias[0, ..., L - 17:] = -1e9
        bias = jnp.asarray(bias)
        scale = (d ** -0.5) * (R ** -0.5)

        out = tied_row_attention(q, k, v, nh, col_bias=bias, scale=scale,
                                 interpret=True)
        ref = self._oracle(q, k, v, nh, bias, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_rejects_unsupported(self):
        from oneprot_tpu.kernels.tied_row_attention import tied_row_attention

        q = jnp.zeros((1, 2, 256, 3 * 64))  # odd head count
        with pytest.raises(ValueError):
            tied_row_attention(q, q, q, 3)


def test_select_d_pad_head_groups():
    """Padded lane width selection: smallest {32, 64} fitting the head dim,
    subject to the group (128/d) dividing the head count."""
    from oneprot_tpu.kernels.flash_mha import select_d_pad

    assert select_d_pad(64, 20) == 64   # 650M hub
    assert select_d_pad(24, 20) == 32   # 35M tower: 20 % 4 == 0
    assert select_d_pad(16, 20) == 32   # 8M tower
    assert select_d_pad(32, 20) == 32   # 150M tower: exact
    assert select_d_pad(64, 12) == 64   # BERT-base
    assert select_d_pad(24, 2) == 64    # 2 heads can't form groups of 4


def test_tied_row_attention_backward_raises_clear_error(monkeypatch):
    """The fused tied-row kernel is forward-only (the MSA tower is always
    frozen); differentiating through it must fail with a clear message, not
    an obscure Pallas autodiff error (advisor round-1 finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest as _pytest

    from oneprot_tpu.kernels.tied_row_attention import (
        supports,
        tied_row_attention,
    )

    B, R, L, H, D = 1, 4, 256, 2, 64
    if not supports(B, R, L, H, D):
        _pytest.skip("shape unsupported by the tied-row kernel")
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, R, L, H * D).astype(np.float32))

    def f(q_):
        out = tied_row_attention(q_, q_, q_, H, interpret=True)
        return jnp.sum(out)

    with _pytest.raises(NotImplementedError, match="forward-only"):
        jax.grad(f)(q)


def test_mha_attention_chunked_groups_match_reference():
    """Head-group chunking (C>1: multiple 128-lane groups per program at
    short L) preserves numerics — 650M hub geometry H=20 D=64 at L=256
    selects C=5 (HG=10), covering fwd AND both backward kernels."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from oneprot_tpu.kernels.flash_mha import _chunk_count, mha_attention
    from oneprot_tpu.models.esm2 import rotary_cos_sin

    import os

    nh, d = 20, 64
    os.environ["ONEPROT_MHA_CHUNKS"] = "256:5"
    try:
        assert _chunk_count(nh * d // 128, 256, False) == 5
        rng = np.random.RandomState(2)
        B, L = 2, 256
        hd = nh * d
        q = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
        k = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
        v = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
        bias = np.zeros((B, 1, 1, L), np.float32)
        bias[:, :, :, 200:] = -1e9
        bias = jnp.asarray(bias)
        cos, sin = rotary_cos_sin(L, d, jnp.float32)

        out = mha_attention(q, k, v, nh, bias=bias, rope_cos=cos, rope_sin=sin,
                            interpret=True)
        ref = _mha_reference(q, k, v, nh, bias, cos, sin)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

        def loss_fused(q, k, v):
            o = mha_attention(q, k, v, nh, bias=bias, rope_cos=cos,
                              rope_sin=sin, interpret=True)
            return jnp.sum(jnp.sin(o))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(_mha_reference(q, k, v, nh, bias, cos, sin)))

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=f"d{name} mismatch")

    finally:
        del os.environ["ONEPROT_MHA_CHUNKS"]


def test_mha_attention_segment_ids_match_unpacked():
    """Sequence packing: a row holding two segments with in-kernel
    segment masking must equal running each segment as its own row —
    forward AND gradients (both bwd kernels see the mask)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from oneprot_tpu.kernels.flash_mha import mha_attention
    from oneprot_tpu.models.esm2 import rotary_cos_sin

    nh, d = 4, 64
    L, half = 256, 128
    hd = nh * d
    rng = np.random.RandomState(4)
    packed_q = jnp.asarray(rng.randn(1, L, hd), jnp.float32)
    packed_k = jnp.asarray(rng.randn(1, L, hd), jnp.float32)
    packed_v = jnp.asarray(rng.randn(1, L, hd), jnp.float32)
    seg = jnp.asarray(np.repeat([[0, 1]], half, axis=1).reshape(1, L))
    assert seg.shape == (1, L)
    cos, sin = rotary_cos_sin(L, d, jnp.float32)
    cos_h, sin_h = rotary_cos_sin(half, d, jnp.float32)

    out_packed = mha_attention(packed_q, packed_k, packed_v, nh,
                               rope_cos=cos, rope_sin=sin, segment_ids=seg,
                               interpret=True)
    # rotary positions RESTART per segment in the unpacked oracle only if
    # the packer restarts them; here both halves use absolute positions, so
    # compare against per-half slices with the matching cos/sin offsets
    outs = []
    for s0 in (0, half):
        sl = slice(s0, s0 + half)
        cos_s = cos[s0:s0 + half]
        sin_s = sin[s0:s0 + half]
        outs.append(mha_attention(
            packed_q[:, sl], packed_k[:, sl], packed_v[:, sl], nh,
            rope_cos=cos_s, rope_sin=sin_s, interpret=True))
    want = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    # gradients through the packed path == concatenated per-segment grads
    g = jnp.asarray(rng.randn(1, L, hd), jnp.float32)

    def loss_packed(q_, k_, v_):
        o = mha_attention(q_, k_, v_, nh, rope_cos=cos, rope_sin=sin,
                          segment_ids=seg, interpret=True)
        return jnp.sum(o * g)

    def loss_half(q_, k_, v_, s0):
        cos_s, sin_s = cos[s0:s0 + half], sin[s0:s0 + half]
        o = mha_attention(q_, k_, v_, nh, rope_cos=cos_s, rope_sin=sin_s,
                          interpret=True)
        return jnp.sum(o * g[:, s0:s0 + half])

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(packed_q, packed_k,
                                                  packed_v)
    for a_idx, name in enumerate("qkv"):
        parts = []
        for s0 in (0, half):
            sl = slice(s0, s0 + half)
            gh = jax.grad(loss_half, argnums=(0, 1, 2))(
                packed_q[:, sl], packed_k[:, sl], packed_v[:, sl], s0)
            parts.append(gh[a_idx])
        want_g = jnp.concatenate(parts, axis=1)
        np.testing.assert_allclose(np.asarray(gp[a_idx]), np.asarray(want_g),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("nh,d", [(4, 64), (4, 24)])
def test_mha_attention_pairfuse_flag_equivalence(nh, d, monkeypatch):
    """ONEPROT_MHA_PAIRFUSE=0 and =1 (block-diagonal head packing with a
    shared per-chunk softmax max) agree with each other and the reference,
    forward and grads, including the multi-k-block running-max carry and
    segment masking."""
    from oneprot_tpu.kernels import flash_mha
    from oneprot_tpu.kernels.flash_mha import mha_attention
    from oneprot_tpu.models.esm2 import rotary_cos_sin

    rng = np.random.RandomState(7)
    B, L = 1, 256
    hd = nh * d
    q = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    seg = jnp.asarray(np.repeat([[0, 1]], L // 2, axis=1).reshape(1, L))
    cos, sin = rotary_cos_sin(L, d, jnp.float32)
    g = jnp.asarray(rng.randn(B, L, hd), jnp.float32)

    def run(flag):
        monkeypatch.setenv("ONEPROT_MHA_PAIRFUSE", flag)
        # force small blocks so the fused carry (running shared max) runs
        monkeypatch.setattr(flash_mha, "DEFAULT_BLOCK_Q", 128)
        monkeypatch.setattr(flash_mha, "DEFAULT_BLOCK_K", 128)

        def loss(q_, k_, v_):
            o = mha_attention(q_, k_, v_, nh, rope_cos=cos, rope_sin=sin,
                              segment_ids=seg, interpret=True)
            return (o, jnp.sum(o * g))

        out, grads = jax.value_and_grad(
            lambda *a: loss(*a)[1], argnums=(0, 1, 2))(q, k, v)
        fwd = loss(q, k, v)[0]
        return fwd, grads

    o0, g0 = run("0")
    o1, g1 = run("1")
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)
    seg_bias = jnp.where(seg[:, None, :, None] == seg[:, None, None, :],
                         0.0, -1e9)                     # [B, 1, L, L]
    ref = _mha_reference(q, k, v, nh, seg_bias, cos, sin)
    for a, name in ((o0, "unfused"), (o1, "fused")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"{name} vs reference")
    for a, b, name in zip(g0, g1, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{name} flag mismatch")


@pytest.mark.parametrize("nh,d", [(4, 64), (4, 24)])
def test_mha_attention_segskip_flag_equivalence(nh, d, monkeypatch):
    """ONEPROT_MHA_SEGSKIP=0 and =1 (segment-aware block skipping: k/q
    stream blocks whose segment-id ranges are disjoint are provably
    all-masked and lax.cond-skipped) agree with each other and the
    reference, forward and grads, with segment boundaries deliberately
    UNALIGNED to the 128-wide stream blocks."""
    from oneprot_tpu.kernels.flash_mha import mha_attention
    from oneprot_tpu.models.esm2 import rotary_cos_sin

    rng = np.random.RandomState(11)
    B, L = 2, 512
    hd = nh * d
    q = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, hd), jnp.float32)
    # 4 segments with unaligned cuts + a padded (-1) tail on row 1
    seg_np = np.zeros((B, L), np.int32)
    for b, cuts in enumerate(([70, 200, 390], [55, 190, 333])):
        bounds = [0] + list(cuts) + [L]
        for s in range(4):
            seg_np[b, bounds[s]:bounds[s + 1]] = s
    seg_np[1, 470:] = -1
    seg = jnp.asarray(seg_np)
    cos, sin = rotary_cos_sin(L, d, jnp.float32)
    g = jnp.asarray(rng.randn(B, L, hd), jnp.float32)

    def run(flag):
        monkeypatch.setenv("ONEPROT_MHA_SEGSKIP", flag)

        def loss(q_, k_, v_):
            o = mha_attention(q_, k_, v_, nh, rope_cos=cos, rope_sin=sin,
                              segment_ids=seg, interpret=True)
            return (o, jnp.sum(o * g))

        grads = jax.grad(lambda *a: loss(*a)[1], argnums=(0, 1, 2))(q, k, v)
        fwd = loss(q, k, v)[0]
        return fwd, grads

    o0, g0 = run("0")
    o1, g1 = run("1")
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)
    seg_bias = jnp.where(
        (seg[:, None, :, None] == seg[:, None, None, :]), 0.0, -1e9)
    ref = _mha_reference(q, k, v, nh, seg_bias, cos, sin)
    # padded (-1) rows are garbage in/zero out — compare real rows only
    real = np.asarray(seg_np >= 0)
    np.testing.assert_allclose(np.asarray(o1)[real], np.asarray(ref)[real],
                               rtol=2e-4, atol=2e-5,
                               err_msg="segskip vs reference")
    for a, b, name in zip(g0, g1, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{name} flag mismatch")


# ---------------------------------------------------------------------------
# fused gelu -> int8 quant (kernels/gelu_quant.py)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gelu_quant_kernel_matches_reference(dtype):
    from oneprot_tpu.kernels.gelu_quant import (
        gelu_quant_pallas,
        gelu_quant_reference,
    )

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(64, 256) * 3.0, dtype)
    q, s = gelu_quant_pallas(y, bm=16, interpret=True)
    q_ref, s_ref = gelu_quant_reference(y)
    # scales match to f32 precision (same abs-max up to the poly-erf error)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-4)
    # quantized codes may differ by 1 step where the poly-erf error lands
    # exactly on a rounding boundary; dequantized values must agree to one
    # quantization step
    dq = np.asarray(q, np.float32) * np.asarray(s)
    dq_ref = np.asarray(q_ref, np.float32) * np.asarray(s_ref)
    step = np.asarray(s_ref)
    assert np.all(np.abs(dq - dq_ref) <= 1.001 * step)
    assert np.mean(np.asarray(q) != np.asarray(q_ref)) < 0.01


def test_fused_gelu_quant_dispatcher(monkeypatch):
    from oneprot_tpu.kernels import gelu_quant as gq

    rng = np.random.RandomState(1)
    y = jnp.asarray(rng.randn(2, 32, 256), jnp.float32)

    monkeypatch.setenv("ONEPROT_USE_PALLAS", "0")
    assert gq.fused_gelu_quant(y) is None

    monkeypatch.setenv("ONEPROT_USE_PALLAS", "1")  # interpret mode on CPU
    out = gq.fused_gelu_quant(y)
    assert out is not None
    q, s = out
    assert q.shape == y.shape and q.dtype == jnp.int8
    assert s.shape == (2, 32, 1)
    q_ref, s_ref = gq.gelu_quant_reference(y)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4)

    # non-128-multiple trailing dim -> fallback to None
    assert gq.fused_gelu_quant(y[..., :100]) is None


def test_int8_mlp_fused_epilogue_matches_unfused(monkeypatch):
    """Esm2 int8 tower forward: fused gelu->quant path (interpret) vs the
    unfused Int8Dense-internal quant; outputs agree to int8-step order.
    128-multiple hidden/intermediate so the fused dispatcher engages."""
    from oneprot_tpu.models.esm2 import Esm2, Esm2Config

    cfg = Esm2Config(hidden_size=128, num_layers=2, num_heads=4,
                     intermediate_size=256)
    rng = np.random.RandomState(2)
    ids = rng.randint(4, 24, (2, 16)).astype(np.int32)
    ids[:, 0] = 0
    ids[:, -1] = 2

    model = Esm2(cfg, quant_int8=True)
    monkeypatch.setenv("ONEPROT_USE_PALLAS", "0")
    params = model.init(jax.random.key(0), jnp.asarray(ids))["params"]
    out_unfused = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids)), np.float32)
    monkeypatch.setenv("ONEPROT_USE_PALLAS", "1")
    out_fused = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids)), np.float32)

    cos = float((out_unfused * out_fused).sum()
                / (np.linalg.norm(out_unfused) * np.linalg.norm(out_fused)
                   + 1e-9))
    assert cos > 0.999, f"fused-epilogue drift: cos={cos}"


def test_dispatch_honors_active_mesh_platform(monkeypatch):
    """Regression: under a TPU-attached process (default_backend=tpu) a
    `trainer=cpu` run places the step on CPU devices via the module mesh;
    the dispatcher must then fall back to XLA instead of emitting a
    compiled Mosaic kernel for the CPU lowering ("Only interpret mode is
    supported on CPU backend")."""
    import jax

    from oneprot_tpu.core.mesh import make_mesh
    from oneprot_tpu.kernels import attention

    # simulate the TPU-attached env on this CPU host
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        # 1-device CPU mesh: platform must win over default_backend
        mesh = make_mesh(data=1, model=1, devices=jax.devices("cpu")[:1])
        attention.set_active_mesh(mesh)
        assert attention._ACTIVE_PLATFORM == "cpu"
        assert attention._tpu_available() is False

        q = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128),
                        jnp.float32)
        seg = jnp.zeros((1, 128), jnp.int32)
        # auto mode: must decline the fused path (-> caller's XLA fallback)
        assert attention.fused_mha(q, q, q, 2, segment_ids=seg) is None

        # cleared mesh: default_backend rules again
        attention.set_active_mesh(None)
        assert attention._ACTIVE_PLATFORM is None
        assert attention._tpu_available() is True
    finally:
        attention.set_active_mesh(None)
