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
