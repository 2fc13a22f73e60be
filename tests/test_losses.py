"""Loss tests: single-device vs reference math, sharded vs single-device.

The sharded paths run under shard_map on the 8-device virtual CPU mesh
(conftest.py), the TPU build's ddp_sim equivalent (SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from oneprot_tpu.losses import clip_loss, siglip_loss


# whole-file tier0: part of the ~2-minute smoke subset for the inner dev
# loop (`make test-quick`, VERDICT r4 next-step 7)
pytestmark = pytest.mark.tier0



def _norm_rows(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture
def feats():
    rng = np.random.RandomState(0)
    mod = _norm_rows(rng.randn(16, 32)).astype(np.float32)
    seq = _norm_rows(rng.randn(16, 32)).astype(np.float32)
    return jnp.asarray(mod), jnp.asarray(seq)


def _torch_style_clip(mod, seq, scale=1.0):
    """Independent numpy re-derivation of reference ClipLoss.forward math."""
    logits_m = scale * mod @ seq.T
    logits_s = scale * seq @ mod.T
    labels = np.arange(mod.shape[0])

    def ce(logits):
        logz = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
        return np.mean(logz - logits[np.arange(len(labels)), labels])

    return 0.5 * (ce(np.asarray(logits_m)) + ce(np.asarray(logits_s)))


def test_clip_loss_matches_reference_math(feats):
    mod, seq = feats
    got = clip_loss(mod, seq, logit_scale=14.0)
    want = _torch_style_clip(np.asarray(mod), np.asarray(seq), 14.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_clip_loss_sharded_equals_single(feats):
    mod, seq = feats
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def sharded(m, s):
        return clip_loss(m, s, logit_scale=14.0, axis_name="data",
                         local_loss=True)

    f = shard_map(sharded, mesh=mesh, in_specs=(P("data"), P("data")),
                  out_specs=P())
    got = f(mod, seq)
    want = clip_loss(mod, seq, logit_scale=14.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_clip_loss_global_path_sharded(feats):
    mod, seq = feats
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    f = shard_map(
        lambda m, s: clip_loss(m, s, axis_name="data", local_loss=False),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    np.testing.assert_allclose(f(mod, seq), clip_loss(mod, seq), rtol=1e-5)


def test_clip_loss_grads_flow_through_gather(feats):
    mod, seq = feats
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def sharded_loss(m, s):
        f = shard_map(
            lambda mm, ss: clip_loss(mm, ss, axis_name="data", local_loss=True),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
        return f(m, s)

    g_sharded = jax.grad(sharded_loss)(mod, seq)
    g_single = jax.grad(lambda m, s: clip_loss(m, s))(mod, seq)
    np.testing.assert_allclose(g_sharded, g_single, rtol=1e-4, atol=1e-6)


def _reference_siglip(mod, seq, scale=1.0):
    """Numpy re-derivation of reference SigLipLoss._loss summed over blocks."""
    def block(m, s, negative_only):
        logits = scale * m @ s.T
        labels = -np.ones_like(logits)
        if not negative_only:
            labels += 2 * np.eye(len(m))
        return -np.sum(np.log(1.0 / (1.0 + np.exp(-labels * logits)))) / len(m)

    return block(mod, seq, False)


def test_siglip_single_matches_reference_math(feats):
    mod, seq = feats
    got = siglip_loss(mod, seq, logit_scale=10.0)
    want = _reference_siglip(np.asarray(mod), np.asarray(seq), 10.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("bidir", [True, False])
def test_siglip_ring_covers_all_negatives(feats, bidir):
    """Sharded SigLIP == mean over shards of (local positives block + one
    negative block per remote shard) — the reference's ring semantics."""
    mod, seq = feats
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    f = shard_map(
        lambda m, s: siglip_loss(m, s, axis_name="data", bidir=bidir,
                                 axis_size=n_dev),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    got = f(mod, seq)

    mod_np, seq_np = np.asarray(mod), np.asarray(seq)
    b = len(mod_np) // n_dev
    losses = []
    for r in range(n_dev):
        m_r = mod_np[r * b:(r + 1) * b]
        loss_r = _reference_siglip(m_r, seq_np[r * b:(r + 1) * b])
        for o in range(n_dev):
            if o == r:
                continue
            s_o = seq_np[o * b:(o + 1) * b]
            logits = m_r @ s_o.T
            labels = -np.ones_like(logits)
            loss_r += -np.sum(np.log(1.0 / (1.0 + np.exp(-labels * logits)))) / b
        losses.append(loss_r)
    np.testing.assert_allclose(got, np.mean(losses), rtol=1e-5)
