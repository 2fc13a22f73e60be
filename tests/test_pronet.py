"""Property tests pinning the redesigned struct-graph GNN's semantics.

The reference's struct_graph tower is DIG's ProNet (reference
configs/model/components/struct_graph.yaml:2-9, requirements.txt:15
`dive-into-graphs`) — weight-compatible transfer is impossible offline, so
these tests pin the CLAIMED feature semantics of the first-party redesign
instead (VERDICT r3 #5): SE(3) invariance of the geometric features and
full forward, chirality sensitivity (proteins are chiral — a mirror image
must NOT embed identically), the euler_noise / data_augment_eachlayer
training flags actually perturbing, and kNN-graph correctness vs brute
force.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneprot_tpu.models.pronet import ProNet, ProNetConfig, backbone_frames


def _random_graph(rng, batch=2, n=24, k=8, cutoff=10.0):
    """Padded graph dict with self-consistent backbone coords + kNN lists."""
    from oneprot_tpu.data.utils.graphs import knn_neighbors

    coords_ca = np.cumsum(rng.randn(batch, n, 3).astype(np.float32) * 1.8,
                          axis=1)
    coords_n = coords_ca + rng.randn(batch, n, 3).astype(np.float32) * 0.4
    coords_c = coords_ca + rng.randn(batch, n, 3).astype(np.float32) * 0.4
    idx = np.zeros((batch, n, k), np.int32)
    mask = np.zeros((batch, n, k), np.float32)
    for b in range(batch):
        i, m = knn_neighbors(coords_ca[b], k, cutoff)
        idx[b], mask[b] = i, m.astype(np.float32)
    node_mask = np.ones((batch, n), np.float32)
    node_mask[:, n - 3:] = 0.0  # padded tail
    return {
        "aa": rng.randint(0, 20, size=(batch, n)).astype(np.int32),
        "coords_ca": coords_ca,
        "coords_n": coords_n,
        "coords_c": coords_c,
        "bb_embs": rng.randn(batch, n, 6).astype(np.float32),
        "side_chain_embs": rng.randn(batch, n, 8).astype(np.float32),
        "node_mask": node_mask,
        "neighbor_idx": idx,
        "neighbor_mask": mask,
    }


def _random_rotation(rng):
    """Haar-ish random proper rotation via QR (det forced to +1)."""
    q, r = np.linalg.qr(rng.randn(3, 3))
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q.astype(np.float32)


def _transform(graph, rot, trans):
    out = dict(graph)
    for key in ("coords_ca", "coords_n", "coords_c"):
        out[key] = graph[key] @ rot.T + trans
    return out


def _pronet(euler_noise=False, augment=False):
    cfg = ProNetConfig(hidden_size=32, out_channels=16, num_layers=2,
                       num_rbf=8, cutoff=10.0, euler_noise=euler_noise,
                       data_augment_eachlayer=augment)
    return ProNet(config=cfg)


def test_pronet_se3_invariance():
    """A rigid transform of the structure (same graph topology) must not
    change the embedding: every geometric feature the network consumes is
    built from the per-residue backbone frame (models/pronet.py), which
    co-rotates with the structure. (Replaces the un-closable DIG weight
    parity for the SE(3) claim; reference struct_graph.yaml:2-9.)"""
    rng = np.random.RandomState(0)
    graph = _random_graph(rng)
    model = _pronet()
    params = model.init(jax.random.key(0), graph)
    base = np.asarray(model.apply(params, graph))
    for trial in range(3):
        rot = _random_rotation(np.random.RandomState(10 + trial))
        trans = np.random.RandomState(20 + trial).randn(3).astype(
            np.float32) * 50.0
        moved = np.asarray(model.apply(params, _transform(graph, rot, trans)))
        scale = max(float(np.abs(base).max()), 1e-6)
        err = float(np.abs(moved - base).max()) / scale
        assert err < 5e-4, f"SE(3) violation: rel err {err:.2e} (trial {trial})"


def test_pronet_frames_co_rotate():
    """backbone_frames(R x + t) == backbone_frames(x) R^T row-wise, so the
    invariant edge features (local directions, relative rotations) are
    exactly transform-free."""
    rng = np.random.RandomState(1)
    g = _random_graph(rng, batch=1, n=8)
    rot = _random_rotation(rng)
    f0 = np.asarray(backbone_frames(
        jnp.asarray(g["coords_n"]), jnp.asarray(g["coords_ca"]),
        jnp.asarray(g["coords_c"])))
    g2 = _transform(g, rot, np.float32([3.0, -7.0, 11.0]))
    f1 = np.asarray(backbone_frames(
        jnp.asarray(g2["coords_n"]), jnp.asarray(g2["coords_ca"]),
        jnp.asarray(g2["coords_c"])))
    np.testing.assert_allclose(f1, f0 @ rot.T, atol=1e-5)


def test_pronet_chirality_sensitivity():
    """A mirror reflection is NOT a rigid motion — proteins are chiral and
    the frame's e3 = e1 x e2 flips under reflection, so the embedding must
    change. Guards against the invariance test passing vacuously (e.g. if
    the geometric features were all degenerate zeros)."""
    rng = np.random.RandomState(2)
    graph = _random_graph(rng)
    model = _pronet()
    params = model.init(jax.random.key(0), graph)
    base = np.asarray(model.apply(params, graph))
    mirrored = dict(graph)
    for key in ("coords_ca", "coords_n", "coords_c"):
        m = graph[key].copy()
        m[..., 0] = -m[..., 0]
        mirrored[key] = m
    flipped = np.asarray(model.apply(params, mirrored))
    diff = float(np.abs(flipped - base).max())
    assert diff > 1e-3, f"mirror image embedded identically (diff {diff:.2e})"


def test_pronet_augment_flags_perturb():
    """euler_noise and data_augment_eachlayer (reference
    struct_graph.yaml:6-8) must actually perturb training-mode outputs, and
    with both OFF training mode must equal eval mode."""
    rng = np.random.RandomState(3)
    graph = _random_graph(rng)

    clean = _pronet(euler_noise=False, augment=False)
    params = clean.init(jax.random.key(0), graph)
    base = np.asarray(clean.apply(params, graph, deterministic=True))
    same = np.asarray(clean.apply(params, graph, deterministic=False))
    np.testing.assert_allclose(same, base, atol=1e-6)

    for kwargs in ({"euler_noise": True}, {"augment": True}):
        noisy_model = _pronet(**kwargs)
        out1 = np.asarray(noisy_model.apply(
            params, graph, deterministic=False,
            rngs={"augment": jax.random.key(1)}))
        out2 = np.asarray(noisy_model.apply(
            params, graph, deterministic=False,
            rngs={"augment": jax.random.key(2)}))
        assert float(np.abs(out1 - base).max()) > 1e-5, kwargs
        assert float(np.abs(out1 - out2).max()) > 1e-6, kwargs
        # eval mode ignores the flags entirely
        out_eval = np.asarray(noisy_model.apply(
            params, graph, deterministic=True))
        np.testing.assert_allclose(out_eval, base, atol=1e-6)


def test_knn_matches_bruteforce_within_cutoff():
    """knn_neighbors (whichever path engages — C++ or numpy) returns
    exactly the k nearest neighbors within cutoff, self excluded, sorted
    by distance, with mask flagging in-cutoff entries."""
    from oneprot_tpu.data.utils.graphs import knn_neighbors

    rng = np.random.RandomState(4)
    for n, k, cutoff in ((30, 8, 10.0), (5, 8, 6.0), (12, 4, 3.0)):
        coords = rng.randn(n, 3).astype(np.float32) * 3.0
        idx, mask = knn_neighbors(coords, k, cutoff)
        assert idx.shape == (n, k) and mask.shape == (n, k)
        d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        for i in range(n):
            want = np.sort(d[i][d[i] <= cutoff])[:k]
            got_idx = idx[i][mask[i] > 0]
            got = d[i][got_idx]
            assert len(got) == len(want), (i, len(got), len(want))
            np.testing.assert_allclose(np.sort(got), want, rtol=1e-5)
            # masked-in neighbors are within cutoff; distances sorted
            assert np.all(got <= cutoff * (1 + 1e-6))
            assert np.all(np.diff(got) >= -1e-5)
            assert i not in got_idx, "self loop"


def test_struct_graph_encoder_end_to_end_invariance():
    """The full StructGraphEncoder (GNN + dropout head + projection +
    logit-scaled norm) stays SE(3)-invariant in eval mode."""
    from oneprot_tpu.models.encoders import create_struct_graph_encoder

    rng = np.random.RandomState(5)
    graph = _random_graph(rng)
    enc = create_struct_graph_encoder(
        output_dim=16,
        encoder={"hidden_size": 32, "num_layers": 2, "num_rbf": 8,
                 "out_channels": 16})
    params = enc.init(jax.random.key(0), graph)
    base = np.asarray(enc.apply(params, graph))
    rot = _random_rotation(rng)
    moved = np.asarray(enc.apply(
        params, _transform(graph, rot, np.float32([5.0, 1.0, -2.0]))))
    err = float(np.abs(moved - base).max())
    assert err < 5e-3, f"encoder SE(3) violation: {err:.2e}"
