"""Struct-graph (ProNet-equivalent) trainability: gradients flow through the
geometric features and the pair loss decreases on a tiny overfit task."""

import numpy as np
import pytest

from oneprot_tpu.data.synthetic import generate_fixtures
from oneprot_tpu.data.datasets.struct_graph_dataset import StructDataset
from oneprot_tpu.models.encoders import (
    create_sequence_encoder,
    create_struct_graph_encoder,
)
from oneprot_tpu.train.module import OneProtModule
from oneprot_tpu.train.optim import adam


@pytest.fixture(scope="module")
def tiny():
    from oneprot_tpu.models import esm2

    orig = esm2.ESM2_SIZES["esm2_t6_8M"]
    esm2.ESM2_SIZES["esm2_t6_8M"] = esm2.Esm2Config(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
    yield
    esm2.ESM2_SIZES["esm2_t6_8M"] = orig


def test_struct_graph_pair_overfits(tiny, tmp_path):
    data_dir = str(tmp_path / "d")
    generate_fixtures(data_dir, n_train=8, n_eval=4)
    ds = StructDataset(data_dir=data_dir, split="train", max_residues=64,
                       max_neighbors=8, buckets=[64, 128])
    seq_ids, graph, _, _ = ds.collate_fn([ds[i] for i in range(4)],
                                         rng=np.random.RandomState(0))

    seq = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=16,
        proj_type="mlp", frozen=False, dtype="float32")
    sg = create_struct_graph_encoder(
        encoder={"hidden_size": 16, "num_layers": 2, "out_channels": 16},
        output_dim=16)
    module = OneProtModule(
        components={"sequence": seq, "struct_graph": sg},
        optimizer=lambda: adam(3e-3), frozen_param_dtype=None, seed=0)
    module.init({"struct_graph": (seq_ids, graph)})

    state = module.state
    # snapshot BEFORE stepping: train_step donates the input state's buffers
    before_kernel = np.asarray(
        state.params["encoders_struct_graph"]["encoder"]["layer_0"]["msg1"]
        ["kernel"]).copy()
    losses = []
    for _ in range(12):
        state, loss = module.train_step(state, "struct_graph", seq_ids, graph)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # stochastic (dropout + per-step geometric augmentation): compare the
    # tail mean against the start rather than single steps
    assert np.mean(losses[-4:]) < np.mean(losses[:2]), \
        f"GNN pair loss did not trend down: {losses}"

    # the GNN actually received gradients (message-passing weights moved)
    after_kernel = np.asarray(
        state.params["encoders_struct_graph"]["encoder"]["layer_0"]["msg1"]
        ["kernel"])
    assert not np.allclose(before_kernel, after_kernel)


def test_msa_encoder_query_row_path(tiny):
    """use_all_msa=False pools row 0 only (reference msa_encoder.py:45-49)."""
    import jax
    import jax.numpy as jnp

    from oneprot_tpu.models.encoders import create_msa_encoder

    enc = create_msa_encoder(output_dim=8, use_all_msa=False,
                             pooling_type="mean", num_layers=1,
                             hidden_size=16, num_heads=2)
    tokens = np.full((2, 3, 10), 1, np.int32)
    tokens[:, :, 0] = 0
    tokens[0, :, 1:6] = 5
    tokens[1, :, 1:9] = 6
    p = enc.init(jax.random.key(0), jnp.asarray(tokens))
    out = enc.apply(p, jnp.asarray(tokens))
    assert out.shape == (2, 8)
    assert np.isfinite(np.asarray(out)).all()
    # changing NON-query rows must not change the row-0-pooled output beyond
    # what row attention mixes in — but changing row 0 itself must change it
    tokens2 = tokens.copy()
    tokens2[0, 0, 1:6] = 7  # mutate the query row
    out2 = enc.apply(p, jnp.asarray(tokens2))
    assert not np.allclose(np.asarray(out)[0], np.asarray(out2)[0])
