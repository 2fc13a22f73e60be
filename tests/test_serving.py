"""Serving API: run-dir load, bucketed embedding, on-device top-k."""

import os

import numpy as np
import pytest

from oneprot_tpu.core.config import load_config, prepare_run_dir
from oneprot_tpu.data.synthetic import generate_fixtures
from oneprot_tpu.serving import OneProtEmbedder

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    from oneprot_tpu.models import esm2

    orig = esm2.ESM2_SIZES["esm2_t6_8M"]
    esm2.ESM2_SIZES["esm2_t6_8M"] = esm2.Esm2Config(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
    import train as train_entry

    tmp = tmp_path_factory.mktemp("serve")
    data_dir = str(tmp / "data")
    generate_fixtures(data_dir, n_train=8, n_eval=4)
    cfg = load_config(CONFIG_DIR, "train", overrides=[
        "experiment=debug_struct_token",
        f"paths.data_dir={data_dir}",
        "model.components.sequence.output_dim=32",
        "data.default_batch_size=4",
        "data.modalities.struct_token.batch_size.train=4",
        "trainer.limit_train_batches=1", "trainer.limit_val_batches=1",
        "trainer.max_epochs=1", "test=False",
    ])
    out = str(tmp / "run")
    cfg = prepare_run_dir(cfg, output_dir=out)
    train_entry.train(cfg)
    yield out
    esm2.ESM2_SIZES["esm2_t6_8M"] = orig


def test_embedder_from_run_dir(run_dir):
    emb = OneProtEmbedder.from_run_dir(run_dir)
    seqs = ["MKTAYIAK", "MKV", "A" * 50]
    feats = emb.embed_sequences(seqs)
    assert feats.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-4)
    st = emb.embed_struct_tokens(["pynwrq", "vtmfsa"])
    assert st.shape == (2, 32)


def test_retrieval_topk(run_dir):
    emb = OneProtEmbedder.from_run_dir(run_dir)
    rng = np.random.RandomState(0)
    pool = rng.randn(20, 32).astype(np.float32)
    queries = pool[[3, 7, 11]] + rng.randn(3, 32).astype(np.float32) * 0.01
    scores, idx = emb.retrieve(queries, pool, k=3)
    assert idx.shape == (3, 3)
    assert list(idx[:, 0]) == [3, 7, 11]  # nearest is the perturbed source
    assert (scores[:, 0] >= scores[:, 1]).all()
