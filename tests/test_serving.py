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


def test_embed_graphs_and_msas(tmp_path):
    """Serving covers the non-token modalities too: residue graphs and
    pocket cut-outs straight from the seqstruc.h5 layout, and .a3m MSAs
    through the reference's greedy-select subsampling."""
    import glob

    from oneprot_tpu.core.config import instantiate
    from oneprot_tpu.models import esm2

    data_dir = str(tmp_path / "data")
    generate_fixtures(data_dir, n_train=6, n_eval=2)

    orig = esm2.ESM2_SIZES["esm2_t6_8M"]
    esm2.ESM2_SIZES["esm2_t6_8M"] = esm2.Esm2Config(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
    try:
        cfg = load_config(CONFIG_DIR, "train", overrides=[
            "experiment=debug_all_modalities",
            f"paths.data_dir={data_dir}",
            "model.components.sequence.output_dim=32",
        ])
        cfg = prepare_run_dir(cfg, output_dir=str(tmp_path / "run"))
        module = instantiate({**dict(cfg["model"]), "seed": 0})
        module.init(module.dummy_examples())
        emb = OneProtEmbedder(module, buckets=[64, 128])

        import pandas as pd

        ids = list(pd.read_csv(
            os.path.join(data_dir, "train_seqstruc.csv"),
            header=None)[0].astype(str))[:3]
        g = emb.embed_graphs(os.path.join(data_dir, "seqstruc.h5"), ids,
                             max_residues=64, max_neighbors=8, batch_size=2)
        assert g.shape == (3, 32) and np.isfinite(g).all()

        a3ms = sorted(glob.glob(os.path.join(data_dir, "msas", "*.a3m")))[:2]
        assert a3ms, "fixture a3m files missing"
        m = emb.embed_msas(a3ms, msa_depth=4, max_length=128, batch_size=2)
        assert m.shape == (2, 32) and np.isfinite(m).all()
    finally:
        esm2.ESM2_SIZES["esm2_t6_8M"] = orig
