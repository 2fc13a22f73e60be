"""Retrieval eval CLI on an all-modalities model (reference eval.py flow)."""

import os

import numpy as np
import pytest

from oneprot_tpu.core.config import load_config, prepare_run_dir
from oneprot_tpu.data.synthetic import generate_fixtures

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def tiny():
    from oneprot_tpu.models import esm2

    orig = esm2.ESM2_SIZES["esm2_t6_8M"]
    esm2.ESM2_SIZES["esm2_t6_8M"] = esm2.Esm2Config(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
    yield
    esm2.ESM2_SIZES["esm2_t6_8M"] = orig


@pytest.mark.slow
def test_eval_cli_all_pairs(tiny, tmp_path, monkeypatch):
    import train as train_entry
    from oneprot_tpu.evaluation.retrieval_eval import run_eval

    data_dir = str(tmp_path / "data")
    generate_fixtures(data_dir, n_train=8, n_eval=6)
    cfg = load_config(CONFIG_DIR, "train", overrides=[
        "experiment=debug_all_modalities",
        f"paths.data_dir={data_dir}",
        "model.components.sequence.output_dim=32",
        "trainer.limit_train_batches=1", "trainer.limit_val_batches=1",
        "test=False",
    ])
    run_dir = str(tmp_path / "run")
    cfg = prepare_run_dir(cfg, output_dir=run_dir)
    train_entry.train(cfg)

    monkeypatch.setenv("ONEPROT_DATA_DIR", data_dir)
    eval_cfg = load_config(CONFIG_DIR, "eval", overrides=[
        f"run_dir={run_dir}", "batch_size=3",
        f"csv_file={data_dir}/test_all_modalities.csv",
    ])
    eval_cfg = prepare_run_dir(eval_cfg, output_dir=str(tmp_path / "eval_out"))
    results = run_eval(eval_cfg)

    # all-pairs over the modalities the model has (sequence, struct_token,
    # text, struct_graph, pocket -> C(5,2)=10 pairs)
    assert len(results) == 10
    for pair, metrics in results.items():
        for direction in ("seq_to_mod", "mod_to_seq"):
            assert 0.0 <= metrics[f"{direction}_R@1"] <= 1.0
            assert metrics[f"{direction}_median_rank"] >= 1
    out_csv = os.path.join(run_dir, "retrieval_results.csv")
    assert os.path.isfile(out_csv)
    lines = open(out_csv).read().strip().splitlines()
    assert len(lines) == 1 + 2 * len(results)  # header + both directions


def test_dataloader_determinism(tmp_path):
    from oneprot_tpu.data.datamodule import DataLoader
    from oneprot_tpu.data.datasets.struct_token_dataset import StructTokenDataset

    data_dir = str(tmp_path / "d")
    # 32 items: with length-grouped batching, one sort window collapses the
    # within-window order to length order, so the seed only permutes the
    # BATCH order — 8 items gave just 2 batches and seeds could (and did)
    # coincide; 8 batches make seed-coincidence astronomically unlikely
    generate_fixtures(data_dir, n_train=32, n_eval=4)
    ds = StructTokenDataset(data_dir=data_dir,
                            filename=f"{data_dir}/train_saprot.h5",
                            split="train", buckets=[64, 128])
    l1 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    l2 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    b1 = [b[0] for b in l1]
    b2 = [b[0] for b in l2]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
    # different seed -> different order
    l3 = DataLoader(ds, batch_size=4, shuffle=True, seed=8)
    b3 = [b[0] for b in l3]
    assert any(not np.array_equal(a, b)
               for a, b in zip(b1, b3)
               if a.shape == b.shape)


def test_epochs_reshuffle_across_fresh_loaders(tmp_path):
    """Regression: the trainer rebuilds train loaders every epoch, so the
    epoch index must come from datamodule.set_epoch — without it every
    epoch replayed epoch-0's shuffle order (and contrastive batches saw
    identical negative compositions all run)."""
    import numpy as np

    from oneprot_tpu.core.config import instantiate, load_config, prepare_run_dir
    from oneprot_tpu.data.synthetic import generate_fixtures

    data_dir = str(tmp_path / "fx")
    generate_fixtures(data_dir, n_train=32, n_eval=4)
    cfg = load_config(CONFIG_DIR, "train", overrides=[
        "experiment=debug_struct_token", f"paths.data_dir={data_dir}"])
    cfg = prepare_run_dir(cfg, output_dir=str(tmp_path / "run"))
    dm = instantiate({**dict(cfg["data"]), "seed": 0})
    dm.setup()

    def first_ids(loader):
        batch = next(iter(loader))
        item = batch[sorted(batch)[0]] if isinstance(batch, dict) else batch
        return np.asarray(item[0])[:, :6].tolist()

    dm.set_epoch(0)
    a = first_ids(dm.train_dataloader())
    dm.set_epoch(1)
    b = first_ids(dm.train_dataloader())
    dm.set_epoch(0)
    c = first_ids(dm.train_dataloader())
    assert a != b, "fresh loaders must reshuffle across epochs"
    assert a == c, "epoch seeding must stay deterministic"
