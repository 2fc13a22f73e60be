"""End-to-end production-trainer soak (VERDICT r4 next-step 8).

One scenario, the full production feature stack at tiny scale: synthetic
fixtures, sequence packing, frozen hub, the DISK-persistent frozen-feature
cache, a mid-run Orbax checkpoint resume (the chain-resubmission workflow,
reference start_training_chain.sh:9-24), and retrieval validation — with
the steady-state and restart properties asserted through the cache's
hit/miss accounting (the MECHANISM of the 12.7x steady-state speedup
measured at 650M scale in bench.py's cached phase; wall-clock on 35M-param
CPU test models is noise-dominated, miss counts are not).
"""

import json
import os

import numpy as np
import pytest

from oneprot_tpu.core.config import load_config, prepare_run_dir
from oneprot_tpu.data.synthetic import generate_fixtures

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.slow
def test_e2e_soak_packed_cache_resume(tmp_path):
    import train as train_entry

    from oneprot_tpu.models import esm2

    orig = esm2.ESM2_SIZES["esm2_t6_8M"]
    esm2.ESM2_SIZES["esm2_t6_8M"] = esm2.Esm2Config(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
    try:
        data_dir = str(tmp_path / "fixtures")
        generate_fixtures(data_dir, n_train=16, n_eval=4, seed=0)
        feat = str(tmp_path / "feature_cache")

        def overrides(out, extra=()):
            return [
                "experiment=debug_struct_token",
                f"paths.data_dir={data_dir}",
                "model.components.sequence.output_dim=32",
                # the production stack under test:
                "model.components.sequence.frozen=true",
                "data.pack_sequences=true",
                "data.pack_rows=4",
                "data.pack_row_len=64",
                "data.pack_slots=4",
                f"trainer.cache_persist_dir={feat}",
                "trainer.log_every_n_steps=1",
                "trainer.limit_val_batches=1",
                "test=False",
                *extra,
            ]

        def run(out, extra=()):
            cfg = load_config(CONFIG_DIR, "train",
                              overrides=overrides(out, extra))
            cfg = prepare_run_dir(cfg, output_dir=str(tmp_path / out))
            return train_entry.train(cfg)

        def train_losses(out):
            rows = []
            with open(str(tmp_path / out / "metrics.jsonl")) as f:
                for line in f:
                    r = json.loads(line)
                    if "train/loss" in r:
                        rows.append(r["train/loss"])
            return rows

        # -- segment 1: 2 epochs. Epoch 1 computes + persists the frozen
        # hub's per-protein features; epoch 2 is all cache hits.
        m1 = run("seg1", ["trainer.max_epochs=2"])
        assert np.isfinite(m1["val/loss"])
        assert m1["cache/misses"] > 0          # epoch 1 paid the hub cost
        assert m1["cache/hits"] >= m1["cache/misses"], (
            "epoch 2 was not served from the cache: "
            f"{m1['cache/hits']} hits / {m1['cache/misses']} misses")
        assert m1["cache/disk_entries"] == m1["cache/misses"], (
            "not every computed row was persisted")
        # retrieval eval ran
        assert np.isfinite(m1["val/seq_to_mod_R@1/val_struct_token"])

        last = str(tmp_path / "seg1" / "checkpoints" / "last")
        assert os.path.isdir(last)

        # -- segment 2: FRESH process state (new module, trainer, cache),
        # Orbax resume + warm disk store. The restart must train at cached
        # speed from its first step: zero hub misses, only disk hits.
        # max_epochs is TOTAL across resumes (Lightning semantics): seg1
        # completed 2 epochs, so seg2 raises it to 3 to train one more.
        m2 = run("seg2", ["trainer.max_epochs=3", f"ckpt_path={last}"])
        assert np.isfinite(m2["val/loss"])
        assert m2["cache/misses"] == 0, (
            "restarted segment re-paid the epoch-1 hub cost "
            f"({m2['cache/misses']} misses)")
        assert m2["cache/disk_hits"] > 0
        assert np.isfinite(m2["val/seq_to_mod_R@1/val_struct_token"])

        # -- loss continuity across the restart: segment 2 starts from the
        # restored optimizer state, not a re-initialization — its FIRST
        # logged loss must sit at (or below) segment 1's trailing trend,
        # far below segment 1's cold start.
        l1 = train_losses("seg1")
        l2 = train_losses("seg2")
        assert l1 and l2
        assert l2[0] < l1[0], (
            f"resume lost training progress: seg2 starts at {l2[0]:.4f} "
            f"vs seg1 cold start {l1[0]:.4f}")
        tail = np.mean(l1[-3:])
        assert l2[0] <= tail * 1.25 + 0.05, (
            f"loss discontinuity across restart: seg2 first {l2[0]:.4f} "
            f"vs seg1 tail mean {tail:.4f}")
    finally:
        esm2.ESM2_SIZES["esm2_t6_8M"] = orig
