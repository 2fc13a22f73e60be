"""Full-hub integration: all six modalities through train + val.

Exercises every encoder family (ESM2 hub, struct-token ESM2, BERT text,
ProNet-equivalent GNN for struct_graph and pocket, MSA transformer, seqsim
routing through the hub) and the per-modality optimizer sub-step loop
(reference oneprot_module.py:92-107) in one run on synthetic fixtures.
"""

import os

import numpy as np
import pytest

from oneprot_tpu.core.config import load_config, prepare_run_dir
from oneprot_tpu.data.synthetic import generate_fixtures

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.slow
@pytest.mark.tier0  # quick tier: one train step per modality family
def test_all_modalities_train_and_val(tmp_path):
    import train as train_entry

    data_dir = str(tmp_path / "fixtures")
    generate_fixtures(data_dir, n_train=8, n_eval=4, seed=0)
    cfg = load_config(CONFIG_DIR, "train", overrides=[
        "experiment=debug_all_modalities",
        f"paths.data_dir={data_dir}",
        "model.components.sequence.output_dim=32",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=1",
        "test=False",
    ])
    cfg = prepare_run_dir(cfg, output_dir=str(tmp_path / "run"))
    metrics = train_entry.train(cfg)
    assert np.isfinite(metrics["val/loss"])
    # every modality actually took optimizer steps (one combined batch of 6
    # modalities = 6 sub-steps, reference oneprot_module.py:92-107)
    import json

    with open(str(tmp_path / "run" / "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert max(r.get("step", 0) for r in rows) >= 6, \
        "training took no steps — combined loader was empty"
    for modality in ("struct_token", "text", "struct_graph", "pocket",
                     "msa", "seqsim"):
        key = f"val/seq_to_mod_R@1/val_{modality}"
        assert key in metrics, f"missing retrieval metrics for {modality}"
