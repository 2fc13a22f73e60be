#!/usr/bin/env python
"""Boosted-classifier downstream probe (reference src/saprot_fit_cls.py).

Config-driven (composes configs/saprot_sweep_xgboost_cls.yaml — reference
configs/saprot_sweep_xgboost_cls.yaml:1; the downstream_model group is
instantiated like the reference's hydra.utils.instantiate,
src/saprot_fit_cls.py:32):

    python saprot_fit_cls.py emb_dir=<dir> task_name=EC \
        downstream_model.max_depth=5

Legacy flag form: python saprot_fit_cls.py --embeddings-dir <dir> --task EC
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oneprot_tpu.downstream.boosters import fit_booster, make_classifier  # noqa: E402
from oneprot_tpu.downstream.utils import load_data, save_results_to_csv  # noqa: E402

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "configs")


def _load_splits(emb_dir, task, splits, threshold=None):
    thr = None if threshold in (None, "null", "") else float(threshold)
    return {s: load_data(os.path.join(
        emb_dir, f"{task}_{s}_embeddings_labels.npz"), binarize_threshold=thr)
        for s in splits}


def main_config(argv, config_name):
    from oneprot_tpu.core.config import instantiate, load_config, to_plain

    cfg_node = load_config(CONFIG_DIR, config_name, overrides=argv)
    cfg = to_plain(cfg_node)
    task = cfg["task_name"]
    splits = _load_splits(cfg["emb_dir"], task,
                          cfg.get("evaluate_on", ["train", "valid", "test"]),
                          cfg.get("threshold"))
    model = instantiate(cfg["downstream_model"])
    result = fit_booster(splits["train"], splits["valid"], splits["test"],
                         task, model=model)
    results_dir = cfg.get("results_dir", ".")
    os.makedirs(results_dir, exist_ok=True)
    result["task"] = task
    result["model_type"] = cfg.get("model_type", "oneprot")
    save_results_to_csv(result, os.path.join(
        results_dir, f"{task}_xgb_results.csv"))
    print(result)
    return result


def main_flags(argv, regression: bool = False):
    p = argparse.ArgumentParser()
    p.add_argument("--embeddings-dir", required=True)
    p.add_argument("--task", required=True)
    p.add_argument("--output-csv", default="booster_results.csv")
    p.add_argument("--n-estimators", type=int, default=500)
    p.add_argument("--max-depth", type=int, default=6)
    p.add_argument("--learning-rate", type=float, default=0.1)
    args = p.parse_args(argv)

    splits = _load_splits(args.embeddings_dir, args.task,
                          ("train", "valid", "test"))
    from oneprot_tpu.downstream.boosters import make_regressor

    model = (make_regressor if regression else make_classifier)(
        n_estimators=args.n_estimators, max_depth=args.max_depth,
        learning_rate=args.learning_rate)
    result = fit_booster(splits["train"], splits["valid"], splits["test"],
                         args.task, model=model)
    result["task"] = args.task
    save_results_to_csv(result, args.output_csv)
    print(result)
    return result


def main(argv=None, regression: bool = False,
         config_name: str = "saprot_sweep_xgboost_cls.yaml"):
    argv = list(sys.argv[1:] if argv is None else argv)
    if any(a.startswith("--") for a in argv):
        return main_flags(argv, regression=regression)
    return main_config(argv, config_name)


if __name__ == "__main__":
    main()
