#!/usr/bin/env python
"""MLP downstream probe entry (reference src/saprot_fit_mlp.py).

Config-driven (reference-style, composes configs/saprot_mlp.yaml —
reference configs/saprot_mlp.yaml:1, src/saprot_fit_mlp.py:334-400):

    python saprot_fit_mlp.py emb_dir=<dir> task_name=EC \
        model.learning_rate=0.01 'sweep.learning_rate=[0.001,0.01]'

Legacy flag form still works:

    python saprot_fit_mlp.py --embeddings-dir <dir> --task EC ...

Expects `{task}_{split}_embeddings_labels.npz` files produced by
collect_embeddings.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oneprot_tpu.downstream.mlp_probe import (  # noqa: E402
    MLPProbeConfig,
    fit_mlp_probe,
    sweep_mlp_probe,
)
from oneprot_tpu.downstream.utils import load_data, save_results_to_csv  # noqa: E402

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "configs")

# reference saprot_mlp.yaml model-key names -> MLPProbeConfig fields
_KEYMAP = {
    "learning_rate": "lr",
    "dropout_rate": "dropout",
    "hidden_dims": "hidden_dims",
    "batch_size": "batch_size",
    "max_epochs": "max_epochs",
    "early_stopping_patience": "patience",
    "weight_decay": "weight_decay",
}


def _load_splits(emb_dir: str, task: str, splits, threshold=None):
    out = {}
    thr = None if threshold in (None, "null", "") else float(threshold)
    for split in splits:
        path = os.path.join(emb_dir, f"{task}_{split}_embeddings_labels.npz")
        out[split] = load_data(path, binarize_threshold=thr)
    return out


def main_config(argv):
    from oneprot_tpu.core.config import load_config, to_plain

    cfg = to_plain(load_config(CONFIG_DIR, "saprot_mlp.yaml", overrides=argv))
    task = cfg["task_name"]
    splits = _load_splits(cfg["emb_dir"], task,
                          cfg.get("evaluate_on", ["train", "valid", "test"]),
                          cfg.get("threshold"))
    base_kwargs = {}
    for ref_key, field in _KEYMAP.items():
        if ref_key in cfg.get("model", {}):
            base_kwargs[field] = cfg["model"][ref_key]
    base = MLPProbeConfig(**base_kwargs)

    sweep = {_KEYMAP.get(k, k): v for k, v in (cfg.get("sweep") or {}).items()}
    if sweep:
        results = sweep_mlp_probe(splits["train"], splits["valid"],
                                  splits["test"], task, sweep=sweep,
                                  base=base)
    else:
        results = [fit_mlp_probe(splits["train"], splits["valid"],
                                 splits["test"], task, base)]
    results_dir = cfg.get("results_dir", ".")
    os.makedirs(results_dir, exist_ok=True)
    out_csv = os.path.join(results_dir, f"{task}_mlp_results.csv")
    for r in results:
        r["task"] = task
        r["model_type"] = cfg.get("model_type", "oneprot")
        save_results_to_csv(r, out_csv)
        print(r)
    return results


def main_flags(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--embeddings-dir", required=True)
    p.add_argument("--task", required=True)
    p.add_argument("--output-csv", default="mlp_probe_results.csv")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max-epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--hidden-dims", type=int, nargs="*", default=[512])
    p.add_argument("--sweep-lr", type=float, nargs="*", default=None)
    args = p.parse_args(argv)

    splits = _load_splits(args.embeddings_dir, args.task,
                          ("train", "valid", "test"))
    base = MLPProbeConfig(hidden_dims=args.hidden_dims, lr=args.lr,
                          batch_size=args.batch_size,
                          max_epochs=args.max_epochs)
    if args.sweep_lr:
        results = sweep_mlp_probe(splits["train"], splits["valid"],
                                  splits["test"], args.task,
                                  sweep={"lr": args.sweep_lr}, base=base)
    else:
        results = [fit_mlp_probe(splits["train"], splits["valid"],
                                 splits["test"], args.task, base)]
    for r in results:
        r["task"] = args.task
        save_results_to_csv(r, args.output_csv)
        print(r)
    return results


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if any(a.startswith("--") for a in argv):
        return main_flags(argv)
    return main_config(argv)


if __name__ == "__main__":
    main()
