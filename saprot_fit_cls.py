#!/usr/bin/env python
"""Boosted-classifier downstream probe (reference src/saprot_fit_cls.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oneprot_tpu.downstream.boosters import fit_booster, make_classifier  # noqa: E402
from oneprot_tpu.downstream.utils import load_data, save_results_to_csv  # noqa: E402


def main(argv=None, regression: bool = False):
    p = argparse.ArgumentParser()
    p.add_argument("--embeddings-dir", required=True)
    p.add_argument("--task", required=True)
    p.add_argument("--output-csv", default="booster_results.csv")
    p.add_argument("--n-estimators", type=int, default=500)
    p.add_argument("--max-depth", type=int, default=6)
    p.add_argument("--learning-rate", type=float, default=0.1)
    args = p.parse_args(argv)

    splits = {}
    for split in ("train", "valid", "test"):
        path = os.path.join(args.embeddings_dir,
                            f"{args.task}_{split}_embeddings_labels.npz")
        splits[split] = load_data(path)

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


if __name__ == "__main__":
    main()
