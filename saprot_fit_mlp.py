#!/usr/bin/env python
"""MLP downstream probe entry (reference src/saprot_fit_mlp.py).

    python saprot_fit_mlp.py --embeddings-dir <dir> --task EC \
        [--sweep lr=0.001,0.0001 hidden_dims=512 ...]

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


def main(argv=None):
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

    splits = {}
    for split in ("train", "valid", "test"):
        path = os.path.join(args.embeddings_dir,
                            f"{args.task}_{split}_embeddings_labels.npz")
        splits[split] = load_data(path)

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


if __name__ == "__main__":
    main()
