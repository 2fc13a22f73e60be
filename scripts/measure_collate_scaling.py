#!/usr/bin/env python
"""Measure (not model) host-side parallel collate scaling (VERDICT r2 #7).

Runs the real collate hot loop (HDF5 reads + tokenization via the C++ fast
path + graph building/kNN — the work the reference pays per-sample h5py
opens for, reference src/data/datasets/text_dataset.py:43) from 1, 2 and 4
concurrent threads and reports the achieved AGGREGATE rate vs the 1-thread
rate. On a 1-vCPU box the ceiling is ~1.0x by construction; what the
measurement establishes is whether the Python layers SERIALIZE the threads
beyond the CPU limit (aggregate well below 1.0x would mean GIL contention
— retries/locking — is destroying concurrency, and per-core x cores
extrapolation to a ~100-core pod host would be invalid).

Prints one JSON line per modality:
  {"modality", "threads": {"1": r1, "2": r2, "4": r4}, "agg_vs_1thread"}
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA_DIR = os.environ.get("BENCH_DATA_DIR", "/tmp/oneprot_collate_fixtures")
SECONDS = float(os.environ.get("COLLATE_BENCH_S", 6.0))
BATCH = int(os.environ.get("COLLATE_BENCH_BATCH", 16))


def measure(dataset, n_threads: int, seconds: float) -> float:
    """Aggregate items/s from n_threads looping the real collate_fn."""
    n = dataset.num_items()
    stop = time.time() + seconds
    counts = [0] * n_threads
    errors = []

    def worker(t: int) -> None:
        rng = np.random.RandomState(1000 + t)
        try:
            while time.time() < stop:
                idx = rng.randint(0, n, size=BATCH)
                items = [dataset[int(i)] for i in idx]
                dataset.collate_fn(items,
                                   rng=np.random.RandomState(counts[t]))
                counts[t] += BATCH
        except Exception as e:  # surfaced below
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,), daemon=True)
               for t in range(n_threads)]
    t0 = time.time()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if errors:
        raise errors[0]
    return sum(counts) / (time.time() - t0)


def main() -> None:
    from oneprot_tpu.data.synthetic import ensure_fixtures

    ensure_fixtures(DATA_DIR, n_train=256)

    from oneprot_tpu.data.datasets.struct_graph_dataset import StructDataset
    from oneprot_tpu.data.datasets.struct_token_dataset import (
        StructTokenDataset,
    )
    from oneprot_tpu.data.datasets.text_dataset import TextDataset

    datasets = {
        "text": TextDataset(DATA_DIR, "train"),
        "struct_token": StructTokenDataset(
            DATA_DIR, os.path.join(DATA_DIR, "train_saprot.h5"), "train"),
        "struct_graph": StructDataset(DATA_DIR, "train"),
    }
    for name, ds in datasets.items():
        rates = {}
        for t in (1, 2, 4):
            # short warmup so thread-local h5 handles/tokenizer tables are up
            measure(ds, t, 0.5)
            rates[str(t)] = round(measure(ds, t, SECONDS), 1)
        print(json.dumps({
            "modality": name,
            "threads": rates,
            "agg_vs_1thread": {k: round(v / rates["1"], 2)
                               for k, v in rates.items()},
            "host_cpus": os.cpu_count(),
        }), flush=True)


if __name__ == "__main__":
    main()
