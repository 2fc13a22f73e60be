#!/usr/bin/env python
"""Fused host+device pipeline benchmark (VERDICT r1 #5).

Streams real bucketed batches from the HDF5/tokenizer pipeline (the host hot
loop the reference pays per-sample h5py opens for, reference
src/data/datasets/text_dataset.py:43) through the production train step, and
reports:
  - pairs/s end-to-end (host pipeline + device step, prefetch overlapped)
  - pairs/s device-only (same batches, pre-collated)
  - input-stall % = how much the host pipeline slows the fused loop

Prints ONE JSON line. The headline driver benchmark is bench.py; this one
exists to prove the host pipeline keeps the chip fed.

Env: BENCH_HUB/BENCH_TOWER/BENCH_N/BENCH_BATCH as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

HUB = os.environ.get("BENCH_HUB", "facebook/esm2_t33_650M_UR50D")
TOWER = os.environ.get("BENCH_TOWER", "facebook/esm2_t12_35M_UR50D")
N_TRAIN = int(os.environ.get("BENCH_N", 512))
BATCH = int(os.environ.get("BENCH_BATCH", 16))
BUCKETS = [int(x) for x in
           os.environ.get("BENCH_BUCKETS", "256,512,1024").split(",")]
DATA_DIR = os.environ.get("BENCH_DATA_DIR", "/tmp/oneprot_bench_fixtures")


def main() -> None:
    import jax

    from oneprot_tpu.core.mesh import enable_compilation_cache

    enable_compilation_cache()

    from oneprot_tpu.data.datamodule import DataLoader
    from oneprot_tpu.data.datasets.struct_token_dataset import (
        StructTokenDataset,
    )
    from oneprot_tpu.data.synthetic import generate_fixtures
    from oneprot_tpu.models.encoders import (
        create_sequence_encoder,
        create_struct_token_encoder,
    )
    from oneprot_tpu.train.module import OneProtModule
    from oneprot_tpu.train.optim import adam

    t0 = time.time()
    generate_fixtures(DATA_DIR, n_train=N_TRAIN, n_eval=8,
                      seq_len_range=(30, 1000),
                      modalities=["struct_token"])
    print(f"# fixtures ({N_TRAIN} proteins, 30-1000aa) {time.time()-t0:.1f}s",
          file=sys.stderr)

    dataset = StructTokenDataset(DATA_DIR, os.path.join(DATA_DIR, "train_saprot.h5"), "train",
                                 buckets=BUCKETS)
    loader = DataLoader(dataset, batch_size=BATCH, shuffle=True, seed=0,
                        drop_last=True, prefetch=2, num_workers=4)

    module = OneProtModule(
        components={
            "sequence": create_sequence_encoder(
                model_name_or_path=HUB, output_dim=1024, proj_type="mlp",
                frozen=True, dtype="bfloat16"),
            "struct_token": create_struct_token_encoder(
                model_name_or_path=TOWER, output_dim=1024, dtype="bfloat16"),
        },
        optimizer=lambda: adam(1e-3), loss_fn="CLIP",
        use_l1_regularization=True)

    t0 = time.time()
    first = next(iter(loader))
    state = module.init({"struct_token": (first[0][:2], first[1][:2])})
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    # ---- host-only pass (collate throughput) -----------------------------
    t0 = time.time()
    batches = []
    for seq_in, mod_in, _, _ in loader:
        batches.append((seq_in, mod_in))
    host_time = time.time() - t0
    pairs = sum(b[0].shape[0] for b in batches)
    shapes = sorted({b[0].shape for b in batches})
    print(f"# host-only: {pairs} pairs in {host_time:.2f}s "
          f"({pairs/host_time:.1f} pairs/s) shapes={shapes}",
          file=sys.stderr)

    # ---- pod-scale demand model (VERDICT r2 #5) --------------------------
    # A v5e-8 host must feed 8 chips. Measure the strictly-sequential
    # per-core collate rate (no threads, no prefetch), then compute how many
    # host cores the pod needs at 8x the per-chip demand. Collate releases
    # the GIL in numpy/h5py/the C++ tokenizer, so cores scale ~linearly;
    # a v5e-8 host exposes ~100+ vCPUs.
    seq_loader = DataLoader(dataset, batch_size=BATCH, shuffle=True, seed=1,
                            drop_last=True, prefetch=0, num_workers=1)
    t0 = time.time()
    seq_pairs = 0
    for seq_in, _, _, _ in seq_loader:
        seq_pairs += seq_in.shape[0]
    per_core = seq_pairs / (time.time() - t0)
    # per-chip demand: cached steady-state is the worst case for the host
    # (BENCH_r* cached ~340 pairs/s/chip; cold ~127)
    demand_cached = 8 * float(os.environ.get("BENCH_CHIP_CACHED", 340.0))
    demand_cold = 8 * float(os.environ.get("BENCH_CHIP_COLD", 127.0))
    cores_cached = demand_cached / per_core
    cores_cold = demand_cold / per_core
    print(f"# pod-8 demand model: {per_core:.1f} pairs/s/core sequential -> "
          f"{cores_cold:.1f} cores (cold) / {cores_cached:.1f} cores "
          f"(cached steady-state) of a ~100-vCPU v5e-8 host",
          file=sys.stderr)

    # ---- warm up one compile per bucket shape ----------------------------
    t0 = time.time()
    seen = set()
    for seq_in, mod_in in batches:
        if seq_in.shape[1] not in seen:
            seen.add(seq_in.shape[1])
            state, loss = module.train_step(state, "struct_token", seq_in,
                                            mod_in)
    float(loss)
    print(f"# compile {len(seen)} bucket shapes {time.time()-t0:.1f}s",
          file=sys.stderr)

    # ---- device-only (pre-collated batches) ------------------------------
    t0 = time.time()
    for seq_in, mod_in in batches:
        state, loss = module.train_step(state, "struct_token", seq_in, mod_in)
    float(loss)
    device_time = time.time() - t0
    print(f"# device-only: {pairs/device_time:.1f} pairs/s "
          f"({device_time/len(batches)*1000:.0f} ms/step)", file=sys.stderr)

    # ---- fused: host pipeline feeding the device loop --------------------
    t0 = time.time()
    n = 0
    for seq_in, mod_in, _, _ in loader:
        state, loss = module.train_step(state, "struct_token", seq_in, mod_in)
        n += seq_in.shape[0]
    float(loss)
    fused_time = time.time() - t0
    stall = max(0.0, (fused_time - device_time) / fused_time)
    print(f"# fused: {n/fused_time:.1f} pairs/s, input stall "
          f"{stall*100:.1f}%", file=sys.stderr)

    print(json.dumps({
        "metric": "e2e pairs/sec/chip (host HDF5+tokenize pipeline fused "
                  "with train step)",
        "value": round(n / fused_time, 2),
        "unit": "pairs/s/chip",
        "input_stall_pct": round(stall * 100, 1),
        "device_only_pairs_per_sec": round(pairs / device_time, 2),
        "host_only_pairs_per_sec": round(pairs / host_time, 2),
        "host_pairs_per_sec_per_core": round(per_core, 2),
        "pod8_host_cores_needed_cold": round(cores_cold, 1),
        "pod8_host_cores_needed_cached": round(cores_cached, 1),
    }))


if __name__ == "__main__":
    main()
