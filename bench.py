#!/usr/bin/env python
"""Headline benchmark: aligned pairs/sec/chip on the production config.

Measures the reference's training hot loop (SURVEY §3.5) re-built TPU-native:
one optimizer sub-step of the seq<->struct_token pair with the **ESM2-650M
frozen hub** (bf16 compute, forward-only — the frozen tower is partitioned
out of differentiation) + trainable ESM2-35M struct-token encoder
(fwd+bwd+Adam) + CLIP InfoNCE with L1 regularizer, at sequence length 1024.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (vs_baseline denominator): the reference publishes no throughput
(BASELINE.md), so the denominator is an analytic A100 estimate of its stack
(PyTorch eager, Lightning DDP, fp32/TF32 — reference enables TF32,
train.py:97-100):
  per pair at L=1024: 650M-hub fwd ~ 2*650e6*1024 = 1.33 TFLOP
                      + 35M fwd+bwd ~ 3*2*35e6*1024 = 0.22 TFLOP
  A100 TF32 peak 156 TFLOP/s at a generous 30% eager-mode MFU = 47 TFLOP/s
  -> ~30 pairs/sec/GPU. (Real eager numbers with per-sample HDF5 collate
  would be lower; 30 is deliberately favorable to the baseline.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_PAIRS_PER_SEC = 30.0
SEQ_LEN = int(os.environ.get("BENCH_SEQ_LEN", 1024))
BATCH = int(os.environ.get("BENCH_BATCH", 16))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
HUB = os.environ.get("BENCH_HUB", "facebook/esm2_t33_650M_UR50D")
TOWER = os.environ.get("BENCH_TOWER", "facebook/esm2_t12_35M_UR50D")


def main() -> None:
    import jax

    from oneprot_tpu.models.encoders import (
        create_sequence_encoder,
        create_struct_token_encoder,
    )
    from oneprot_tpu.train.module import OneProtModule
    from oneprot_tpu.train.optim import adam

    n_chips = len(jax.devices())
    components = {
        "sequence": create_sequence_encoder(
            model_name_or_path=HUB, output_dim=1024, proj_type="mlp",
            frozen=True, dtype="bfloat16", remat=False),
        "struct_token": create_struct_token_encoder(
            model_name_or_path=TOWER, output_dim=1024, dtype="bfloat16",
            remat=REMAT),
    }
    mesh = None
    if n_chips > 1:
        from oneprot_tpu.core.mesh import make_mesh

        mesh = make_mesh(data=n_chips, model=1)
    module = OneProtModule(
        components=components, optimizer=lambda: adam(1e-3),
        loss_fn="CLIP", use_l1_regularization=True, mesh=mesh)

    rng = np.random.RandomState(0)
    def ids(vhi, seed):
        r = np.random.RandomState(seed)
        out = r.randint(4, vhi, size=(BATCH * max(n_chips, 1), SEQ_LEN)).astype(np.int32)
        out[:, 0] = 0
        out[:, -1] = 2
        return out

    seq_ids = ids(24, 0)
    st_ids = ids(54, 1)

    t0 = time.time()
    state = module.init({"struct_token": (seq_ids[:2], st_ids[:2])})
    total, trainable = module.num_params()
    print(f"# init {time.time()-t0:.1f}s params total={total/1e6:.1f}M "
          f"trainable={trainable/1e6:.1f}M chips={n_chips}", file=sys.stderr)

    # warmup / compile
    t0 = time.time()
    state, loss = module.train_step(state, "struct_token", seq_ids, st_ids)
    float(loss)
    print(f"# compile+first step {time.time()-t0:.1f}s loss={float(loss):.3f}",
          file=sys.stderr)

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.time()
    for _ in range(STEPS):
        state, loss = module.train_step(state, "struct_token", seq_ids, st_ids)
    float(loss)  # full sync (block_until_ready is lazy through axon)
    dt = time.time() - t0
    if profile_dir:
        jax.profiler.stop_trace()

    pairs_per_sec = BATCH * max(n_chips, 1) * STEPS / dt
    per_chip = pairs_per_sec / max(n_chips, 1)
    print(f"# {STEPS} steps in {dt:.2f}s ({dt/STEPS*1000:.0f} ms/step)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "aligned pairs/sec/chip (ESM2-650M hub, L=1024, bf16)",
        "value": round(per_chip, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(per_chip / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
