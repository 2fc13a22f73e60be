#!/usr/bin/env python
"""Serving-path throughput on the real chip: sequences/sec through the
frozen ESM2-650M hub embedder (bf16, optional int8 GEMMs) + on-device
top-k retrieval latency.

The reference has no serving layer (SURVEY §3: eval/collect scripts only);
`oneprot_tpu/serving.py` is the TPU build's inference surface, so its
throughput is measured here the same way bench.py measures training:
realistic SwissProt-like lengths through static buckets, best-of-N timed
reps against tunnel noise.

    python scripts/bench_serving.py            # 650M hub, int8
    SERVE_QUANT=none python scripts/bench_serving.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HUB = os.environ.get("SERVE_HUB", "facebook/esm2_t33_650M_UR50D")
QUANT = os.environ.get("SERVE_QUANT", "int8")
BATCH = int(os.environ.get("SERVE_BATCH", "32"))
REPS = int(os.environ.get("SERVE_REPS", "3"))
AAS = "ACDEFGHIKLMNPQRSTVWY"


def sample_seqs(n: int, rng) -> list:
    # bench.py's length model: log-normal, median ~290aa, clipped 1024
    lens = np.clip(rng.lognormal(np.log(290.0), 0.75, n), 20, 1022).astype(int)
    return ["".join(rng.choice(list(AAS), li)) for li in lens]


def main() -> None:
    from oneprot_tpu.core.mesh import enable_compilation_cache

    enable_compilation_cache(os.environ.get("ONEPROT_JIT_CACHE"))

    import jax

    from oneprot_tpu.models.encoders import create_sequence_encoder
    from oneprot_tpu.serving import OneProtEmbedder
    from oneprot_tpu.train.module import OneProtModule
    from oneprot_tpu.train.optim import adam

    rng = np.random.RandomState(0)
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)

    components = {"sequence": create_sequence_encoder(
        model_name_or_path=HUB, output_dim=1024, proj_type="mlp",
        frozen=True, dtype="bfloat16", remat=False,
        quantize=None if QUANT in ("none", "") else QUANT)}
    module = OneProtModule(components=components,
                           optimizer=lambda: adam(1e-3), loss_fn="CLIP")
    t0 = time.time()
    module.init(module.dummy_examples())
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    emb = OneProtEmbedder(module, buckets=[256, 384, 512, 768, 1024])

    # warm every bucket's executable once (compile pass)
    warm = sample_seqs(BATCH * 5, rng)
    t0 = time.time()
    emb.embed_sequences(warm, batch_size=BATCH)
    print(f"# warm/compile pass {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    best = 0.0
    n = BATCH * 12
    for _ in range(REPS):
        seqs = sample_seqs(n, rng)
        t0 = time.time()
        feats = emb.embed_sequences(seqs, batch_size=BATCH)
        dt = time.time() - t0
        best = max(best, n / dt)
        print(f"# rep: {n} seqs in {dt:.2f}s = {n/dt:.1f} seqs/s",
              file=sys.stderr, flush=True)
    assert feats.shape == (n, 1024) and np.isfinite(feats).all()

    # on-device top-k retrieval over a 100k pool (device-resident: a host
    # numpy pool would re-upload ~400 MB per call)
    pool = jax.device_put(rng.randn(100_000, 1024).astype(np.float32))
    q = jax.device_put(feats[:BATCH])
    emb.retrieve(q, pool, k=10)           # compile
    dt_r = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        s, i = emb.retrieve(q, pool, k=10)
        dt_r = min(dt_r, time.time() - t0)
    print(f"# retrieve: {BATCH} queries x 100k pool top-10 in "
          f"{dt_r*1e3:.1f} ms", file=sys.stderr, flush=True)

    import json

    print(json.dumps({"metric": "serving seqs/sec/chip (ESM2-650M embed)",
                      "value": round(best, 1), "unit": "seqs/s",
                      "quant": QUANT}))


if __name__ == "__main__":
    main()
