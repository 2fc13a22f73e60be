#!/usr/bin/env python
"""Verify the JAX MSA-Transformer against REAL fair-esm msa1b weights.

Closes the remaining MSA-1b numerics risk (docs/ARCHITECTURE.md "Known
risks"): this repo's tower is pinned against an independent torch oracle
(tests/test_msa_oracle.py) and a committed golden
(tests/test_msa_golden.py), but both sides of that check were written
from the same reading of the fair-esm spec. This script is the closure a
user WITH fair-esm and the real checkpoint runs once:

    pip install fair-esm
    python scripts/verify_msa1b.py /path/to/esm_msa1b_t12_100M_UR50S.pt

It runs the real fair-esm MSATransformer (repr_layers=[12], the exact
call the reference makes — reference src/models/components/
msa_encoder.py:18-49), converts the SAME state dict through
`convert_msa1b_state_dict`, runs this repo's flax tower on the same
tokens, and compares. PASS is recorded to scripts/msa1b_verification.json
so the result ships with the repo.

Not runnable in the build environment (fair-esm + the 1.3 GB checkpoint
are unavailable there) — that is exactly why it exists.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# deterministic demo MSA (3 rows x 23 cols of standard AAs)
MSA = [
    ("query", "MKTAYIAKQRQISFVKSHFSRQL"),
    ("hom1", "MKTAYIAKQRQISFVKSHFSRQL"),
    ("hom2", "MKAAYIGKQRQISFVASHFSRQL"),
]


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    ckpt = sys.argv[1]

    try:
        import esm  # fair-esm
        import torch
    except ImportError as e:  # pragma: no cover - env without fair-esm
        print(f"FAIL: fair-esm/torch not importable ({e}). "
              "Run `pip install fair-esm` first.")
        return 1

    model, alphabet = esm.pretrained.load_model_and_alphabet_local(ckpt)
    model = model.eval()
    batch_converter = alphabet.get_batch_converter()
    _, _, tokens = batch_converter([MSA])  # [1, R, L+cls]
    with torch.no_grad():
        want = model(tokens, repr_layers=[12])["representations"][12]
    want = want.numpy()

    import jax.numpy as jnp

    from oneprot_tpu.models.hf_convert import convert_msa1b_state_dict
    from oneprot_tpu.models.msa_transformer import (
        MsaTransformer,
        MsaTransformerConfig,
    )

    params = convert_msa1b_state_dict(model.state_dict(), 12)
    cfg = MsaTransformerConfig()  # defaults ARE the msa1b layout
    got = np.asarray(MsaTransformer(cfg).apply(
        {"params": params}, jnp.asarray(tokens.numpy().astype(np.int32))))

    max_abs = float(np.max(np.abs(got - want)))
    denom = np.maximum(np.abs(want), 1e-3)
    max_rel = float(np.max(np.abs(got - want) / denom))
    ok = max_abs < 5e-4 and max_rel < 5e-3
    record = {
        "checkpoint": os.path.basename(ckpt),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "max_abs_err": max_abs,
        "max_rel_err": max_rel,
        "result": "PASS" if ok else "FAIL",
        "fair_esm_version": getattr(esm, "__version__", "unknown"),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "msa1b_verification.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(f"{record['result']}: max_abs={max_abs:.2e} max_rel={max_rel:.2e} "
          f"-> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
