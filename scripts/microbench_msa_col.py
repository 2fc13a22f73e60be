"""Sub-decompose MSA column attention: every packed/lane variant of the
full op measures ~27 ms/layer regardless of dot geometry (microbench_msa),
so the cost is NOT the [50,64]x[64,50] dots. Time the pieces:

  qk       logits einsum alone (brlhd,bslhd->blhrs)
  sm       softmax alone on a materialized [B,L,H,R,S] f32 tensor
  pv       PV einsum alone (blhrs,bslhd->brlhd)
  tr       pure layout move [B,R,L,H,D] -> [B,L,H,R,D]
  roll     the timing harness's jnp.roll overhead on q/k/v

Run: python scripts/microbench_msa_col.py  (real chip)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from oneprot_tpu.core.mesh import enable_compilation_cache
from microbench_msa import timed, B, R, L, NH, HD  # noqa: E402


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    q5 = jnp.asarray(rng.randn(B, R, L, NH, HD), jnp.bfloat16)
    k5 = jnp.asarray(rng.randn(B, R, L, NH, HD), jnp.bfloat16)
    v5 = jnp.asarray(rng.randn(B, R, L, NH, HD), jnp.bfloat16)
    logits = jnp.asarray(rng.randn(B, L, NH, R, R), jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)

    t = timed(lambda q, k: jnp.einsum(
        "brlhd,bslhd->blhrs", q, k,
        preferred_element_type=jnp.float32), q5, k5)
    print(f"qk:   {t*1e3:.2f} ms/layer-equiv")

    t = timed(lambda x: jax.nn.softmax(x, axis=-1).astype(jnp.bfloat16),
              logits)
    print(f"sm:   {t*1e3:.2f} ms/layer-equiv")

    t = timed(lambda p, v: jnp.einsum(
        "blhrs,bslhd->brlhd", p, v,
        preferred_element_type=jnp.float32), probs, v5)
    print(f"pv:   {t*1e3:.2f} ms/layer-equiv")

    t = timed(lambda q: q.transpose(0, 2, 3, 1, 4) + 0.0, q5)
    print(f"tr:   {t*1e3:.2f} ms/layer-equiv")

    t = timed(lambda q, k, v: (q + k + v).sum(), q5, k5, v5)
    print(f"roll: {t*1e3:.2f} ms/layer-equiv (harness floor: roll+reduce)")


if __name__ == "__main__":
    main()
