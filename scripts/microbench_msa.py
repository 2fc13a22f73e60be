"""Decompose the MSA sub-step cost on the real chip (VERDICT r3 #6 follow-up).

The all-modalities bench measured the MSA sub-step at 850-913 ms — 10x the
other towers — and switching the tower to bf16 moved it only ~7%, so the
cost is NOT GEMM-FLOP-bound.  This times each candidate in isolation at the
production geometry (B=16 MSAs x depth 50 x cols 256, d=768, 12 layers):

  tower_fwd   full MsaTransformer forward (bf16 and f32)
  row_qk      tied row attention QK einsum  brihd,brjhd->bhij
  row_pv      tied row attention PV einsum  bhij,brjhd->brihd
  col_attn    column attention pair of einsums (the [50x64]x[64x50]
              per-(b,l,h) small-dot suspect)
  gemms       the 12-layer equivalent dense projections over B*R*L tokens

Run: python scripts/microbench_msa.py   (real chip)
Env: MSA_VARIANTS=tower_fwd,row_qk,... to subset; MSA_B/DEPTH/COLS sizes.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from oneprot_tpu.core.mesh import enable_compilation_cache

B = int(os.environ.get("MSA_B", 16))
R = int(os.environ.get("MSA_DEPTH", 50))
L = int(os.environ.get("MSA_COLS", 256))
H = 768
NH, HD = 12, 64
LAYERS = 12
N = 10


def timed(fn, *args, n=N):
    """n iterations inside ONE jitted scan, outputs max-folded to a scalar
    that is float()-forced — the only reliable wall pattern through the
    tunneled backend (see scripts/microbench_tower_attn.py). Integer args
    roll along axis 0 per iteration so the body isn't loop-invariant."""
    @jax.jit
    def many(a):
        def body(carry, i):
            # roll direct array args (NOT param trees — rolling 100M
            # params would dominate) so the body isn't loop-invariant
            rolled = [jnp.roll(x, i, axis=0) if hasattr(x, "ndim") else x
                      for x in a]
            out = fn(*rolled)
            for leaf in jax.tree.leaves(out):
                carry = jnp.maximum(carry, leaf.astype(jnp.float32).max())
            return carry, None

        tot, _ = jax.lax.scan(body, jnp.float32(-jnp.inf),
                              jnp.arange(n, dtype=jnp.int32))
        return tot

    float(many(args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    enable_compilation_cache()
    variants = os.environ.get(
        "MSA_VARIANTS", "tower_fwd,row_qk,row_pv,col_attn,gemms").split(",")
    rng = np.random.RandomState(0)

    if "tower_fwd" in variants:
        from oneprot_tpu.models.msa_transformer import (
            MsaTransformer,
            MsaTransformerConfig,
        )

        tokens = jnp.asarray(
            rng.randint(4, 24, size=(B, R, L)).astype(np.int32))
        for dt in (jnp.bfloat16, jnp.float32):
            cfg = MsaTransformerConfig(num_layers=LAYERS, hidden_size=H,
                                       num_heads=NH, max_positions=1026)
            model = MsaTransformer(cfg, dtype=dt)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)
            t = timed(model.apply, params, tokens)
            print(f"tower_fwd {jnp.dtype(dt).name}: {t*1e3:.1f} ms")

    q5 = jnp.asarray(rng.randn(B, R, L, NH, HD), jnp.bfloat16)
    k5 = jnp.asarray(rng.randn(B, R, L, NH, HD), jnp.bfloat16)
    v5 = jnp.asarray(rng.randn(B, R, L, NH, HD), jnp.bfloat16)
    probs = jnp.asarray(rng.rand(B, NH, L, L), jnp.bfloat16)

    if "row_qk" in variants:
        t = timed(lambda q, k: jnp.einsum(
            "brihd,brjhd->bhij", q, k,
            preferred_element_type=jnp.float32), q5, k5)
        print(f"row_qk: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)")
    if "row_pv" in variants:
        t = timed(lambda p, v: jnp.einsum(
            "bhij,brjhd->brihd", p, v,
            preferred_element_type=jnp.float32), probs, v5)
        print(f"row_pv: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)")
    if "col_attn" in variants:
        def col(q, k, v):
            logits = jnp.einsum("brlhd,bslhd->blhrs", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            return jnp.einsum("blhrs,bslhd->brlhd", p, v,
                              preferred_element_type=jnp.float32)

        t = timed(col, q5, k5, v5)
        print(f"col_attn: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)")
    if "gemms" in variants:
        x = jnp.asarray(rng.randn(B * R * L, H), jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(H, 4 * H) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(4 * H, H) * 0.02, jnp.bfloat16)
        wq = jnp.asarray(rng.randn(H, H) * 0.02, jnp.bfloat16)

        def layer_gemms(x):
            # 8 square projections (row+col qkvo) + FFN pair
            for _ in range(8):
                x = x + jnp.dot(x, wq, preferred_element_type=jnp.bfloat16)
            return x + jnp.dot(
                jax.nn.gelu(jnp.dot(x, w1,
                                    preferred_element_type=jnp.bfloat16)),
                w2, preferred_element_type=jnp.bfloat16)

        t = timed(layer_gemms, x)
        print(f"gemms: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
