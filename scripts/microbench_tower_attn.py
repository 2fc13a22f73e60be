"""Tower attention at the PACKED cached-step shapes (VERDICT r3 #3).

The cached steady-state step (frozen-feature cache, epoch >= 2) is
tower-bound, and the ESM2-35M tower's d=24 heads pad to 32 lanes and run
the attention dots at <=25% MXU utilization (docs/PERFORMANCE.md). This
measures the candidate levers at the real packed shapes:

  geometry: B=32 rows, L=512, H=20, D=24 (padded d=32), ~5 segments/row
  timings:  fwd and fwd+bwd per layer, plus the packed cached train step
            for context (attention share of the step).

Run on the real chip: python scripts/microbench_tower_attn.py
Env: TOWER_ATTN_VARIANTS=baseline,xla,... to subset.
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

N = 20
B, L, H, D = 32, 512, 20, 24
SEGS = 5


def timed(fn, *args, n=N):
    @jax.jit
    def many(a):
        def body(carry, i):
            out = fn(*[jnp.roll(x, i, axis=0) if hasattr(x, 'ndim') and x.ndim
                       else x for x in a])
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


def make_inputs(rng):
    q = jnp.asarray(rng.randn(B, L, H * D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, L, H * D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, L, H * D), jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, L, H * D), jnp.bfloat16)
    # ~SEGS segments per row, contiguous, full rows (packed fill ~0.96)
    seg = np.zeros((B, L), np.int32)
    for b in range(B):
        cuts = np.sort(rng.choice(np.arange(32, L - 32), SEGS - 1,
                                  replace=False))
        bounds = np.concatenate([[0], cuts, [L]])
        for s in range(SEGS):
            seg[b, bounds[s]:bounds[s + 1]] = s
    return q, k, v, g, jnp.asarray(seg)


def main():
    enable_compilation_cache()
    from oneprot_tpu.kernels.attention import fused_mha, reference_attention
    from oneprot_tpu.models.esm2 import apply_rotary, rotary_cos_sin

    rng = np.random.RandomState(0)
    q, k, v, g, seg = make_inputs(rng)
    cos, sin = rotary_cos_sin(L, 32, dtype=jnp.bfloat16)  # d_pad=32

    variants = os.environ.get(
        "TOWER_ATTN_VARIANTS",
        "baseline,fused,chunked,fused_chunked,xla").split(",")

    def pad_half(x):
        # mirror the dispatcher's half-wise pad 24 -> 32 (rotate_half safe)
        x4 = x.reshape(B, L, H, D)
        h1, h2 = x4[..., :D // 2], x4[..., D // 2:]
        z = jnp.zeros((B, L, H, 4), x.dtype)
        return jnp.concatenate([h1, z, h2, z], -1).reshape(B, L, H * 32)

    qp, kp, vp, gp = pad_half(q), pad_half(k), pad_half(v), pad_half(g)

    # kernel variants are env-gated dispatch knobs on the SAME fused_mha
    # call (the gates read os.environ at trace time; `timed` re-jits per
    # variant): fused = block-diagonal head packing (one 128-lane QK/PV
    # dot for the G=4 head group instead of 4 d=32 dots), chunked = all 5
    # head groups in one program (fewer, fatter programs against the
    # small-dot issue floor)
    kernel_envs = {
        "baseline": {},
        "fused": {"ONEPROT_MHA_PAIRFUSE": "1"},
        "chunked": {"ONEPROT_MHA_CHUNKS": f"{L}:2"},
        "fused_chunked": {"ONEPROT_MHA_PAIRFUSE": "1",
                          "ONEPROT_MHA_CHUNKS": f"{L}:2"},
    }
    for name, env in kernel_envs.items():
        if name not in variants:
            continue
        for key, val in env.items():
            os.environ[key] = val
        try:
            def fwd(q_, k_, v_):
                out = fused_mha(q_, k_, v_, H, rope_cos=cos, rope_sin=sin,
                                segment_ids=seg)
                assert out is not None
                return out

            def loss(q_, k_, v_):
                return (fwd(q_, k_, v_).astype(jnp.float32)
                        * gp.astype(jnp.float32)).sum()

            t_f = timed(fwd, qp, kp, vp)
            t_fb = timed(jax.grad(loss, argnums=(0, 1, 2)), qp, kp, vp)
            print(f"{name} fused kernel (d=32): fwd {t_f*1e3:.2f} ms/layer,"
                  f" fwd+bwd {t_fb*1e3:.2f} ms/layer")
        finally:
            for key in env:
                os.environ.pop(key, None)

    if "xla" in variants:
        bias = jnp.where(seg[:, None, :, None] == seg[:, None, None, :],
                         0.0, -1e9)  # [B,1,L,L]

        def t4(x):
            return x.reshape(B, L, H, D).transpose(0, 2, 1, 3)

        cos24, sin24 = rotary_cos_sin(L, D, dtype=jnp.bfloat16)

        def fwd_x(q_, k_, v_):
            qh, kh, vh = t4(q_), t4(k_), t4(v_)
            qh = apply_rotary(qh, cos24, sin24)
            kh = apply_rotary(kh, cos24, sin24)
            return reference_attention(qh, kh, vh, bias)

        def loss_x(q_, k_, v_):
            return (fwd_x(q_, k_, v_).astype(jnp.float32)
                    * t4(g).astype(jnp.float32)).sum()

        t_f = timed(fwd_x, q, k, v)
        t_fb = timed(jax.grad(loss_x, argnums=(0, 1, 2)), q, k, v)
        print(f"XLA materialized-bias: fwd {t_f*1e3:.2f} ms/layer, "
              f"fwd+bwd {t_fb*1e3:.2f} ms/layer")


if __name__ == "__main__":
    main()
