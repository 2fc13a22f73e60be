"""Attention path shootout per bucket shape: fused Pallas kernel vs XLA.

Decomposition (scripts/decompose_step.py) showed hub fwd is nearly flat in L
at a fixed token budget (159/157/171 ms for L=256/512/1024) even though
attention FLOPs scale with L — the flash kernel loses efficiency at short L
(smaller per-program tiles, more programs). Measure both paths (fwd and
fwd+bwd) at the real bucket shapes for hub (H=20 D=64) and tower (H=20
D=24) geometries to drive a per-shape dispatch choice.

Run: python scripts/microbench_attn.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

SHAPES = [(256, 64), (512, 32), (1024, 16)]
GEOM = [(20, 64), (20, 24)]
N = 20


def timed(fn, *args, n=N):
    @jax.jit
    def many(a):
        def body(carry, i):
            out = fn(*[jnp.roll(x, i, axis=0) for x in a])
            # fold EVERY output leaf — folding only one lets XLA dead-code
            # the other gradients
            for leaf in jax.tree.leaves(out):
                carry = jnp.maximum(carry, leaf.astype(jnp.float32).max())
            return carry, None

        tot, _ = jax.lax.scan(body, jnp.float32(-jnp.inf),
                              jnp.arange(n, dtype=jnp.int32))
        return tot

    float(many(args))
    t0 = time.perf_counter()
    float(many(args))
    return (time.perf_counter() - t0) / n


def main():
    from oneprot_tpu.core.mesh import enable_compilation_cache

    enable_compilation_cache("/root/repo/.jit_cache")

    from oneprot_tpu.kernels.attention import fused_mha, reference_attention
    from oneprot_tpu.models.esm2 import apply_rotary, rotary_cos_sin

    rng = np.random.RandomState(0)
    for nh, hd in GEOM:
        for L, B in SHAPES:
            q2 = jnp.asarray(rng.randn(B, L, nh * hd), jnp.bfloat16)
            k2 = jnp.asarray(rng.randn(B, L, nh * hd), jnp.bfloat16)
            v2 = jnp.asarray(rng.randn(B, L, nh * hd), jnp.bfloat16)
            mask = np.ones((B, L), np.float32)
            mask[:, int(L * 0.78):] = 0.0
            bias = jnp.asarray((1.0 - mask)[:, None, None, :] * -1e9)
            cos, sin = rotary_cos_sin(L, hd, dtype=jnp.bfloat16)
            g = jnp.asarray(rng.randn(B, L, nh * hd), jnp.bfloat16)

            def kern(q_, k_, v_):
                out = fused_mha(q_, k_, v_, nh, bias=bias,
                                rope_cos=cos, rope_sin=sin)
                assert out is not None
                return out

            def xla(q_, k_, v_):
                def t(x):
                    return x.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)

                qh = apply_rotary(t(q_), cos, sin)
                kh = apply_rotary(t(k_), cos, sin)
                out = reference_attention(qh, kh, t(v_), bias)
                return out.transpose(0, 2, 1, 3).reshape(B, L, nh * hd)

            def loss_of(f):
                return lambda q_, k_, v_: (
                    f(q_, k_, v_).astype(jnp.float32)
                    * g.astype(jnp.float32)).sum()

            res = {}
            for name, f in (("kern", kern), ("xla", xla)):
                res[f"{name}_fwd"] = timed(f, q2, k2, v2)
                grad_f = jax.grad(loss_of(f), argnums=(0, 1, 2))
                res[f"{name}_fb"] = timed(
                    lambda q_, k_, v_: grad_f(q_, k_, v_), q2, k2, v2)
            print(f"H={nh} D={hd} L={L} B={B}: "
                  f"kern fwd={res['kern_fwd']*1e3:6.2f} "
                  f"fwd+bwd={res['kern_fb']*1e3:6.2f} | "
                  f"xla fwd={res['xla_fwd']*1e3:6.2f} "
                  f"fwd+bwd={res['xla_fb']*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
