"""Microbenchmark: fuse the GELU -> act-quant epilogue between fc1 and fc2.

docs/PERFORMANCE.md roadmap: the int8 hub MLP (fc1 int8 -> gelu -> fc2
int8) pays extra HBM passes over the [T, 4H] f32 intermediate because
fc2's per-token activation quantization needs a cross-column abs-max
BEFORE the quantized write:

  V0 production:  dot+dequant -> gelu write G; absmax read G; quant read G
  V2 rowmax-bound: the scale can be derived from the PRE-gelu row max —
      |gelu| over a row is bounded tightly by max(gelu(max(y,0)), 0.17)
      (gelu is increasing on y>0 and |gelu|<=0.17 on y<0), so the reduce
      can fuse into the dot's dequant pass and gelu+quant becomes ONE
      read->int8-write pass. Numerically this scale is >= and usually ==
      the true abs-max, so quantization error is unchanged.
  V3 Pallas:      a fused gelu+rowmax+quant kernel: one read of the f32
      intermediate, one int8 + scales write (per-block rows live in VMEM).
  V1 static:      per-tensor calibrated scale (no reduce at all) — the
      upper bound on any act-quant saving; needs calibration to ship.

This measures all four + the fc2 dot, end to end per MLP block, at the
ESM2-650M hub shapes (T=16384 tokens, H=1280, I=5120), and checks V2/V3
quantized outputs against V0's.

Timing rules for the tunneled backend (see microbench_int8.py): sync only
via scalar float() fetch, fresh data per scan iteration via jnp.roll,
max-fold every output leaf, time K vs 2K iterations and difference.

Run: python scripts/microbench_mlp_epilogue.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, H, I = 16384, 1280, 5120


DTYPE = jnp.bfloat16  # production Int8Dense returns encoder dtype (bf16)


def int8_dot_dequant(x_q, s_x, w_q, s_w, bias):
    y = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * s_x * s_w + bias).astype(DTYPE)


def quant_rows(x):
    xf = x.astype(jnp.float32)  # production quantizes in f32 compute
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                    1e-12) / 127.0
    return jnp.round(xf / s).astype(jnp.int8), s


def mlp_v0(x, w1_q, s_w1, b1, w2_q, s_w2, b2):
    """Production Int8Dense path: quantize gelu output with its own absmax."""
    x_q, s_x = quant_rows(x)
    y = int8_dot_dequant(x_q, s_x, w1_q, s_w1, b1)
    g = jax.nn.gelu(y, approximate=False)
    g_q, s_g = quant_rows(g)
    return int8_dot_dequant(g_q, s_g, w2_q, s_w2, b2)


def mlp_v2(x, w1_q, s_w1, b1, w2_q, s_w2, b2):
    """Rowmax-bound: fc2's act scale from the PRE-gelu row max, so the
    reduce fuses with the dot epilogue and gelu+quant is one pass."""
    x_q, s_x = quant_rows(x)
    y = int8_dot_dequant(x_q, s_x, w1_q, s_w1, b1)
    m = jnp.max(y.astype(jnp.float32), axis=-1, keepdims=True)
    s_g = jnp.maximum(jax.nn.gelu(m, approximate=False), 0.17) / 127.0
    g = jax.nn.gelu(y.astype(jnp.float32), approximate=False)
    g_q = jnp.round(g / s_g).astype(jnp.int8)
    return int8_dot_dequant(g_q, s_g, w2_q, s_w2, b2)


def mlp_v1(x, w1_q, s_w1, b1, w2_q, s_w2, b2, s_static):
    """Static per-tensor act scale (upper bound on the saving)."""
    x_q, s_x = quant_rows(x)
    y = int8_dot_dequant(x_q, s_x, w1_q, s_w1, b1)
    g_q = jnp.round(jax.nn.gelu(y.astype(jnp.float32), approximate=False)
                    / s_static).astype(jnp.int8)
    return int8_dot_dequant(g_q, jnp.full((T, 1), s_static), w2_q, s_w2, b2)


def gelu_quant_pallas(y, *, bm=256):
    """Fused gelu -> per-row absmax -> int8 quant; one HBM read, one
    int8 + scales write."""
    M, N = y.shape

    def erf_poly(x):
        # Abramowitz-Stegun 7.1.26, |err| < 1.5e-7 — far below the int8
        # quantization step (~8e-3); Pallas lowers neither erf nor erfc
        a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
        a4, a5, p = -1.453152027, 1.061405429, 0.3275911
        ax = jnp.abs(x)
        t = 1.0 / (1.0 + p * ax)
        poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
        return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))

    def kernel(y_ref, q_ref, s_ref):
        yf = y_ref[:].astype(jnp.float32)
        g = 0.5 * yf * (1.0 + erf_poly(yf * (2.0 ** -0.5)))
        s = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True),
                        1e-12) / 127.0
        q_ref[:] = jnp.round(g / s).astype(jnp.int8)
        s_ref[:] = s

    return pl.pallas_call(
        kernel,
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((bm, N), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((bm, N), lambda i: (i, 0)),
                   pl.BlockSpec((bm, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((M, N), jnp.int8),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=8 * M * N, bytes_accessed=M * N * 5 + M * 4,
            transcendentals=M * N),
    )(y)


def mlp_v3(x, w1_q, s_w1, b1, w2_q, s_w2, b2):
    x_q, s_x = quant_rows(x)
    y = int8_dot_dequant(x_q, s_x, w1_q, s_w1, b1)
    g_q, s_g = gelu_quant_pallas(y)
    return int8_dot_dequant(g_q, s_g, w2_q, s_w2, b2)


def make_inputs():
    @jax.jit
    def gen(key):
        kx, k1, k2 = jax.random.split(key, 3)
        x = jax.random.normal(kx, (T, H), jnp.float32).astype(DTYPE)
        w1 = jax.random.normal(k1, (H, I), jnp.float32) * 0.02
        w2 = jax.random.normal(k2, (I, H), jnp.float32) * 0.02
        s_w1 = jnp.abs(w1).max(axis=0, keepdims=True) / 127.0
        s_w2 = jnp.abs(w2).max(axis=0, keepdims=True) / 127.0
        w1_q = jnp.round(w1 / s_w1).astype(jnp.int8)
        w2_q = jnp.round(w2 / s_w2).astype(jnp.int8)
        return (x, w1_q, s_w1, jnp.zeros((I,), jnp.float32),
                w2_q, s_w2, jnp.zeros((H,), jnp.float32))

    out = gen(jax.random.key(0))
    for a in out:
        float(a.reshape(-1)[0])
    return out


def timed_scan(fn, args, iters):
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(a, n):
        def body(carry, i):
            first = jnp.roll(a[0], i, axis=0)
            o = fn(first, *a[1:])
            return jnp.maximum(carry, o.astype(jnp.float32).max()), None

        tot, _ = jax.lax.scan(body, jnp.float32(-jnp.inf),
                              jnp.arange(n, dtype=jnp.int32))
        return tot

    float(many(args, iters))
    t0 = time.perf_counter()
    r = float(many(args, iters))
    return time.perf_counter() - t0, r


def bench(fn, args, iters=16):
    t1, r1 = timed_scan(fn, args, iters)
    t2, r2 = timed_scan(fn, args, 2 * iters)
    assert r1 == r2
    return (t2 - t1) / iters


def main():
    args = make_inputs()
    x = args[0]

    # numerics first: V2/V3 vs V0 on the same inputs
    v0 = np.asarray(jax.jit(mlp_v0)(*args), np.float32)
    v2 = np.asarray(jax.jit(mlp_v2)(*args), np.float32)
    v3 = np.asarray(jax.jit(mlp_v3)(*args), np.float32)
    ref = None  # float reference for scale-quality context

    def rel(a, b):
        return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-9))

    cos2 = float((v0 * v2).sum()
                 / (np.linalg.norm(v0) * np.linalg.norm(v2) + 1e-9))
    cos3 = float((v0 * v3).sum()
                 / (np.linalg.norm(v0) * np.linalg.norm(v3) + 1e-9))
    print(f"numerics: V2 vs V0 max-rel {rel(v2, v0):.3e} cos {cos2:.6f}; "
          f"V3 vs V0 max-rel {rel(v3, v0):.3e} cos {cos3:.6f}", flush=True)

    for name, fn, extra in [
        ("V0 production (gelu absmax quant)", mlp_v0, ()),
        ("V2 rowmax-bound scale", mlp_v2, ()),
        ("V3 Pallas fused gelu+quant", mlp_v3, ()),
        ("V1 static scale (upper bound)", mlp_v1, (0.05,)),
    ]:
        t = bench(lambda *a: fn(*a, *extra), args)
        print(f"{name}: {t*1e3:7.3f} ms/block", flush=True)


if __name__ == "__main__":
    main()
