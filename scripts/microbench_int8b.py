"""Round 2 of the int8 microbench: realistic end-to-end dense-layer costs.

Times the FULL Int8 dense path (act-quant + GEMM + dequant epilogue + bias)
vs the bf16 nn.Dense path, plus kernel variants for fc1 (where the naive
Pallas config lost to XLA). See microbench_int8.py for timing-method notes.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench_int8 import (bench, make_inputs, pallas_int8_matmul,
                             pallas_int8_matmul_dequant)


def act_quant(x):
    """Per-row symmetric abs-max quantization of activations (bf16 -> int8)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.abs(xf).max(axis=-1, keepdims=True) / 127.0, 1e-12)
    return jnp.round(xf / s).astype(jnp.int8), s


def xla_int8_full(x, w_q, sw, bias):
    """XLA path: act-quant + int8 dot + fused dequant epilogue + bias."""
    x_q, sx = act_quant(x)
    y = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * sw + bias).astype(jnp.bfloat16)


def pallas_int8_full(x, w_q, sw, bias, *, bm, bn, bk):
    x_q, sx = act_quant(x)
    return pallas_int8_matmul_dequant(x_q, sx, w_q, sw, bm=bm, bn=bn, bk=bk
                                      ) + bias.astype(jnp.bfloat16)


def bf16_dense(x, w, bias):
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y + bias).astype(jnp.bfloat16)


def main():
    shapes = [
        ("qkv/o", 16384, 1280, 1280),
        ("fc1", 16384, 1280, 5120),
        ("fc2", 16384, 5120, 1280),
    ]
    for name, M, K, N in shapes:
        tflop = 2 * M * N * K / 1e12

        @jax.jit
        def gen(key):
            kx, kw = jax.random.split(key)
            x = jax.random.normal(kx, (M, K), jnp.bfloat16)
            w = jax.random.normal(kw, (K, N), jnp.float32)
            sw = jnp.maximum(jnp.abs(w).max(axis=0, keepdims=True) / 127.0,
                             1e-12)
            w_q = jnp.round(w / sw).astype(jnp.int8)
            bias = jax.random.normal(jax.random.key(2), (N,), jnp.float32)
            return x, w.astype(jnp.bfloat16), w_q, sw, bias

        x, w, w_q, sw, bias = gen(jax.random.key(0))
        for a in (x, w, w_q, sw, bias):
            float(a.reshape(-1)[0])

        t = bench(lambda a: bf16_dense(a, w, bias), (x,))
        print(f"{name} bf16 dense full:   {t*1e3:7.3f} ms  "
              f"{tflop/t:6.1f} TF/s", flush=True)

        t = bench(lambda a: xla_int8_full(a, w_q, sw, bias), (x,))
        print(f"{name} XLA int8 full:     {t*1e3:7.3f} ms  "
              f"{tflop/t:6.1f} TF/s", flush=True)

        cands = {
            (16384, 1280, 1280): [(512, 1280, 1280)],
            (16384, 1280, 5120): [(2048, 512, 1280), (512, 2560, 1280),
                                  (256, 5120, 1280), (1024, 1024, 1280)],
            (16384, 5120, 1280): [(256, 1280, 2560), (512, 1280, 2560),
                                  (512, 1280, 1280), (1024, 1280, 2560)],
        }[(M, K, N)]
        for bm, bn, bk in cands:
            try:
                t = bench(lambda a: pallas_int8_full(
                    a, w_q, sw, bias, bm=bm, bn=bn, bk=bk), (x,))
                print(f"{name} Pallas int8 full ({bm},{bn},{bk}): "
                      f"{t*1e3:7.3f} ms  {tflop/t:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{name} Pallas ({bm},{bn},{bk}) FAILED: "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)

        # act-quant alone (memory-bound floor)
        t = bench(lambda a: act_quant(a)[0], (x,))
        print(f"{name} act-quant alone:   {t*1e3:7.3f} ms", flush=True)
        del x, w, w_q, sw, bias


if __name__ == "__main__":
    main()
