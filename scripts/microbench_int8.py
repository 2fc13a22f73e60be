"""Microbenchmark: can a Pallas int8 GEMM beat XLA's bf16 dot on v5e?

Round-1 finding (docs/PERFORMANCE.md "Measured and rejected"): XLA lowers an
int8 x int8 -> int32 dot_general at bf16 rate (~207 TF/s vs 217 bf16 peak),
so Int8Dense was shelved. VERDICT round-2 item #1(a): try a hand-written
Pallas kernel instead — v5e MXU int8 peak is ~394 TOPS, 2x bf16.

Shapes: the ESM2-650M hub GEMMs at the L=1024 bucket (M=16384 tokens):
  qkv/o: 16384 x 1280 x 1280
  fc1:   16384 x 1280 x 5120
  fc2:   16384 x 5120 x 1280

Timing notes for this tunneled backend (axon): block_until_ready is lazy —
sync ONLY via a scalar float() fetch; host->device upload is slow — generate
all data on device; per-call RTT is large — time K and 2K scan iterations
and use the difference.

Run: python scripts/microbench_int8.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_int8_matmul(x_q, w_q, *, bm=512, bn=1024, bk=1280, out_dtype=jnp.int32):
    """x_q [M, K] int8 @ w_q [K, N] int8 -> [M, N] int32."""
    M, K = x_q.shape
    K2, N = w_q.shape
    assert K == K2
    bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
    assert M % bm == 0 and N % bn == 0 and K % bk == 0, (M, N, K, bm, bn, bk)

    def kernel(x_ref, w_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _zero():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(
            x_ref[:], w_ref[:], preferred_element_type=jnp.int32
        )

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _emit():
            o_ref[:] = acc_ref[:].astype(out_dtype)

    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=M * K + K * N + M * N * 4,
            transcendentals=0,
        ),
    )(x_q, w_q)


def pallas_int8_matmul_dequant(x_q, sx, w_q, sw, *, bm=512, bn=1024, bk=1280,
                               out_dtype=jnp.bfloat16):
    """int8 GEMM with fused dequant epilogue: (x_q@w_q) * sx[:,None] * sw[None,:].

    sx [M,1] f32 per-token scales; sw [1,N] f32 per-channel scales.
    """
    M, K = x_q.shape
    K2, N = w_q.shape
    assert K == K2
    bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
    assert M % bm == 0 and N % bn == 0 and K % bk == 0

    def kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _zero():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(
            x_ref[:], w_ref[:], preferred_element_type=jnp.int32
        )

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _emit():
            o_ref[:] = (
                acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
            ).astype(out_dtype)

    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0,
        ),
    )(x_q, w_q, sx, sw)


def make_inputs(M, K, N, kind):
    """Build device-resident inputs from a tiny seed (no host upload)."""

    @jax.jit
    def gen(key):
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (M, K), jnp.float32)
        w = jax.random.normal(kw, (K, N), jnp.float32)
        if kind == "bf16":
            return x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        x_q = jnp.clip(jnp.round(x * 20), -127, 127).astype(jnp.int8)
        w_q = jnp.clip(jnp.round(w * 20), -127, 127).astype(jnp.int8)
        if kind == "int8":
            return x_q, w_q
        sx = jnp.abs(x).max(axis=1, keepdims=True) / 127.0
        sw = jnp.abs(w).max(axis=0, keepdims=True) / 127.0
        return x_q, sx, w_q, sw

    out = gen(jax.random.key(0))
    # force materialization
    for a in out:
        float(a.reshape(-1)[0])
    return out


def timed_scan(fn, args, iters):
    """Scan `iters` applications of fn with a per-iteration roll of arg0 so
    nothing can be hoisted; max-fold the output; sync via scalar fetch."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(a, n):
        def body(carry, i):
            first = jnp.roll(a[0], i, axis=0)
            o = fn(first, *a[1:])
            return jnp.maximum(carry, o.astype(jnp.float32).max()), None

        tot, _ = jax.lax.scan(body, jnp.float32(-jnp.inf),
                              jnp.arange(n, dtype=jnp.int32))
        return tot

    float(many(args, iters))  # warmup/compile for this n
    t0 = time.perf_counter()
    r = float(many(args, iters))
    return time.perf_counter() - t0, r


def bench(fn, args, iters=32):
    t1, r1 = timed_scan(fn, args, iters)
    t2, r2 = timed_scan(fn, args, 2 * iters)
    assert r1 == r2
    return (t2 - t1) / iters  # per-iteration, fixed overhead cancelled


def main():
    shapes = [
        ("qkv/o", 16384, 1280, 1280),
        ("fc1", 16384, 1280, 5120),
        ("fc2", 16384, 5120, 1280),
    ]
    for name, M, K, N in shapes:
        tflop = 2 * M * N * K / 1e12

        xb, wb = make_inputs(M, K, N, "bf16")
        t = bench(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            (xb, wb))
        print(f"{name} [{M}x{K}x{N}] XLA bf16:        "
              f"{t*1e3:7.3f} ms  {tflop/t:6.1f} TF/s", flush=True)
        del xb, wb

        x_q, w_q = make_inputs(M, K, N, "int8")
        t = bench(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32),
            (x_q, w_q))
        print(f"{name} [{M}x{K}x{N}] XLA int8:        "
              f"{t*1e3:7.3f} ms  {tflop/t:6.1f} TF/s", flush=True)

        best = None
        for bm, bn, bk in [(512, 1024, 1280), (1024, 512, 1280),
                           (512, 512, 1280), (512, 1280, 1280),
                           (512, 640, 1280), (256, 1280, 2560)]:
            if N % bn or M % bm or K % bk:
                continue
            try:
                t = bench(functools.partial(
                    pallas_int8_matmul, bm=bm, bn=bn, bk=bk), (x_q, w_q))
                print(f"{name} [{M}x{K}x{N}] Pallas int8 "
                      f"({bm},{bn},{bk}): {t*1e3:7.3f} ms  "
                      f"{tflop/t:6.1f} TF/s", flush=True)
                if best is None or t < best[0]:
                    best = (t, (bm, bn, bk))
            except Exception as e:
                print(f"{name} Pallas ({bm},{bn},{bk}) FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        del x_q, w_q

        if best is not None:
            bm, bn, bk = best[1]
            xd, sx, wd, sw = make_inputs(M, K, N, "deq")
            try:
                t = bench(
                    lambda a, s, b, v: pallas_int8_matmul_dequant(
                        a, s, b, v, bm=bm, bn=bn, bk=bk),
                    (xd, sx, wd, sw))
                print(f"{name} [{M}x{K}x{N}] Pallas int8+deq "
                      f"({bm},{bn},{bk}): {t*1e3:7.3f} ms  "
                      f"{tflop/t:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{name} Pallas dequant FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
            del xd, sx, wd, sw


if __name__ == "__main__":
    main()
