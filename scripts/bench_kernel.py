#!/usr/bin/env python
"""Micro-benchmark the flash-attention kernel on the real chip.

Times fwd and fwd+bwd at the production shapes (ESM2-650M hub: H=20 D=64,
ESM2-35M tower: H=20 D=24->pad64) against the XLA reference path and, when
available, jax.experimental's own TPU flash kernel.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # axon's block_until_ready is lazy; a host transfer of a scalar derived
    # from the last output fences the whole in-order device stream
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=16)
    p.add_argument("--h", type=int, default=20)
    p.add_argument("--l", type=int, default=1024)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--impl", default="pallas",
                   choices=["pallas", "xla", "both"])
    p.add_argument("--bwd", action="store_true")
    args = p.parse_args()

    B, H, L, D = args.b, args.h, args.l, args.d
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    lens = rng.randint(L // 3, L, size=(B,))
    mask = (np.arange(L)[None] < lens[:, None])
    bias = jnp.asarray(
        np.where(mask, 0.0, -1e9)[:, None, None, :], jnp.float32)

    flops_fwd = 4 * B * H * L * L * D  # QK^T + PV
    from oneprot_tpu.kernels.attention import reference_attention
    from oneprot_tpu.kernels.flash_attention import flash_attention

    impls = {}
    if args.impl in ("pallas", "both"):
        impls["pallas"] = flash_attention
    if args.impl in ("xla", "both"):
        impls["xla"] = reference_attention

    for name, impl in impls.items():
        # loop inside jit with a data dependency (out feeds next q) so the
        # axon tunnel's per-dispatch overhead is excluded
        @jax.jit
        def fwd_loop(q, k, v, bias, impl=impl):
            def body(qq, _):
                return impl(qq, k, v, bias).astype(qq.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=args.iters)
            return out

        dt = timeit(fwd_loop, q, k, v, bias, iters=1) / args.iters
        print(f"{name} fwd  B{B} H{H} L{L} D{D}: {dt*1e3:8.3f} ms  "
              f"{flops_fwd/dt/1e12:6.1f} TF/s")
        if args.bwd:
            def loss(q, k, v, impl=impl):
                return jnp.sum(impl(q, k, v, bias).astype(jnp.float32))
            g = jax.grad(loss, argnums=(0, 1, 2))

            @jax.jit
            def bwd_loop(q, k, v):
                def body(qq, _):
                    dq, dk, dv = g(qq, k, v)
                    return (dq + qq).astype(qq.dtype), ()
                out, _ = jax.lax.scan(body, q, None, length=args.iters)
                return out

            dt = timeit(bwd_loop, q, k, v, iters=1) / args.iters
            print(f"{name} f+b  B{B} H{H} L{L} D{D}: {dt*1e3:8.3f} ms  "
                  f"{3.5*flops_fwd/dt/1e12:6.1f} TF/s(eff)")


if __name__ == "__main__":
    main()
