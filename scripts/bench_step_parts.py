#!/usr/bin/env python
"""Decompose the production train step: hub fwd vs tower f+b vs loss/opt."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L = int(os.environ.get("L", 1024))
B = int(os.environ.get("B", 16))
ITERS = int(os.environ.get("ITERS", 10))


def main():
    import jax
    import jax.numpy as jnp

    from oneprot_tpu.core.mesh import enable_compilation_cache

    enable_compilation_cache()

    from oneprot_tpu.models.encoders import (
        create_sequence_encoder,
        create_struct_token_encoder,
    )
    from oneprot_tpu.train.module import OneProtModule
    from oneprot_tpu.train.optim import adam

    module = OneProtModule(
        components={
            "sequence": create_sequence_encoder(
                model_name_or_path="facebook/esm2_t33_650M_UR50D",
                output_dim=1024, proj_type="mlp", frozen=True,
                dtype="bfloat16"),
            "struct_token": create_struct_token_encoder(
                model_name_or_path="facebook/esm2_t12_35M_UR50D",
                output_dim=1024, dtype="bfloat16"),
        },
        optimizer=lambda: adam(1e-3), loss_fn="CLIP",
        use_l1_regularization=True)

    rng = np.random.RandomState(0)

    def ids(vhi, seed):
        r = np.random.RandomState(seed)
        out = r.randint(4, vhi, size=(B, L)).astype(np.int32)
        out[:, 0] = 0
        out[:, -1] = 2
        return out

    seq_ids = jnp.asarray(ids(24, 0))
    st_ids = jnp.asarray(ids(54, 1))
    state = module.init({"struct_token": (np.asarray(seq_ids[:2]),
                                          np.asarray(st_ids[:2]))})
    params = state.params

    def timeit(tag, fn, operand, vhi):
        # operand passed as a jit ARGUMENT (a closure would bake params
        # into the HLO as literals — GBs through the remote compiler);
        # per-iteration ids as scan xs so nothing hoists out of the loop
        r = np.random.RandomState(3)
        xs = r.randint(4, vhi, size=(ITERS, B, L)).astype(np.int32)
        xs[:, :, 0] = 0
        xs[:, :, -1] = 2
        xs = jnp.asarray(xs)

        @jax.jit
        def loop(x, op, xs):
            def body(c, ids_i):
                out = fn(op, ids_i)
                leaf = jax.tree.leaves(out)[0]
                return c + jnp.sum(leaf.astype(jnp.float32)), ()
            acc, _ = jax.lax.scan(body, x, xs)
            return acc
        acc = loop(jnp.zeros(()), operand, xs)
        float(acc)
        t0 = time.perf_counter()
        acc = loop(jnp.zeros(()), operand, xs)
        float(acc)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{tag}: {dt*1e3:7.1f} ms")
        return dt

    # hub forward (frozen tower, inference math)
    timeit("hub fwd         ", lambda p, i: module.model.apply(
        {"params": p}, i, "sequence"), params, 24)
    # tower forward
    timeit("tower fwd       ", lambda p, i: module.model.apply(
        {"params": p}, i, "struct_token"), params, 54)

    # tower fwd+bwd (grads wrt trainable subtree only)
    from oneprot_tpu.train import optim as optim_lib

    trainable, frozen = optim_lib.partition_params(params, module.mask)

    def tower_loss(tr, fz, ids_i):
        p = optim_lib.merge_params(tr, fz)
        f = module.model.apply({"params": p}, ids_i, "struct_token")
        return jnp.sum(f.astype(jnp.float32))

    timeit("tower fwd+bwd   ",
           lambda op, i: jax.grad(tower_loss)(op[0], op[1], i),
           (trainable, frozen), 54)

    # full train step (unjitted fn re-jitted by timeit's scan)
    step_fn = module.train_step_fn("struct_token")
    # run full step through its own scan (state carried)
    @jax.jit
    def loop_full(s):
        def body(c, _):
            c2, loss = step_fn(c, seq_ids, st_ids)
            return c2, loss
        out, losses = jax.lax.scan(body, s, None, length=ITERS)
        return out, losses
    out, losses = loop_full(state)
    float(losses[-1])
    t0 = time.perf_counter()
    out, losses = loop_full(out)
    float(losses[-1])
    print(f"full train step : {(time.perf_counter()-t0)/ITERS*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
