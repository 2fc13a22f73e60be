"""Decompose the bench train step per bucket on the real chip.

Measures, for each (L, B) bucket with the int8 hub:
  - hub fwd (frozen ESM2-650M backbone_pooled)
  - tower fwd only (struct ESM2-35M full encode)
  - cached train step (tower fwd+bwd + heads + loss + Adam)
  - heads+loss+Adam alone (both towers' pooled feats precomputed)

Timing per microbench_int8.py rules (scalar-fetch sync, scan w/ fresh data).
Params flow as jit ARGUMENTS — closing over the 686M tree bakes it into the
compile request and overflows the tunnel's body limit (HTTP 413).

Run: python scripts/decompose_step.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BUCKETS = [(256, 64), (512, 32), (1024, 16)]
N = 10


def timed(fn, params, *args, n=N):
    """fn(params, *args) -> pytree; time n scan iterations w/ rolled args."""

    @jax.jit
    def many(p, a):
        def body(carry, i):
            out = fn(p, *[jnp.roll(x, i, axis=0) for x in a])
            leaf = jax.tree.leaves(out)[-1]
            return jnp.maximum(carry, leaf.astype(jnp.float32).max()), None

        tot, _ = jax.lax.scan(body, jnp.float32(-jnp.inf),
                              jnp.arange(n, dtype=jnp.int32))
        return tot

    float(many(params, args))
    t0 = time.perf_counter()
    float(many(params, args))
    return (time.perf_counter() - t0) / n


def main():
    from oneprot_tpu.core.mesh import enable_compilation_cache

    enable_compilation_cache("/root/repo/.jit_cache")

    from oneprot_tpu.models.encoders import (
        create_sequence_encoder,
        create_struct_token_encoder,
    )
    from oneprot_tpu.train.module import OneProtModule
    from oneprot_tpu.train.optim import adam

    components = {
        "sequence": create_sequence_encoder(
            model_name_or_path="facebook/esm2_t33_650M_UR50D",
            output_dim=1024, proj_type="mlp", frozen=True, dtype="bfloat16",
            pretrained=False, quantize="int8"),
        "struct_token": create_struct_token_encoder(
            model_name_or_path="facebook/esm2_t12_35M_UR50D",
            output_dim=1024, dtype="bfloat16"),
    }
    module = OneProtModule(components=components, optimizer=lambda: adam(1e-3),
                           loss_fn="CLIP", use_l1_regularization=True)
    rng = np.random.RandomState(0)

    def ids(vhi, B, L, fill=0.78):
        out = np.full((B, L), 1, np.int32)
        n_real = int(L * fill)
        out[:, :n_real] = rng.randint(4, vhi, size=(B, n_real))
        out[:, 0] = 0
        return out

    init_ids = ids(24, 2, 64)
    state = module.init({"struct_token": (init_ids, init_ids)})

    model = module.model
    cached_fn = module.train_step_cached_fn("struct_token")

    def hub(p, ids_):
        return model.apply({"params": p}, ids_, "sequence",
                           method=type(model).encode_pooled)

    def tower(p, ids_):
        return model.apply({"params": p}, ids_, "struct_token")

    def timed_cached(st0, pooled_x, st_x, n=N):
        """Chain the TrainState through the scan (like bench.py) so the
        backward pass + Adam update cannot be dead-code-eliminated."""

        @jax.jit
        def many(st, px, sx):
            def body(s, i):
                s2, loss = cached_fn(s, jnp.roll(px, i, axis=0),
                                     jnp.roll(sx, i, axis=0))
                return s2, loss

            s2, losses = jax.lax.scan(body, st,
                                      jnp.arange(n, dtype=jnp.int32))
            return losses[-1]

        float(many(st0, pooled_x, st_x))
        t0 = time.perf_counter()
        float(many(st0, pooled_x, st_x))
        return (time.perf_counter() - t0) / n

    def fwd_loss(p, pooled_x, st_x):
        seq_f = model.apply({"params": p}, pooled_x, "sequence",
                            method=type(model).head_from_pooled)
        mod_f = model.apply({"params": p}, st_x, "struct_token")
        return module._loss_value(mod_f, seq_f)

    hub_pool = jax.jit(hub)

    for L, B in BUCKETS:
        seq_ids = jnp.asarray(ids(24, B, L))
        st_ids = jnp.asarray(ids(24, B, L) % 33 + 20)

        t_hub = timed(hub, state.params, seq_ids)
        t_tower_fwd = timed(tower, state.params, st_ids)

        pooled = hub_pool(state.params, seq_ids)
        float(pooled[0, 0])

        t_cached = timed_cached(state, pooled, st_ids)
        t_fwd_loss = timed(fwd_loss, state.params, pooled, st_ids)

        print(f"L={L} B={B}: hub_fwd={t_hub*1e3:6.1f} ms  "
              f"tower_fwd={t_tower_fwd*1e3:6.1f} ms  "
              f"cached_step={t_cached*1e3:6.1f} ms  "
              f"fwd+loss={t_fwd_loss*1e3:6.1f} ms  "
              f"[bwd+adam ~= {(t_cached-t_fwd_loss)*1e3:6.1f} ms]",
              flush=True)


if __name__ == "__main__":
    main()
