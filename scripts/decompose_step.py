"""Decompose the bench train step per bucket on the real chip.

Measures, for each (L, B) bucket with the int8 hub:
  - hub fwd (frozen ESM2-650M backbone_pooled)
  - tower fwd only (struct ESM2-35M full encode)
  - cached train step (tower fwd+bwd + heads + loss + Adam)
  - cached step minus tower bwd proxy: heads+loss+Adam on fixed pooled feats

Timing per microbench_int8.py rules (scalar-fetch sync, scan w/ fresh data).

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


def timed(fn, *args, n=N):
    @jax.jit
    def many(a):
        def body(carry, i):
            out = fn(*[jnp.roll(x, i, axis=0) if hasattr(x, "shape")
                       and x.ndim >= 1 else x for x in a])
            leaf = jax.tree.leaves(out)[-1]
            return jnp.maximum(carry, leaf.astype(jnp.float32).max()), None

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
    for L, B in BUCKETS:
        seq_ids = jnp.asarray(ids(24, B, L))
        st_ids = jnp.asarray(ids(24, B, L) % 33 + 20)

        hub = lambda ids_: model.apply(
            {"params": state.params}, ids_, "sequence",
            method=type(model).encode_pooled)
        t_hub = timed(hub, seq_ids)

        tower = lambda ids_: model.apply(
            {"params": state.params}, ids_, "struct_token")
        t_tower_fwd = timed(tower, st_ids)

        pooled = jax.jit(hub)(seq_ids)
        float(pooled[0, 0])

        cached_fn = module.train_step_cached_fn("struct_token")

        def cached_step(pooled_x, st_x):
            new_state, loss = cached_fn(state, pooled_x, st_x)
            return loss

        t_cached = timed(cached_step, pooled, st_ids)

        fully = module.train_step_fully_cached_fn("struct_token")
        mod_pooled = jax.jit(lambda x: model.apply(
            {"params": state.params}, x, "struct_token",
            method=type(model).encode_pooled))(st_ids)
        float(mod_pooled[0, 0])

        def heads_step(pooled_x, mp):
            new_state, loss = fully(state, pooled_x, mp)
            return loss

        t_heads = timed(heads_step, pooled, mod_pooled)

        print(f"L={L} B={B}: hub_fwd={t_hub*1e3:6.1f} ms  "
              f"tower_fwd={t_tower_fwd*1e3:6.1f} ms  "
              f"cached_step={t_cached*1e3:6.1f} ms  "
              f"heads+loss+adam={t_heads*1e3:6.1f} ms  "
              f"[tower fwd+bwd ~= {(t_cached-t_heads)*1e3:6.1f} ms]",
              flush=True)


if __name__ == "__main__":
    main()
