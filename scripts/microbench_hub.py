"""Isolated 650M hub forward: bf16 vs int8 (real model, real shapes).

Times SequenceEncoder.backbone_pooled on [B=16, L=1024] with fresh ids per
scan iteration (roll), synced via scalar fetch (see microbench_int8.py for
why). Explains/validates the end-to-end bench delta for BENCH_QUANT=int8.

Run: python scripts/microbench_hub.py [n_iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B, L = 16, 1024
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def build(quant):
    from oneprot_tpu.models.encoders import create_sequence_encoder

    enc = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t33_650M_UR50D", output_dim=1024,
        proj_type="mlp", frozen=True, dtype="bfloat16", pretrained=False,
        quantize=quant)
    ids = np.random.RandomState(0).randint(4, 24, (B, L)).astype(np.int32)
    ids[:, 0] = 0
    ids[:, -1] = 2
    ids[:, 800:] = 1  # realistic ~78% fill
    params = jax.jit(lambda: enc.init(
        {"params": jax.random.key(0)}, jnp.asarray(ids))["params"])()
    return enc, params, jnp.asarray(ids)


def bench(enc, params, ids, n):
    @jax.jit
    def many(p, ids):
        def body(carry, i):
            x = jnp.roll(ids, i, axis=0)
            pooled = enc.apply({"params": p}, x,
                               method=type(enc).backbone_pooled)
            return jnp.maximum(carry, pooled.astype(jnp.float32).max()), None

        tot, _ = jax.lax.scan(body, jnp.float32(-jnp.inf),
                              jnp.arange(n, dtype=jnp.int32))
        return tot

    t0 = time.time()
    float(many(params, ids))
    print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    float(many(params, ids))
    return (time.perf_counter() - t0) / n


def main():
    from oneprot_tpu.core.mesh import enable_compilation_cache

    enable_compilation_cache("/root/repo/.jit_cache")
    for quant in (None, "int8"):
        enc, params, ids = build(quant)
        dt = bench(enc, params, ids, ITERS)
        # hub fwd ~ 2*650e6*B*L flops
        tf = 2 * 650e6 * B * L / 1e12
        print(f"hub fwd quant={quant}: {dt*1e3:.1f} ms  "
              f"~{tf/dt:.0f} TF/s", flush=True)
        del enc, params, ids


if __name__ == "__main__":
    main()
