"""All-modalities integration bench on the real chip (VERDICT r3 #6).

The reference's actual hot loop is the interleaved K-sub-step combined
batch — one optimizer sub-step per modality per combined batch (reference
src/models/oneprot_module.py:92-107) — while the headline bench times the
seq<->struct_token pair only. This measures one production-sized combined
step across ALL six modalities:

  modality      tower                               batch (reference)
  struct_token  ESM2-35M (trainable)                16  (struct_token.yaml)
  text          BiomedBERT-base geometry (frozen)   16  (text.yaml)
  struct_graph  ProNet-equivalent GNN (trainable)   16  (struct_graph.yaml)
  pocket        same GNN family, pocket graphs      16  (pocket.yaml)
  msa           MSA-1b geometry 12L/768 (frozen)    16 x depth 50 (msa.yaml)
  seqsim        the ESM2-650M hub itself            16  (seqsim.yaml)

plus the frozen ESM2-650M int8 hub forward in every sub-step. Sequence
rows pad to L=512 (the SwissProt median-290 mix's dominant bucket), text
to 512, MSA rows to 256 cols (host greedy_select keeps depth 50).

Per-modality executables are scanned (BENCH_ALLMOD_STEPS steps per
dispatch) and compiled concurrently through the tunnel (bench.AsyncCompile);
the combined rate is total aligned pairs / total device time — the
reference's sub-steps run sequentially, so the sum of sub-step times IS
the combined step time.

Run: python scripts/bench_all_modalities.py  (real chip, ~10 min cold)
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import AsyncCompile, make_ids, note  # noqa: E402

B = int(os.environ.get("BENCH_ALLMOD_BATCH", 16))
L = int(os.environ.get("BENCH_ALLMOD_SEQLEN", 512))
STEPS = int(os.environ.get("BENCH_ALLMOD_STEPS", 4))
MSA_DEPTH = int(os.environ.get("BENCH_ALLMOD_MSA_DEPTH", 50))
MSA_COLS = int(os.environ.get("BENCH_ALLMOD_MSA_COLS", 256))
QUANT = os.environ.get("BENCH_QUANT", "int8")
# BENCH_ALLMOD_PRESET=tiny swaps every tower for its smallest geometry —
# a CPU-runnable smoke of the full code path (not a benchmark)
TINY = os.environ.get("BENCH_ALLMOD_PRESET", "") == "tiny"
# BENCH_ALLMOD_ONLY=msa,text re-measures a subset of sub-steps (the
# combined line is then over that subset only)
ONLY = [m for m in os.environ.get("BENCH_ALLMOD_ONLY", "").split(",") if m]


def sampled_lens(rng, n, cap):
    lens = rng.lognormal(mean=np.log(290.0), sigma=0.65, size=n)
    return np.clip(lens, 30, cap).astype(np.int32)


def make_graphs(rng, batch, n, k=24):
    from oneprot_tpu.data.utils.graphs import knn_neighbors

    coords_ca = np.cumsum(rng.randn(batch, n, 3).astype(np.float32) * 1.8,
                          axis=1)
    idx = np.zeros((batch, n, k), np.int32)
    mask = np.zeros((batch, n, k), np.float32)
    for b in range(batch):
        i, m = knn_neighbors(coords_ca[b], k, 10.0)
        idx[b], mask[b] = i, m.astype(np.float32)
    node_mask = np.ones((batch, n), np.float32)
    for b in range(batch):
        nm = int(rng.randint(n // 2, n))
        node_mask[b, nm:] = 0.0
    return {
        "aa": rng.randint(0, 20, size=(batch, n)).astype(np.int32),
        "coords_ca": coords_ca,
        "coords_n": coords_ca + rng.randn(batch, n, 3).astype(
            np.float32) * 0.4,
        "coords_c": coords_ca + rng.randn(batch, n, 3).astype(
            np.float32) * 0.4,
        "bb_embs": rng.randn(batch, n, 6).astype(np.float32),
        "side_chain_embs": rng.randn(batch, n, 8).astype(np.float32),
        "node_mask": node_mask,
        "neighbor_idx": idx,
        "neighbor_mask": mask,
    }


def main():
    from oneprot_tpu.core.mesh import enable_compilation_cache

    enable_compilation_cache()

    from oneprot_tpu.models.encoders import (
        create_msa_encoder,
        create_sequence_encoder,
        create_struct_graph_encoder,
        create_struct_token_encoder,
        create_text_encoder,
    )
    from oneprot_tpu.train.module import OneProtModule
    from oneprot_tpu.train.optim import adam

    t_start = time.time()
    n_chips = len(jax.devices())
    quant = None if QUANT in ("none", "") else QUANT
    gnn_cfg = {"hidden_size": 16 if TINY else 128,
               "num_layers": 2 if TINY else 4,
               "num_rbf": 8 if TINY else 32,
               "out_channels": 1024}
    hub = ("facebook/esm2_t6_8M_UR50D" if TINY
           else "facebook/esm2_t33_650M_UR50D")
    tower = ("facebook/esm2_t6_8M_UR50D" if TINY
             else "facebook/esm2_t12_35M_UR50D")
    msa_kw = (dict(num_layers=2, hidden_size=64, num_heads=4) if TINY
              else {})
    text_kw = (dict(model_name_or_path="bert_tiny") if TINY
               else {})
    components = {
        "sequence": create_sequence_encoder(
            model_name_or_path=hub,
            output_dim=1024, proj_type="mlp", frozen=True, dtype="bfloat16",
            quantize=quant),  # ESM2-650M default
        "struct_token": create_struct_token_encoder(
            model_name_or_path=tower,
            output_dim=1024, dtype="bfloat16"),  # ESM2-35M default
        "text": create_text_encoder(
            output_dim=1024, dtype="bfloat16", frozen=True,
            **text_kw),  # BERT-base
        "struct_graph": create_struct_graph_encoder(
            output_dim=1024, encoder=dict(gnn_cfg)),
        "pocket": create_struct_graph_encoder(
            output_dim=1024, encoder=dict(gnn_cfg)),
        "msa": create_msa_encoder(output_dim=1024,
                                  **msa_kw),  # MSA-1b geometry
    }
    if ONLY:
        components = {k: v for k, v in components.items()
                      if k in ONLY or k == "sequence"}
    module = OneProtModule(
        components=components, optimizer=lambda: adam(1e-3),
        loss_fn="CLIP", use_l1_regularization=True, use_seqsim="seqsim"
        in (ONLY or ("seqsim",)))

    rng = np.random.RandomState(0)

    def seq_batch(steps, seed):
        lens = sampled_lens(np.random.RandomState(seed), steps * B, L)
        return jnp.asarray(np.stack([
            make_ids(B, L, lens[s * B:(s + 1) * B], 24, seed * 100 + s)
            for s in range(steps)]))

    batches = {}
    batches["struct_token"] = (seq_batch(STEPS, 1), jnp.asarray(np.stack([
        make_ids(B, L, sampled_lens(np.random.RandomState(2 + s), B, L),
                 54, 200 + s) for s in range(STEPS)])))
    batches["text"] = (seq_batch(STEPS, 3), jnp.asarray(
        rng.randint(5, 28000, size=(STEPS, B, 512)).astype(np.int32)))
    batches["struct_graph"] = (seq_batch(STEPS, 4), jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)),
        *[make_graphs(np.random.RandomState(40 + s), B, 256)
          for s in range(STEPS)]))
    batches["pocket"] = (seq_batch(STEPS, 5), jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)),
        *[make_graphs(np.random.RandomState(50 + s), B, 128)
          for s in range(STEPS)]))
    msa = rng.randint(4, 24, size=(STEPS, B, MSA_DEPTH, MSA_COLS))
    msa[..., 0] = 0
    batches["msa"] = (seq_batch(STEPS, 6), jnp.asarray(msa.astype(np.int32)))
    # seqsim routes both sides through the hub (reference
    # oneprot_module.py:69-71)
    batches["seqsim"] = (seq_batch(STEPS, 7), seq_batch(STEPS, 8))
    if ONLY:
        batches = {k: v for k, v in batches.items() if k in ONLY}

    # init from one example per modality (first scan slice)
    init_batch = {name: jax.tree.map(lambda x: x[0], pair)
                  for name, pair in batches.items()}
    note("lowering per-modality scanned steps")
    state = jax.eval_shape(module.init, init_batch)
    built = []
    for name, (seq_xs, mod_xs) in batches.items():
        step_fn = module.train_step_fn(name)

        def k_steps(state, seq_xs, mod_xs, step_fn=step_fn):
            def body(st, x):
                st2, loss = step_fn(st, x[0], x[1])
                return st2, loss

            return jax.lax.scan(body, state, (seq_xs, mod_xs))

        lowered = jax.jit(k_steps, donate_argnums=0).lower(
            state, seq_xs, mod_xs)
        note(f"{name}: lowered")
        built.append((name, seq_xs, mod_xs,
                      AsyncCompile(lowered, f"allmod {name}")))

    t0 = time.time()
    state = module.init(init_batch)
    total, trainable = module.num_params()
    note(f"init {time.time()-t0:.1f}s params total={total/1e6:.1f}M "
         f"trainable={trainable/1e6:.1f}M")

    results = {}
    for name, seq_xs, mod_xs, ac in built:
        run = ac.get()
        t0 = time.time()
        state, losses = run(state, seq_xs, mod_xs)
        first = time.time() - t0
        note(f"{name}: first {STEPS} steps {first:.1f}s "
             f"loss={float(losses[-1]):.3f}")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            state, losses = run(state, seq_xs, mod_xs)
            float(losses[-1])
            best = min(best, time.time() - t0)
        ms = best / STEPS * 1000
        results[name] = ms
        note(f"{name}: {ms:.0f} ms/sub-step ({B / (best / STEPS):.1f} "
             f"pairs/s)")

    combined_ms = sum(results.values())
    pairs = B * len(results)
    rate = pairs / (combined_ms / 1000) / max(n_chips, 1)
    print(f"# per-modality ms/sub-step: "
          f"{ {k: round(v) for k, v in results.items()} }", file=sys.stderr)
    print(f"# combined step ({len(results)} sub-steps x {B} pairs): "
          f"{combined_ms:.0f} ms -> {rate:.1f} combined pairs/s/chip "
          f"(total wall {time.time()-t_start:.0f}s)", file=sys.stderr)

    # ---- steady state (epoch >= 2): the trainer's frozen-feature-cache
    # path (train/trainer.py:263-286). Frozen towers' pooled features come
    # from the cache: text/msa/seqsim run fully-cached (heads only),
    # trainable-tower modalities run hub-cached (mod tower fwd/bwd, no
    # 650M hub forward). The cold phase above is epoch 1; THIS is the
    # production hot loop from the second pass over the data.
    if os.environ.get("BENCH_ALLMOD_STEADY", "1") != "1":
        return
    note("steady state: lowering cached steps")
    state_shape = jax.eval_shape(lambda s: s, state)
    built2 = []
    for name, (seq_xs, mod_xs) in batches.items():
        cacheable = module.modality_is_cacheable(name)
        # pooled hub features per step slice (the cache's content); the
        # pooled executables are shared across modalities
        seq_pooled = jnp.stack([
            module.encode_pooled(state.params, "sequence", seq_xs[s])
            for s in range(STEPS)])
        if cacheable:
            mod_pooled = jnp.stack([
                module.encode_pooled(state.params, name, mod_xs[s])
                for s in range(STEPS)])
            step_fn = module.train_step_fully_cached_fn(name)
            xs = (seq_pooled, mod_pooled)
        else:
            step_fn = module.train_step_cached_fn(name)
            xs = (seq_pooled, mod_xs)

        def k_steps(state, a, b, step_fn=step_fn):
            def body(st, x):
                st2, loss = step_fn(st, x[0], x[1])
                return st2, loss

            return jax.lax.scan(body, state, (a, b))

        lowered = jax.jit(k_steps, donate_argnums=0).lower(
            state_shape, *xs)
        note(f"{name}: lowered ({'fully-cached' if cacheable else 'hub-cached'})")
        built2.append((name, cacheable, xs,
                       AsyncCompile(lowered, f"allmod-steady {name}")))

    results2 = {}
    for name, cacheable, xs, ac in built2:
        run = ac.get()
        t0 = time.time()
        state, losses = run(state, *xs)
        first = time.time() - t0
        note(f"{name}: first {STEPS} cached steps {first:.1f}s "
             f"loss={float(losses[-1]):.3f}")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            state, losses = run(state, *xs)
            float(losses[-1])
            best = min(best, time.time() - t0)
        ms = best / STEPS * 1000
        results2[name] = ms
        note(f"{name}: {ms:.1f} ms/cached-sub-step "
             f"({B / (best / STEPS):.1f} pairs/s)")

    combined2 = sum(results2.values())
    rate2 = B * len(results2) / (combined2 / 1000) / max(n_chips, 1)
    print(f"# steady per-modality ms/sub-step: "
          f"{ {k: round(v, 1) for k, v in results2.items()} }",
          file=sys.stderr)
    print(f"# steady combined step ({len(results2)} sub-steps x {B} pairs):"
          f" {combined2:.0f} ms -> {rate2:.1f} combined pairs/s/chip "
          f"(total wall {time.time()-t_start:.0f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
