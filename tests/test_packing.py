"""Sequence packing correctness (kernel masks, pooling, loss, train step).

Key invariance: RoPE attention logits depend only on position DIFFERENCES,
so a protein packed at any row offset produces the SAME hidden states as it
does alone in its own row — asserted end-to-end through the encoders.
"""

import jax
import jax.numpy as jnp
import numpy as np

from oneprot_tpu.data.packing import pack_lengths, pack_token_rows
from oneprot_tpu.losses import clip_loss, clip_loss_masked


def _tokens(rng, n, lo=4, hi=24):
    t = rng.randint(lo, hi, size=n).astype(np.int32)
    t[0] = 0
    t[-1] = 2
    return t


def test_pack_lengths_invariants():
    rng = np.random.RandomState(0)
    lengths = rng.randint(10, 200, size=50)
    rows = pack_lengths(lengths, row_len=256, max_per_row=4)
    seen = sorted(i for r in rows for i in r)
    assert seen == list(range(50))  # every protein placed exactly once
    for r in rows:
        assert len(r) <= 4
        assert sum(int(lengths[i]) for i in r) <= 256


def test_pack_token_rows_layout():
    rng = np.random.RandomState(1)
    toks = [_tokens(rng, n) for n in (40, 100, 60, 200, 30)]
    ids, seg, valid, rows = pack_token_rows(toks, row_len=256, max_per_row=4)
    assert ids.shape == seg.shape
    assert valid.shape == (ids.shape[0], 4)
    for r, members in enumerate(rows):
        off = 0
        for s, idx in enumerate(members):
            t = toks[idx]
            np.testing.assert_array_equal(ids[r, off:off + len(t)], t)
            assert (seg[r, off:off + len(t)] == s).all()
            assert valid[r, s] == 1.0
            off += len(t)
        assert (seg[r, off:] == -1).all()
        assert (ids[r, off:] == 1).all()


def test_packed_encoder_matches_unpacked():
    """Two proteins packed into one row == each alone in its own row,
    through the full encoder (transformer + segment pooling + head)."""
    from oneprot_tpu.models.encoders import StructTokenEncoder
    from oneprot_tpu.models.esm2 import Esm2Config

    cfg = Esm2Config(hidden_size=32, num_layers=2, num_heads=2,
                     intermediate_size=64)
    enc = StructTokenEncoder(config=cfg, output_dim=16, proj_type="linear",
                             use_logit_scale=False)
    rng = np.random.RandomState(2)
    toks = [_tokens(rng, 40), _tokens(rng, 56)]
    L = 128
    ids, seg, valid, rows = pack_token_rows(toks, row_len=L, max_per_row=2)
    assert ids.shape[0] == 1 and len(rows[0]) == 2

    params = enc.init({"params": jax.random.key(0)},
                      jnp.asarray(ids))["params"]
    packed, counts = enc.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(seg), 2,
        method=StructTokenEncoder.packed_features)
    packed = np.asarray(packed)
    assert np.asarray(counts).tolist() == [len(t) for t in
                                           (toks[rows[0][0]],
                                            toks[rows[0][1]])]

    for s, idx in enumerate(rows[0]):
        row = np.full((1, L), 1, np.int32)
        row[0, :len(toks[idx])] = toks[idx]
        want = np.asarray(enc.apply({"params": params}, jnp.asarray(row)))
        np.testing.assert_allclose(packed[s], want[0], rtol=2e-4, atol=1e-5,
                                   err_msg=f"slot {s} != solo run")


def test_clip_loss_masked_matches_unmasked_when_full():
    rng = np.random.RandomState(3)
    f = rng.randn(6, 8).astype(np.float32)
    g = rng.randn(6, 8).astype(np.float32)
    full = float(clip_loss(jnp.asarray(f), jnp.asarray(g), logit_scale=10.0))
    masked = float(clip_loss_masked(jnp.asarray(f), jnp.asarray(g),
                                    jnp.ones(6), logit_scale=10.0))
    np.testing.assert_allclose(masked, full, rtol=1e-6)

    # adding empty slots (any feature values) must not change the loss
    f2 = np.concatenate([f, rng.randn(2, 8).astype(np.float32)])
    g2 = np.concatenate([g, rng.randn(2, 8).astype(np.float32)])
    valid = np.array([1] * 6 + [0] * 2, np.float32)
    padded = float(clip_loss_masked(jnp.asarray(f2), jnp.asarray(g2),
                                    jnp.asarray(valid), logit_scale=10.0))
    np.testing.assert_allclose(padded, full, rtol=1e-6)


def test_packed_train_step_learns():
    from tests.helpers.tiny_models import build_tiny_module

    module = build_tiny_module(mesh=None)
    rng = np.random.RandomState(4)
    toks_seq = [_tokens(rng, n) for n in (30, 40, 26, 50, 36, 44)]
    toks_st = [_tokens(rng, n, lo=20, hi=50) for n in
               (30, 40, 26, 50, 36, 44)]
    L, P = 128, 4
    seq_ids, seq_seg, valid, rows = pack_token_rows(toks_seq, L, P)
    # the modality side packs the SAME proteins into the SAME slots
    st_lists = [[toks_st[i] for i in r] for r in rows]
    R = len(rows)
    st_ids = np.full((R, L), 1, np.int32)
    st_seg = np.full((R, L), -1, np.int32)
    for r, members in enumerate(st_lists):
        off = 0
        for s, t in enumerate(members):
            st_ids[r, off:off + len(t)] = t
            st_seg[r, off:off + len(t)] = s
            off += len(t)

    init_ids = np.full((2, 16), 1, np.int32)
    init_ids[:, 0] = 0
    module.init({"struct_token": (init_ids, init_ids)})
    step = jax.jit(module.train_step_packed_fn("struct_token", P))
    state = module.state
    losses = []
    for _ in range(8):
        state, loss = step(state, jnp.asarray(seq_ids), jnp.asarray(seq_seg),
                           jnp.asarray(st_ids), jnp.asarray(st_seg),
                           jnp.asarray(valid.reshape(-1)))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_trainer_packed_e2e(tmp_path):
    """Production surface: data.pack_sequences=true routes the train loop
    through packed batches end-to-end (loader -> packer -> segment-masked
    train step), loss finite and checkpoints written."""
    import os

    from oneprot_tpu.core.config import load_config, prepare_run_dir
    from oneprot_tpu.data.synthetic import generate_fixtures
    from oneprot_tpu.models import esm2

    data_dir = str(tmp_path / "fixtures")
    generate_fixtures(data_dir, n_train=12, n_eval=4, seed=0)
    orig = esm2.ESM2_SIZES["esm2_t6_8M"]
    esm2.ESM2_SIZES["esm2_t6_8M"] = esm2.Esm2Config(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
    try:
        import train as train_entry

        cfg = load_config(
            os.path.join(os.path.dirname(__file__), "..", "configs"),
            "train",
            overrides=[
                "experiment=debug_struct_token",
                f"paths.data_dir={data_dir}",
                "model.components.sequence.output_dim=32",
                "data.pack_sequences=true",
                "data.pack_rows=2",
                "data.pack_row_len=128",
                "data.pack_slots=4",
                "trainer.limit_train_batches=3",
                "trainer.limit_val_batches=1",
                "trainer.max_epochs=1",
                "trainer.cache_frozen_features=false",
                "test=False",
            ])
        cfg = prepare_run_dir(cfg, output_dir=str(tmp_path / "run"))
        metrics = train_entry.train(cfg)
    finally:
        esm2.ESM2_SIZES["esm2_t6_8M"] = orig
    assert np.isfinite(metrics.get("val/loss", np.nan))


def test_packed_train_step_on_mesh():
    """Packed train step under a multi-device data-parallel mesh: packed
    rows shard over the data axis; losses finite and matching the
    single-device step on the same global batch."""
    from tests.helpers.tiny_models import build_tiny_module

    from oneprot_tpu.core.mesh import make_mesh

    rng = np.random.RandomState(6)
    toks_seq = [_tokens(rng, n) for n in
                (30, 40, 26, 50, 36, 44, 28, 38, 48, 32, 42, 34)]
    toks_st = [_tokens(rng, n, lo=20, hi=50) for n in
               (30, 40, 26, 50, 36, 44, 28, 38, 48, 32, 42, 34)]
    L, P = 128, 4
    seq_ids, seq_seg, valid, rows = pack_token_rows(toks_seq, L, P)
    R = len(rows)
    if R % 4:  # pad rows to a mesh-divisible count with empty rows
        extra = 4 - R % 4
        seq_ids = np.concatenate(
            [seq_ids, np.full((extra, L), 1, np.int32)])
        seq_seg = np.concatenate(
            [seq_seg, np.full((extra, L), -1, np.int32)])
        valid = np.concatenate([valid, np.zeros((extra, P), np.float32)])
        rows += [[] for _ in range(extra)]
        R += extra
    st_ids = np.full((R, L), 1, np.int32)
    st_seg = np.full((R, L), -1, np.int32)
    for r, members in enumerate(rows):
        off = 0
        for s, idx in enumerate(members):
            t = toks_st[idx]
            st_ids[r, off:off + len(t)] = t
            st_seg[r, off:off + len(t)] = s
            off += len(t)

    init_ids = np.full((2, 16), 1, np.int32)
    init_ids[:, 0] = 0

    import jax

    losses = {}
    for name, mesh in (("single", None),
                       ("mesh", make_mesh(data=4, model=1,
                                          devices=jax.devices()[:4]))):
        module = build_tiny_module(mesh=mesh)
        module.init({"struct_token": (init_ids, init_ids)})
        state, loss = module.train_step_packed(
            module.state, "struct_token",
            {"ids": seq_ids, "segment_ids": seq_seg},
            {"ids": st_ids, "segment_ids": st_seg}, valid)
        losses[name] = float(loss)
    assert np.isfinite(losses["single"]) and np.isfinite(losses["mesh"])
    np.testing.assert_allclose(losses["mesh"], losses["single"], rtol=1e-5)
