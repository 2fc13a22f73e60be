"""Frozen-feature cache: cached training == uncached training.

The hub's transformer+pooling output is constant when frozen (reference
configs/model/components/sequence.yaml: frozen: true); the cached step must
reproduce the uncached step's losses and parameters.
"""

import jax
import numpy as np
import pytest

from oneprot_tpu.models.encoders import (
    create_sequence_encoder,
    create_struct_token_encoder,
)
from oneprot_tpu.train.feature_cache import FrozenFeatureCache
from oneprot_tpu.train.module import OneProtModule
from oneprot_tpu.train.optim import adam

from tests.helpers.tiny_models import patch_tiny_esm2, tiny_ids


def _build(frozen=True):
    patch_tiny_esm2()
    seq = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=32,
        proj_type="mlp", frozen=frozen, dtype="float32")
    st = create_struct_token_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=32,
        dtype="float32")
    return OneProtModule(
        components={"sequence": seq, "struct_token": st},
        optimizer=lambda: adam(1e-3), loss_fn="CLIP", seed=0,
        frozen_param_dtype=None)


def test_cacheable_predicate():
    assert _build(frozen=True).hub_is_cacheable()
    assert not _build(frozen=False).hub_is_cacheable()


@pytest.mark.tier0  # quick tier: cached-vs-uncached loss parity
def test_cached_training_matches_uncached():
    batches = [(tiny_ids(24, s), tiny_ids(54, 100 + s)) for s in range(4)]

    plain = _build()
    plain.init({"struct_token": batches[0]})
    s1 = plain.state
    losses_plain = []
    for seq_in, st_in in batches * 2:  # two epochs
        s1, loss = plain.train_step(s1, "struct_token", seq_in, st_in)
        losses_plain.append(float(loss))

    cached = _build()
    cached.init({"struct_token": batches[0]})
    s2 = cached.state
    cache = FrozenFeatureCache()
    losses_cached = []
    for seq_in, st_in in batches * 2:
        cached.state = s2  # get_pooled reads module.state.params
        pooled = cache.get_pooled(cached, seq_in)
        s2, loss = cached.train_step_cached(s2, "struct_token", pooled,
                                            st_in)
        losses_cached.append(float(loss))

    np.testing.assert_allclose(losses_cached, losses_plain, rtol=2e-5)
    # second epoch was served from cache
    assert cache.hits == sum(b[0].shape[0] for b in batches)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.slow
def test_trainer_uses_cache_end_to_end(tmp_path):
    """Two-epoch trainer run with the cache on: hits recorded, loss finite,
    and metrics match a cache-off run."""
    from oneprot_tpu.data.datamodule import OneProtDataModule
    from oneprot_tpu.data.synthetic import generate_fixtures
    from oneprot_tpu.train.trainer import Trainer

    d = str(tmp_path / "fx")
    generate_fixtures(d, n_train=16, n_eval=4, modalities=["struct_token"])

    def run(cache_on, out):
        dm = OneProtDataModule(modalities={"struct_token": {
            "dataset": {
                "data_dir": d,
                "filename": f"{d}/train_saprot.h5",
                "max_length": 64,
            },
            "batch_size": {"train": 4, "val": 4, "test": 4},
        }})
        module = _build()
        tr = Trainer(max_epochs=2, log_every_n_steps=1,
                     cache_frozen_features=cache_on,
                     default_root_dir=str(tmp_path / out), devices=1,
                     mesh={"data": 1, "model": 1})
        metrics = tr.fit(module, dm)
        val = tr.validate(module, dm, split="val")
        return tr, val

    tr_on, val_on = run(True, "on")
    assert tr_on._feature_cache is not None and tr_on._feature_cache.hits > 0
    tr_off, val_off = run(False, "off")
    assert tr_off._feature_cache is None
    np.testing.assert_allclose(val_on["val/loss"], val_off["val/loss"],
                               rtol=2e-4)


def test_modality_cacheable_flags():
    m = _build()
    assert m.modality_is_cacheable("seqsim")        # routes to frozen hub
    assert not m.modality_is_cacheable("struct_token")  # trainable tower


def test_fully_cached_seqsim_matches_uncached():
    """seqsim: both sides run the frozen hub — the dual-cached step (heads
    only) must reproduce the uncached step."""
    batches = [(tiny_ids(24, s), tiny_ids(24, 50 + s)) for s in range(3)]

    plain = _build()
    plain.use_seqsim = True
    plain.init({"struct_token": (tiny_ids(24, 0), tiny_ids(54, 1))})
    s1 = plain.state
    losses_plain = []
    for seq_in, mod_in in batches * 2:
        s1, loss = plain.train_step(s1, "seqsim", seq_in, mod_in)
        losses_plain.append(float(loss))

    cached = _build()
    cached.use_seqsim = True
    cached.init({"struct_token": (tiny_ids(24, 0), tiny_ids(54, 1))})
    s2 = cached.state
    cache = FrozenFeatureCache()
    losses_cached = []
    for seq_in, mod_in in batches * 2:
        cached.state = s2
        p1 = cache.get_pooled(cached, seq_in)
        p2 = cache.get_pooled(cached, mod_in, "seqsim")
        s2, loss = cached.train_step_fully_cached(s2, "seqsim", p1, p2)
        losses_cached.append(float(loss))

    np.testing.assert_allclose(losses_cached, losses_plain, rtol=2e-5)
    assert cache.hits > 0


def test_int8_hub_preserves_retrieval_quality():
    """VERDICT r2 #1a acceptance: quantizing the frozen hub to int8 leaves
    retrieval R@1 unchanged on the training slice — same initial weights
    (float tree quantized via quantize_esm2_int8_tree), same data, N train
    steps, identical R@1 and near-identical losses."""
    import jax
    import numpy as np

    from tests.helpers.tiny_models import patch_tiny_esm2, tiny_ids

    patch_tiny_esm2()
    from oneprot_tpu.models.encoders import (
        create_sequence_encoder,
        create_struct_token_encoder,
    )
    from oneprot_tpu.models.esm2 import quantize_esm2_int8_tree
    from oneprot_tpu.train.metrics import retrieval_metrics
    from oneprot_tpu.train.module import OneProtModule, TrainState
    from oneprot_tpu.train.optim import adam

    def build(quant):
        seq = create_sequence_encoder(
            model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=32,
            proj_type="mlp", frozen=True, pretrained=False, quantize=quant)
        st = create_struct_token_encoder(
            model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=32)
        return OneProtModule(
            components={"sequence": seq, "struct_token": st},
            optimizer=lambda: adam(1e-3), loss_fn="CLIP", seed=0,
            frozen_param_dtype=None)

    seq_init = tiny_ids(24, 0, batch=8)
    st_init = tiny_ids(54, 1, batch=8)
    m_f = build(None)
    state_f = m_f.init({"struct_token": (seq_init, st_init)})

    m_q = build("int8")
    state_q = m_q.init({"struct_token": (seq_init, st_init)})
    # same weights: quantize the float hub transformer. DEEP copies — the
    # float module's train_step donates its state buffers, which would
    # invalidate shared leaves
    params_q = jax.tree.map(lambda x: np.array(x, copy=True), state_f.params)
    params_q["encoders_sequence"] = dict(
        params_q["encoders_sequence"],
        transformer=jax.tree.map(
            lambda x: np.array(x, copy=True),
            quantize_esm2_int8_tree(
                state_f.params["encoders_sequence"]["transformer"])))
    state_q = TrainState(step=state_q.step, params=params_q,
                         opt_state=state_q.opt_state)

    losses_f, losses_q = [], []
    for step in range(10):
        seq_ids = tiny_ids(24, 100 + step, batch=8)
        st_ids = tiny_ids(54, 200 + step, batch=8)
        state_f, lf = m_f.train_step(state_f, "struct_token", seq_ids, st_ids)
        state_q, lq = m_q.train_step(state_q, "struct_token", seq_ids, st_ids)
        losses_f.append(float(lf))
        losses_q.append(float(lq))
    np.testing.assert_allclose(losses_q, losses_f, rtol=5e-2,
                               err_msg="int8 hub changed training dynamics")

    val_seq = tiny_ids(24, 999, batch=8)
    val_st = tiny_ids(54, 998, batch=8)
    sf, mf, _ = m_f.eval_step(state_f.params, "struct_token", val_seq, val_st)
    sq, mq, _ = m_q.eval_step(state_q.params, "struct_token", val_seq, val_st)
    r_f = retrieval_metrics(np.asarray(sf), np.asarray(mf), ks=(1,))
    r_q = retrieval_metrics(np.asarray(sq), np.asarray(mq), ks=(1,))
    for k in ("seq_to_mod_R@1", "mod_to_seq_R@1"):
        assert r_q[k] == r_f[k], (
            f"{k}: int8={r_q[k]} float={r_f[k]} — R@1 changed")


def _packed_batches(n_batches=3, rows=2, row_len=64, slots=4, seed=0):
    from oneprot_tpu.data.packing import pack_token_rows

    rng = np.random.RandomState(seed)
    out = []
    for b in range(n_batches):
        toks_a, toks_b = [], []
        for _ in range(5):
            li = int(rng.randint(8, 30))
            ta = rng.randint(4, 24, size=li).astype(np.int32)
            ta[0], ta[-1] = 0, 2
            tb = rng.randint(4, 24, size=li).astype(np.int32)
            tb[0], tb[-1] = 0, 2
            toks_a.append(ta)
            toks_b.append(tb)
        ids_a, seg_a, valid, members = pack_token_rows(toks_a, row_len, slots)
        ids_a, seg_a = ids_a[:rows], seg_a[:rows]
        valid = valid[:rows]
        ids_b = np.full_like(ids_a, 1)
        for r, mem in enumerate(members[:rows]):
            off = 0
            for s, idx in enumerate(mem):
                t = toks_b[idx]
                ids_b[r, off:off + len(t)] = t
                off += len(t)
        out.append((ids_a, seg_a, ids_b, seg_a.copy(), valid))
    return out


def test_packed_cached_training_matches_uncached():
    """VERDICT r2 #2: packing and the frozen-feature cache must COMPOSE.
    The packed+cached step (cached per-protein hub features keyed by token
    subsequence + packed trainable tower) must reproduce the packed
    uncached step's losses and parameters, with epoch-2 hits."""
    batches = _packed_batches()
    slots = batches[0][4].shape[1]

    plain = _build()
    plain.init({"struct_token": (tiny_ids(24, 0), tiny_ids(54, 1))})
    s1 = plain.state
    losses_plain = []
    for ids_a, seg_a, ids_b, seg_b, valid in batches * 2:
        s1, loss = plain.train_step_packed(
            s1, "struct_token", {"ids": ids_a, "segment_ids": seg_a},
            {"ids": ids_b, "segment_ids": seg_b}, valid)
        losses_plain.append(float(loss))

    cached = _build()
    cached.init({"struct_token": (tiny_ids(24, 0), tiny_ids(54, 1))})
    s2 = cached.state
    cache = FrozenFeatureCache()
    losses_cached = []
    for ids_a, seg_a, ids_b, seg_b, valid in batches * 2:
        cached.state = s2
        pooled = cache.get_pooled_packed(cached, ids_a, seg_a, valid)
        s2, loss = cached.train_step_packed_cached(
            s2, "struct_token", pooled,
            {"ids": ids_b, "segment_ids": seg_b}, valid)
        losses_cached.append(float(loss))

    np.testing.assert_allclose(losses_cached, losses_plain, rtol=2e-5,
                               atol=1e-6)
    # epoch 2 served entirely from cache (keys = token subsequences)
    n_pairs = int(sum(b[4].sum() for b in batches))
    assert cache.hits == n_pairs
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


class _StubModule:
    """Counts backbone forwards; returns row-sum features."""

    class _S:
        params = None

    state = _S()

    def __init__(self):
        self.forwards = 0

    def encode_pooled(self, params, modality, x):
        self.forwards += 1
        return np.asarray(x, np.float32).sum(-1, keepdims=True) * np.ones((1, 4))


def test_lru_eviction_beats_insert_stop_on_skewed_access():
    """VERDICT r2 #8: with max_entries < unique rows, insert-stop pinned
    whichever rows arrived FIRST forever. Under skewed access (hot rows
    arriving after the pin fills — e.g. the val pool revisited every
    validation) LRU retains the hot set; insert-stop never does."""
    rng = np.random.RandomState(0)
    cold = [rng.randint(4, 24, size=(1, 16)).astype(np.int32)
            for _ in range(12)]
    hot = [rng.randint(4, 24, size=(1, 16)).astype(np.int32)
           for _ in range(4)]

    def epoch_stream():
        # cold rows first (they grab insert-stop's pins), then hot rows
        # repeatedly
        for x in cold:
            yield x
        for _ in range(5):
            for x in hot:
                yield x

    def run_lru():
        cache = FrozenFeatureCache(max_entries=8)
        mod = _StubModule()
        for ep in range(3):
            for x in epoch_stream():
                cache.get_pooled(mod, x)
            if ep == 1:
                cache.hits = cache.misses = 0  # measure epoch 3 only
        return cache.hits / (cache.hits + cache.misses)

    def run_insert_stop():
        store, hits, misses = {}, 0, 0
        for ep in range(3):
            if ep == 2:
                hits = misses = 0
            for x in epoch_stream():
                k = x.tobytes()
                if k in store:
                    hits += 1
                else:
                    misses += 1
                    if len(store) < 8:
                        store[k] = 1
        return hits / (hits + misses)

    assert run_lru() > run_insert_stop()


# -- disk persistence (VERDICT r4 next-step 3) ---------------------------

def test_disk_store_roundtrip_and_reopen(tmp_path):
    """Append/lookup within a process, then a 'restarted process' (fresh
    store over the same directory) warm-loads every row bit-exactly and
    appends to its own shard without touching existing ones."""
    from oneprot_tpu.train.feature_cache import DiskFeatureStore

    d = str(tmp_path / "feat")
    rng = np.random.RandomState(0)
    rows = {b"k%d" % i: rng.randn(8).astype(np.float32) for i in range(10)}
    s = DiskFeatureStore(d)
    for k, v in rows.items():
        s.append(k, v)
    for k, v in rows.items():  # read-back through the write-behind buffer
        np.testing.assert_array_equal(s.lookup(k), v)
    assert s.lookup(b"absent") is None
    s.close()

    s2 = DiskFeatureStore(d)
    assert len(s2) == 10
    for k, v in rows.items():
        np.testing.assert_array_equal(s2.lookup(k), v)
    s2.append(b"new", np.ones(8, np.float32))
    s2.append(b"k0", np.zeros(8, np.float32))  # dup: ignored, not rewritten
    s2.close()

    s3 = DiskFeatureStore(d)
    assert len(s3) == 11
    np.testing.assert_array_equal(s3.lookup(b"k0"), rows[b"k0"])
    import os as _os

    assert len([f for f in _os.listdir(d) if f.endswith(".idx")]) == 2


def test_disk_store_tolerates_torn_writes(tmp_path):
    """A process killed mid-write leaves a torn index or data tail; the
    next open must load every complete row and drop the torn one."""
    from oneprot_tpu.train.feature_cache import DiskFeatureStore

    d = str(tmp_path / "feat")
    s = DiskFeatureStore(d)
    for i in range(3):
        s.append(b"key-%d" % i, np.full(4, float(i), np.float32))
    s.close()
    import glob
    import os as _os

    idx = glob.glob(_os.path.join(d, "*.idx"))[0]
    with open(idx, "rb+") as f:
        f.truncate(_os.path.getsize(idx) - 5)  # tear the LAST record
    s2 = DiskFeatureStore(d)
    assert len(s2) == 2
    np.testing.assert_array_equal(s2.lookup(b"key-1"),
                                  np.full(4, 1.0, np.float32))

    bin_path = glob.glob(_os.path.join(d, "*.bin"))[0]
    with open(bin_path, "rb+") as f:
        # cut into key-1's row data (rows are 4 floats = 16 B each; drop
        # the last 5 floats so key-1's span [4:8) exceeds the file)
        f.truncate(_os.path.getsize(bin_path) - 20)
    s3 = DiskFeatureStore(d)
    assert s3.lookup(b"key-1") is None  # torn row: recompute, don't crash
    np.testing.assert_array_equal(s3.lookup(b"key-0"),
                                  np.full(4, 0.0, np.float32))


def test_persistent_cache_survives_restart(tmp_path):
    """The whole point: a fresh cache instance (fresh process) over the
    same persist_dir serves every row from disk — ZERO backbone forwards."""
    d = str(tmp_path / "feat")
    x = np.arange(12, dtype=np.int32).reshape(3, 4)
    m1 = _StubModule()
    c1 = FrozenFeatureCache(persist_dir=d)
    out1 = c1.get_pooled(m1, x)
    assert m1.forwards == 1 and c1.misses == 3
    c1.close()

    m2 = _StubModule()
    c2 = FrozenFeatureCache(persist_dir=d)
    out2 = c2.get_pooled(m2, x)
    assert m2.forwards == 0, "restart recomputed frozen features"
    assert c2.disk_hits == 3 and c2.misses == 0
    np.testing.assert_array_equal(out1, out2)
    stats = c2.stats()
    assert stats["cache/disk_entries"] == 3.0
    # second access within the restarted process: pure RAM (promoted)
    c2.get_pooled(m2, x)
    assert c2.disk_hits == 3 and m2.forwards == 0


def test_trainer_restart_warm_starts_from_disk(tmp_path):
    """Production restart path (chain-resubmission): a SECOND trainer +
    module over the same cache_persist_dir trains its first epoch with
    zero hub misses — cached (steady-state) speed from step 1."""
    from oneprot_tpu.data.datamodule import OneProtDataModule
    from oneprot_tpu.data.synthetic import generate_fixtures
    from oneprot_tpu.train.trainer import Trainer

    d = str(tmp_path / "fx")
    feat = str(tmp_path / "feature_cache")
    generate_fixtures(d, n_train=16, n_eval=4, modalities=["struct_token"])

    def run(out):
        dm = OneProtDataModule(modalities={"struct_token": {
            "dataset": {
                "data_dir": d,
                "filename": f"{d}/train_saprot.h5",
                "max_length": 64,
            },
            "batch_size": {"train": 4, "val": 4, "test": 4},
        }})
        module = _build()
        tr = Trainer(max_epochs=1, log_every_n_steps=1,
                     cache_frozen_features=True, cache_persist_dir=feat,
                     default_root_dir=str(tmp_path / out), devices=1,
                     mesh={"data": 1, "model": 1})
        tr.fit(module, dm)
        return tr

    tr1 = run("run1")
    assert tr1._feature_cache.misses > 0  # cold: paid the hub forwards
    tr2 = run("run2")  # fresh trainer + module = restarted process
    assert tr2._feature_cache.misses == 0, (
        "restarted run re-paid the epoch-1 hub cost")
    assert tr2._feature_cache.disk_hits > 0


def test_validate_only_uses_disk_store(tmp_path):
    """Eval-only workflow (no fit in this process) over a persist_dir
    written by a prior run: validate() must engage the cache and serve the
    frozen hub from disk with zero misses."""
    from oneprot_tpu.data.datamodule import OneProtDataModule
    from oneprot_tpu.data.synthetic import generate_fixtures
    from oneprot_tpu.train.trainer import Trainer

    d = str(tmp_path / "fx")
    feat = str(tmp_path / "feature_cache")
    generate_fixtures(d, n_train=16, n_eval=4, modalities=["struct_token"])

    def make():
        dm = OneProtDataModule(modalities={"struct_token": {
            "dataset": {
                "data_dir": d,
                "filename": f"{d}/train_saprot.h5",
                "max_length": 64,
            },
            "batch_size": {"train": 4, "val": 4, "test": 4},
        }})
        module = _build()
        ids = np.full((2, 16), 1, np.int32)
        ids[:, 0] = 0
        module.init({"struct_token": (ids, ids)})
        tr = Trainer(max_epochs=1, cache_frozen_features=True,
                     cache_persist_dir=feat,
                     default_root_dir=str(tmp_path), devices=1,
                     mesh={"data": 1, "model": 1})
        return tr, module, dm

    tr1, module1, dm1 = make()
    dm1.setup()  # validate() alone does not run trainer.setup()
    tr1.validate(module1, dm1, split="val")  # cold: computes + persists
    assert tr1._feature_cache is not None
    assert tr1._feature_cache.misses > 0
    tr1._feature_cache.flush()

    tr2, module2, dm2 = make()  # fresh "process", same weights (seed 0)
    dm2.setup()
    tr2.validate(module2, dm2, split="val")
    assert tr2._feature_cache is not None, "validate() did not build the cache"
    assert tr2._feature_cache.misses == 0, "eval-only run ignored the disk store"
    assert tr2._feature_cache.disk_hits > 0


def test_disk_store_reads_rows_written_after_first_map(tmp_path):
    """A shard grows past the length it had when first memory-mapped
    (write-behind appends within one process, or a concurrent chain link's
    flush): lookup must remap and serve the new row, not report a miss —
    a stale map would turn every RAM-evicted late row into a permanent
    recompute."""
    from oneprot_tpu.train.feature_cache import DiskFeatureStore

    d = str(tmp_path / "feat")
    s = DiskFeatureStore(d, flush_every=1)
    s.append(b"a", np.full(8, 1.0, np.float32))
    np.testing.assert_array_equal(s.lookup(b"a"),
                                  np.full(8, 1.0, np.float32))  # maps 1 row
    s.append(b"b", np.full(8, 2.0, np.float32))  # grows past the map
    row = s.lookup(b"b")
    assert row is not None, "stale memmap swallowed a post-map row"
    np.testing.assert_array_equal(row, np.full(8, 2.0, np.float32))
    s.close()


def test_disk_store_torn_row_self_heals(tmp_path):
    """A torn row must not poison its key: the recomputed row re-persists
    (lookup drops the dead index entry so append is not a no-op), and a
    THIRD process serves it from disk again."""
    from oneprot_tpu.train.feature_cache import DiskFeatureStore

    d = str(tmp_path / "feat")
    s = DiskFeatureStore(d)
    s.append(b"k0", np.full(4, 7.0, np.float32))
    s.close()
    import glob
    import os as _os

    bin_path = glob.glob(_os.path.join(d, "*.bin"))[0]
    with open(bin_path, "rb+") as f:
        f.truncate(8)  # k0's row [0:4) now exceeds the file

    s2 = DiskFeatureStore(d)
    assert s2.lookup(b"k0") is None  # torn: miss, key dropped
    s2.append(b"k0", np.full(4, 7.0, np.float32))  # the recompute persists
    s2.close()

    s3 = DiskFeatureStore(d)
    row = s3.lookup(b"k0")
    assert row is not None, "torn row permanently poisoned its key"
    np.testing.assert_array_equal(row, np.full(4, 7.0, np.float32))
    s3.close()


def test_disk_store_rejects_mismatched_fingerprint(tmp_path):
    """Rows key on token bytes only, so a store reused across different
    frozen weights would silently train on stale features; the sentinel
    must turn that into a hard error (and stay backward/opt-out
    compatible when no fingerprint is passed)."""
    from oneprot_tpu.train.feature_cache import DiskFeatureStore

    d = str(tmp_path / "feat")
    s1 = DiskFeatureStore(d, fingerprint="ck-aaa")
    s1.append(b"k", np.ones(4, np.float32))
    s1.close()
    s2 = DiskFeatureStore(d, fingerprint="ck-aaa")  # same weights: fine
    assert s2.lookup(b"k") is not None
    s2.close()
    with pytest.raises(ValueError, match="different frozen weights"):
        DiskFeatureStore(d, fingerprint="ck-bbb")
    s3 = DiskFeatureStore(d)  # legacy opener without a fingerprint
    assert s3.lookup(b"k") is not None
    s3.close()


def test_trainer_guards_persist_dir_against_checkpoint_change(tmp_path):
    """Production misuse: chain link 2 restarts with DIFFERENT frozen hub
    weights but the same cache_persist_dir. The trainer's frozen-params
    fingerprint must refuse the stale store instead of serving it.
    (Exercised through validate(), which uses the module's params as
    given; fit() re-initializes from the seed, so a perturbed state
    cannot survive into its first step.)"""
    from oneprot_tpu.data.datamodule import OneProtDataModule
    from oneprot_tpu.data.synthetic import generate_fixtures
    from oneprot_tpu.train.trainer import Trainer

    d = str(tmp_path / "fx")
    feat = str(tmp_path / "feature_cache")
    generate_fixtures(d, n_train=8, n_eval=4, modalities=["struct_token"])

    def run(perturb_hub):
        dm = OneProtDataModule(modalities={"struct_token": {
            "dataset": {
                "data_dir": d,
                "filename": f"{d}/train_saprot.h5",
                "max_length": 64,
            },
            "batch_size": {"train": 4, "val": 4, "test": 4},
        }})
        module = _build()
        ids = np.full((2, 16), 1, np.int32)
        ids[:, 0] = 0
        module.init({"struct_token": (ids, ids)})
        if perturb_hub:
            from oneprot_tpu.train.optim import (
                merge_params,
                partition_params,
            )

            # nudge the FROZEN partition = "a different hub checkpoint"
            trainable, frozen = partition_params(module.state.params,
                                                 module.mask)
            frozen = jax.tree.map(lambda v: v + 0.5, frozen)
            module.state = module.state.replace(
                params=merge_params(trainable, frozen))
        tr = Trainer(max_epochs=1, log_every_n_steps=1,
                     cache_frozen_features=True, cache_persist_dir=feat,
                     default_root_dir=str(tmp_path / "rt"), devices=1,
                     mesh={"data": 1, "model": 1})
        dm.setup()
        tr.validate(module, dm, split="val")
        return tr

    run(perturb_hub=False)  # builds the store with the seed-0 weights
    with pytest.raises(ValueError, match="different frozen weights"):
        run(perturb_hub=True)
    run(perturb_hub=False)  # unchanged weights keep working
