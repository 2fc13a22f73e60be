"""Frozen-feature cache: cached training == uncached training.

The hub's transformer+pooling output is constant when frozen (reference
configs/model/components/sequence.yaml: frozen: true); the cached step must
reproduce the uncached step's losses and parameters.
"""

import jax
import numpy as np

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
