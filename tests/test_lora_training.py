"""LoRA fine-tuning path: frozen hub + adapters trainable (the reference's
sequence-encoder peft mode, sequence_encoder.py:61-74)."""

import jax
import numpy as np
import pytest

from oneprot_tpu.models.encoders import (
    create_sequence_encoder,
    create_struct_token_encoder,
)
from oneprot_tpu.train import optim as optim_lib
from oneprot_tpu.train.module import OneProtModule
from oneprot_tpu.train.optim import adam


@pytest.fixture(scope="module")
def tiny():
    from oneprot_tpu.models import esm2

    orig = esm2.ESM2_SIZES["esm2_t6_8M"]
    esm2.ESM2_SIZES["esm2_t6_8M"] = esm2.Esm2Config(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
    yield
    esm2.ESM2_SIZES["esm2_t6_8M"] = orig


def _ids(vhi, seed, batch=4, length=16):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, vhi, size=(batch, length)).astype(np.int32)
    ids[:, 0] = 0
    ids[:, -1] = 2
    return ids


def test_lora_frozen_hub_trains_adapters_only(tiny):
    seq = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=16,
        proj_type="mlp", frozen=True, use_lora=True, lora_r=4,
        dtype="float32")
    st = create_struct_token_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=16,
        dtype="float32")
    module = OneProtModule(
        components={"sequence": seq, "struct_token": st},
        optimizer=lambda: adam(3e-3), frozen_param_dtype=None, seed=0)
    seq_ids, st_ids = _ids(24, 0), _ids(54, 1)
    module.init({"struct_token": (seq_ids, st_ids)})

    # trainability: lora_A/B + biases trainable inside hub transformer;
    # base kernels frozen (peft bias="all" semantics)
    t = module.state.params["encoders_sequence"]["transformer"]["layer_0"]["attn"]
    mask = module.mask["encoders_sequence"]["transformer"]["layer_0"]["attn"]
    assert mask["q"]["lora_A"] is True and mask["q"]["lora_B"] is True
    assert mask["q"]["dense"]["kernel"] is False
    assert mask["q"]["dense"]["bias"] is True  # bias="all"
    assert mask["o"]["kernel"] is False

    before = np.asarray(t["q"]["dense"]["kernel"]).copy()
    before_lora = np.asarray(t["q"]["lora_A"]).copy()

    state = module.state
    losses = []
    for _ in range(4):
        state, loss = module.train_step(state, "struct_token", seq_ids, st_ids)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    after = state.params["encoders_sequence"]["transformer"]["layer_0"]["attn"]
    np.testing.assert_array_equal(before, np.asarray(after["q"]["dense"]["kernel"]))
    assert not np.allclose(before_lora, np.asarray(after["q"]["lora_A"]))


def test_trainable_counts_reflect_freeze(tiny):
    seq_frozen = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=16,
        proj_type="mlp", frozen=True, dtype="float32")
    st = create_struct_token_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=16,
        dtype="float32")
    m1 = OneProtModule(components={"sequence": seq_frozen, "struct_token": st},
                       optimizer=lambda: adam(1e-3), frozen_param_dtype=None)
    m1.init({"struct_token": (_ids(24, 0), _ids(54, 1))})
    total1, trainable1 = m1.num_params()
    assert trainable1 < total1  # hub transformer excluded
