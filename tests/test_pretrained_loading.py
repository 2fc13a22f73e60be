"""Pretrained HF checkpoint loading into the training flow.

Builds tiny torch EsmModel/BertModel offline, saves HF-style checkpoint
dirs, and verifies OneProtModule.init grafts the converted weights (and the
encoder forward then matches the torch model's pooled output)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from oneprot_tpu.models import esm2 as esm2_lib  # noqa: E402
from oneprot_tpu.models.encoders import (  # noqa: E402
    create_sequence_encoder,
    create_struct_token_encoder,
)
from oneprot_tpu.train.module import OneProtModule  # noqa: E402
from oneprot_tpu.train.optim import adam  # noqa: E402


@pytest.fixture(scope="module")
def hf_esm_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_esm")
    cfg = transformers.EsmConfig(
        vocab_size=33, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, pad_token_id=1,
        mask_token_id=32, position_embedding_type="rotary",
        token_dropout=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, emb_layer_norm_before=False,
        layer_norm_eps=1e-5)
    torch.manual_seed(0)
    model = transformers.EsmModel(cfg, add_pooling_layer=False).eval()
    model.save_pretrained(str(d))
    return str(d), model


def test_pretrained_weights_are_grafted(hf_esm_dir, monkeypatch):
    hf_dir, torch_model = hf_esm_dir
    monkeypatch.setitem(
        esm2_lib.ESM2_SIZES, "esm2_t6_8M",
        esm2_lib.Esm2Config(hidden_size=32, num_layers=2, num_heads=2,
                            intermediate_size=64))

    # model name resolution still needs a size key -> use a dir whose
    # basename starts with the size name by symlinking
    link = os.path.join(os.path.dirname(hf_dir), "esm2_t6_8M_test")
    if not os.path.exists(link):
        os.symlink(hf_dir, link)

    seq = create_sequence_encoder(model_name_or_path=link, output_dim=16,
                                  proj_type="linear", frozen=True,
                                  dtype="float32")
    assert seq.pretrained_dir == link
    st = create_struct_token_encoder(model_name_or_path=link, output_dim=16,
                                     dtype="float32")
    module = OneProtModule(
        components={"sequence": seq, "struct_token": st},
        optimizer=lambda: adam(1e-3), frozen_param_dtype=None)

    ids = np.array([[0, 5, 6, 7, 8, 2, 1, 1]], np.int32)
    module.init({"struct_token": (ids, ids)})

    # transformer weights equal the torch checkpoint
    got_emb = np.asarray(
        module.state.params["encoders_sequence"]["transformer"]["embed_tokens"])
    want_emb = torch_model.embeddings.word_embeddings.weight.detach().numpy()
    np.testing.assert_allclose(got_emb, want_emb, rtol=1e-6)

    # struct encoder got the +21 resized rows
    st_emb = np.asarray(
        module.state.params["encoders_struct_token"]["transformer"]["embed_tokens"])
    assert st_emb.shape == (54, 32)
    np.testing.assert_allclose(st_emb[:33], want_emb, rtol=1e-6)

    # forward hidden states match torch on the same input
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = esm2_lib.Esm2(seq.config).apply(
        {"params": module.state.params["encoders_sequence"]["transformer"]},
        jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got)[mask.astype(bool)],
                               want[mask.astype(bool)], rtol=2e-4, atol=2e-5)


def test_hub_name_without_local_dir_stays_random():
    enc = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=8)
    assert enc.pretrained_dir is None
