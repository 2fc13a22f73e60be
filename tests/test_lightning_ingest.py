"""Reference-trained Lightning checkpoint ingestion (VERDICT r2 #3).

Builds the reference's own head modules (BaseEncoder from /root/reference —
real key names: proj.N, norm.1.log_logit_scale, pooling.layer) composed with
HF transformer state dicts under the OneProtLitModule layout
(`network.<modality>.transformer.*` — torch ModuleDict naming), converts via
convert_oneprot_state_dict, and asserts the flax encoders produce the SAME
embeddings as the reference torch forward (pool -> proj -> norm,
base_encoder.py:190-194).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference checkout not available")

if os.path.isdir(os.path.join(REFERENCE, "src")):
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from oneprot_tpu.models.bert import BertConfig  # noqa: E402
from oneprot_tpu.models.encoders import (  # noqa: E402
    OneProtModel,
    SequenceEncoder,
    StructTokenEncoder,
    TextEncoder,
)
from oneprot_tpu.models.esm2 import Esm2Config  # noqa: E402
from oneprot_tpu.models.hf_convert import (  # noqa: E402
    convert_oneprot_state_dict,
)


def _tiny_esm(vocab=33, hidden=32, layers=2, heads=2, inter=64):
    cfg = transformers.EsmConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=inter,
        max_position_embeddings=128, pad_token_id=1, mask_token_id=32,
        position_embedding_type="rotary", token_dropout=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        emb_layer_norm_before=False, layer_norm_eps=1e-5)
    return transformers.EsmModel(cfg, add_pooling_layer=False).eval()


def _tiny_bert(vocab=60, hidden=32, layers=2, heads=2, inter=64):
    cfg = transformers.BertConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=inter,
        max_position_embeddings=64, pad_token_id=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return transformers.BertModel(cfg, add_pooling_layer=False).eval()


def _ref_head(d_model, output_dim, proj_type, use_logit_scale,
              learnable, pooling_type="mean"):
    from src.models.components.base_encoder import BaseEncoder

    torch.manual_seed(7)
    head = BaseEncoder(d_model=d_model, output_dim=output_dim,
                       proj_type=proj_type, use_logit_scale=use_logit_scale,
                       learnable_logit_scale=learnable,
                       pooling_type=pooling_type).eval()
    # make the learnable pieces non-default so the test is discriminating
    with torch.no_grad():
        for p in head.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return head


def _ref_forward(hf, head, ids, pad_id):
    mask = torch.tensor((ids != pad_id).astype(np.int64))
    with torch.no_grad():
        hidden = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                    attention_mask=mask).last_hidden_state
        return head(hidden, mask).numpy()


def test_lightning_checkpoint_roundtrip():
    torch.manual_seed(0)
    hf_seq = _tiny_esm()
    hf_st = _tiny_esm()
    hf_st.resize_token_embeddings(33 + 21)  # reference struct_token_encoder.py:27
    hf_txt = _tiny_bert()
    head_seq = _ref_head(32, 16, "mlp", False, False)
    head_st = _ref_head(32, 16, "linear", True, False)
    head_txt = _ref_head(32, 16, "mlp", True, True, pooling_type="cls")

    # OneProtLitModule state_dict layout: network.<mod>.{transformer,head}.*
    # (lit module attribute `network` is a torch ModuleDict,
    # oneprot_module.py:26); with the optional `model.` wrapper prefix the
    # reference strips (train.py:78-80).
    sd = {}
    for mod, hf, head in (("sequence", hf_seq, head_seq),
                          ("struct_token", hf_st, head_st),
                          ("text", hf_txt, head_txt)):
        for k, v in hf.state_dict().items():
            sd[f"model.network.{mod}.transformer.{k}"] = v
        for k, v in head.state_dict().items():
            sd[f"model.network.{mod}.{k}"] = v

    esm_cfg = Esm2Config(hidden_size=32, num_layers=2, num_heads=2,
                         intermediate_size=64)
    st_cfg = Esm2Config(vocab_size=54, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=64)
    bert_cfg = BertConfig(vocab_size=60, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    encoders = {
        "sequence": SequenceEncoder(config=esm_cfg, output_dim=16,
                                    proj_type="mlp", frozen=True),
        "struct_token": StructTokenEncoder(config=st_cfg, output_dim=16,
                                           proj_type="linear",
                                           use_logit_scale=True),
        "text": TextEncoder(config=bert_cfg, output_dim=16, proj_type="mlp",
                            pooling_type="cls", use_logit_scale=True,
                            learnable_logit_scale=True),
    }
    model = OneProtModel(encoders=encoders)

    rng = np.random.RandomState(0)
    seq_ids = rng.randint(4, 31, (3, 12)).astype(np.int32)
    seq_ids[:, 0] = 0
    seq_ids[0, 8:] = 1
    st_ids = rng.randint(4, 53, (3, 12)).astype(np.int32)
    st_ids[:, 0] = 0
    txt_ids = rng.randint(5, 59, (3, 10)).astype(np.int32)
    txt_ids[:, 0] = 2
    txt_ids[1, 7:] = 0

    params = model.init(
        {"params": jax.random.key(0)},
        {"sequence": jnp.asarray(seq_ids), "struct_token": jnp.asarray(st_ids),
         "text": jnp.asarray(txt_ids)},
        method=OneProtModel.encode_all)["params"]
    params = convert_oneprot_state_dict(sd, encoders, params)

    for mod, hf, head, ids, pad in (
            ("sequence", hf_seq, head_seq, seq_ids, 1),
            ("struct_token", hf_st, head_st, st_ids, 1),
            ("text", hf_txt, head_txt, txt_ids, 0)):
        want = _ref_forward(hf, head, ids, pad)
        got = np.asarray(model.apply({"params": params}, jnp.asarray(ids), mod))
        np.testing.assert_allclose(
            got, want, rtol=2e-4, atol=2e-5,
            err_msg=f"{mod}: converted embeddings != reference")
    # the learnable logit scale transferred (perturbed away from default)
    ls = params["encoders_text"]["head"]["logit_scale"]["log_logit_scale"]
    assert abs(float(ls) - np.log(1 / 0.07)) > 1e-4


def test_split_peft_normalizes_wrapped_keys():
    from oneprot_tpu.models.hf_convert import _split_peft

    tsd = {
        "base_model.model.encoder.layer.0.attention.self.query.base_layer.weight":
            np.zeros((4, 4)),
        "base_model.model.encoder.layer.0.attention.self.query.lora_A.default.weight":
            np.zeros((2, 4)),
        "base_model.model.encoder.layer.0.attention.self.query.lora_B.default.weight":
            np.zeros((4, 2)),
        "base_model.model.embeddings.word_embeddings.weight": np.zeros((8, 4)),
    }
    hf, lora = _split_peft(tsd)
    assert "encoder.layer.0.attention.self.query.weight" in hf
    assert "embeddings.word_embeddings.weight" in hf
    assert "encoder.layer.0.attention.self.query.lora_A.weight" in lora
    assert "encoder.layer.0.attention.self.query.lora_B.weight" in lora


def test_restore_any_loads_lightning_ckpt_file(tmp_path):
    """eval/serving surface: a torch-saved Lightning .ckpt FILE restores into
    a live OneProtModule via restore_any (ckpt_format auto-detect)."""
    from oneprot_tpu.train.checkpoint import restore_any
    from oneprot_tpu.train.module import OneProtModule
    from oneprot_tpu.train.optim import adam

    torch.manual_seed(1)
    hf_seq = _tiny_esm()
    head_seq = _ref_head(32, 16, "mlp", False, False)
    sd = {}
    for k, v in hf_seq.state_dict().items():
        sd[f"network.sequence.transformer.{k}"] = v
    for k, v in head_seq.state_dict().items():
        sd[f"network.sequence.{k}"] = v
    ckpt_file = tmp_path / "epoch_012.ckpt"
    torch.save({"state_dict": sd, "epoch": 12}, str(ckpt_file))

    esm_cfg = Esm2Config(hidden_size=32, num_layers=2, num_heads=2,
                         intermediate_size=64)
    module = OneProtModule(
        components={"sequence": SequenceEncoder(
            config=esm_cfg, output_dim=16, proj_type="mlp", frozen=True)},
        optimizer=lambda: adam(1e-3), frozen_param_dtype=None)
    ids = np.random.RandomState(5).randint(4, 31, (2, 10)).astype(np.int32)
    ids[:, 0] = 0
    ids[1, 7:] = 1
    module.init({"sequence": (ids, ids)})

    desc = restore_any(module, None, str(ckpt_file))
    assert "lightning" in desc

    got = np.asarray(module.eval_step(
        module.state.params, "sequence", ids, ids)[0])
    want = _ref_forward(hf_seq, head_seq, ids, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    with pytest.raises(FileNotFoundError):
        restore_any(module, str(tmp_path), "best")
