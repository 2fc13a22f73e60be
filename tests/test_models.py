"""Model numerics tests.

The strongest correctness check in the suite: our flax ESM2/BERT must
reproduce HF `transformers` outputs bit-closely on randomly-initialized
models (constructed offline from configs — no downloads), through the
hf_convert weight mapping. This pins rotary embeddings, token-dropout
rescale, pre/post-LN layouts, GELU flavor and the conversion itself.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oneprot_tpu.models.bert import Bert, BertConfig
from oneprot_tpu.models.esm2 import Esm2, Esm2Config
from oneprot_tpu.models.heads import EncoderHead, l2_normalize, mean_pool
from oneprot_tpu.models.hf_convert import (
    convert_bert_state_dict,
    convert_esm2_state_dict,
    export_peft_lora,
    import_peft_lora,
)

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


def _rand_ids(rng, shape, vocab, pad_tail=True):
    ids = rng.randint(4, vocab - 2, size=shape).astype(np.int32)
    ids[:, 0] = 0
    if pad_tail:
        ids[0, shape[1] // 2:] = 1  # pad a tail to exercise masking
    return ids


@pytest.mark.parametrize("token_dropout", [True, False])
def test_esm2_matches_hf(token_dropout):
    hf_cfg = transformers.EsmConfig(
        vocab_size=33, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128, pad_token_id=1, mask_token_id=32,
        position_embedding_type="rotary", token_dropout=token_dropout,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        emb_layer_norm_before=False,
        layer_norm_eps=1e-5,  # real esm2_* checkpoints use 1e-5
    )
    torch.manual_seed(0)
    hf = transformers.EsmModel(hf_cfg, add_pooling_layer=False).eval()

    rng = np.random.RandomState(1)
    ids = _rand_ids(rng, (2, 12), 33)
    ids[1, 3] = 32  # a mask token, exercises token-dropout rescale
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                  attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    cfg = Esm2Config(hidden_size=64, num_layers=3, num_heads=4,
                     intermediate_size=128, token_dropout=token_dropout)
    params = {"params": convert_esm2_state_dict(hf.state_dict(), cfg.num_layers)}
    got = Esm2(cfg).apply(params, jnp.asarray(ids))
    got = np.asarray(got)
    # padded positions differ (HF computes them; we only guarantee valid ones)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-5)


def test_esm2_struct_token_resize():
    hf_cfg = transformers.EsmConfig(
        vocab_size=33, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, pad_token_id=1,
        mask_token_id=32, position_embedding_type="rotary",
        token_dropout=True, emb_layer_norm_before=False,
    )
    hf = transformers.EsmModel(hf_cfg, add_pooling_layer=False).eval()
    params = convert_esm2_state_dict(hf.state_dict(), 1, extra_vocab_rows=21)
    assert params["embed_tokens"].shape == (54, 32)
    cfg = Esm2Config(vocab_size=54, hidden_size=32, num_layers=1, num_heads=2,
                     intermediate_size=64)
    ids = np.array([[0, 35, 53, 2]], np.int32)  # 3Di token ids
    out = Esm2(cfg).apply({"params": params}, jnp.asarray(ids))
    assert np.isfinite(np.asarray(out)).all()


def test_bert_matches_hf():
    hf_cfg = transformers.BertConfig(
        vocab_size=100, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, pad_token_id=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()

    rng = np.random.RandomState(2)
    ids = rng.randint(5, 99, size=(2, 10)).astype(np.int32)
    ids[:, 0] = 2
    ids[0, 6:] = 0
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                  attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    cfg = BertConfig(vocab_size=100, hidden_size=48, num_layers=2, num_heads=4,
                     intermediate_size=96, max_position_embeddings=64)
    params = {"params": convert_bert_state_dict(hf.state_dict(), 2)}
    got = np.asarray(Bert(cfg).apply(params, jnp.asarray(ids)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-5)


def test_head_matches_reference_semantics():
    """pool->proj->norm(+scale) pipeline (reference base_encoder.py:190-194)."""
    rng = np.random.RandomState(0)
    feats = rng.randn(3, 7, 16).astype(np.float32)
    mask = np.ones((3, 7), np.int32)
    mask[1, 4:] = 0

    pooled = np.asarray(mean_pool(jnp.asarray(feats), jnp.asarray(mask)))
    want = (feats[1] * mask[1][:, None]).sum(0) / mask[1].sum()
    np.testing.assert_allclose(pooled[1], want, rtol=1e-6)

    head = EncoderHead(d_model=16, output_dim=8, proj_type="linear",
                       pooling_type="mean", use_logit_scale=True,
                       learnable_logit_scale=False)
    p = head.init(jax.random.key(0), jnp.asarray(feats), jnp.asarray(mask))
    out = np.asarray(head.apply(p, jnp.asarray(feats), jnp.asarray(mask)))
    # unit L2 norm scaled by exp(log(1/0.07)) = 14.2857, clipped at 100
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1 / 0.07,
                               rtol=1e-4)


def test_attention1d_pooling_masked():
    from oneprot_tpu.models.heads import Attention1dPooling

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32))
    mod = Attention1dPooling()
    p = mod.init(jax.random.key(0), feats, mask)
    out = np.asarray(mod.apply(p, feats, mask))
    assert out.shape == (2, 8)
    # masked positions contribute nothing: perturbing them changes nothing
    feats2 = np.asarray(feats).copy()
    feats2[0, 3:] += 100.0
    out2 = np.asarray(mod.apply(p, jnp.asarray(feats2), mask))
    np.testing.assert_allclose(out[0], out2[0], rtol=1e-5)


def test_lora_roundtrip_and_effect():
    cfg = Esm2Config(hidden_size=32, num_layers=2, num_heads=2,
                     intermediate_size=64)
    ids = np.array([[0, 5, 6, 7, 2, 1]], np.int32)
    model = Esm2(cfg, lora_rank=4, lora_alpha=8)
    params = model.init(jax.random.key(0), jnp.asarray(ids))["params"]
    base = model.apply({"params": params}, jnp.asarray(ids))

    # B starts at zero -> LoRA is a no-op vs the plain model
    plain = Esm2(cfg)
    import flax

    plain_params = jax.tree.map(lambda x: x, params)  # shares q/k/v dense
    out_plain = plain.apply({"params": _strip_lora(plain_params)}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_plain), atol=1e-6)

    # export -> import roundtrip preserves factors
    params["layer_0"]["attn"]["q"]["lora_B"] = (
        params["layer_0"]["attn"]["q"]["lora_B"] + 0.1)
    exported = export_peft_lora(params, cfg.num_layers)
    assert any("lora_A" in k for k in exported)
    restored = jax.tree.map(lambda x: np.zeros_like(x), params)
    restored = jax.tree.map(np.asarray, restored)
    import_peft_lora(exported, restored, cfg.num_layers)
    np.testing.assert_allclose(
        restored["layer_0"]["attn"]["q"]["lora_A"],
        params["layer_0"]["attn"]["q"]["lora_A"], rtol=1e-6)


def _strip_lora(tree):
    if isinstance(tree, dict):
        return {k: _strip_lora(v) for k, v in tree.items()
                if k not in ("lora_A", "lora_B")}
    return tree


def test_int8_quantized_esm2_matches_float():
    """w8a8 int8 GEMM path (frozen-hub quantization, `quantize: int8`):
    float params are quantized ONCE via quantize_esm2_int8_tree into the
    Int8Dense layout (kernel_q int8 + per-channel kernel_scale); outputs
    stay within quantization noise of the float model."""
    from oneprot_tpu.models.esm2 import (Esm2, Esm2Config,
                                         quantize_esm2_int8_tree)

    cfg = Esm2Config(hidden_size=64, num_layers=2, num_heads=2,
                     intermediate_size=128)
    rng = np.random.RandomState(0)
    ids = rng.randint(4, 24, (2, 16)).astype(np.int32)
    ids[:, 0] = 0
    ids[:, -1] = 2
    ids[0, 10:] = 1

    m_f = Esm2(cfg)
    m_q = Esm2(cfg, quant_int8=True)
    params = m_f.init(jax.random.key(0), jnp.asarray(ids))["params"]
    out_f = np.asarray(m_f.apply({"params": params}, jnp.asarray(ids)))
    q_params = quantize_esm2_int8_tree(params)
    # layout check: every dense kernel replaced by kernel_q + kernel_scale
    d = q_params["layer_0"]["attn"]["q"]["dense"]
    assert d["kernel_q"].dtype == jnp.int8
    assert d["kernel_scale"].shape == (1, cfg.hidden_size)
    assert "kernel" not in d
    out_q = np.asarray(m_q.apply({"params": q_params}, jnp.asarray(ids)))
    cos = (out_f * out_q).sum(-1) / (
        np.linalg.norm(out_f, axis=-1) * np.linalg.norm(out_q, axis=-1))
    assert cos.min() > 0.995, cos.min()


def test_int8_requires_frozen_no_lora():
    from oneprot_tpu.models.encoders import create_sequence_encoder

    with pytest.raises(ValueError, match="frozen"):
        create_sequence_encoder(model_name_or_path="facebook/esm2_t6_8M",
                                frozen=False, quantize="int8")
    with pytest.raises(ValueError, match="frozen"):
        create_sequence_encoder(model_name_or_path="facebook/esm2_t6_8M",
                                use_lora=True, quantize="int8")
    with pytest.raises(ValueError, match="int8"):
        create_sequence_encoder(model_name_or_path="facebook/esm2_t6_8M",
                                quantize="int4")


def test_int8_hub_trains_head_finite_grads():
    """Quantized frozen hub: grads flow through the trainable head only and
    stay finite (round() sits behind the stop_gradient barrier)."""
    from oneprot_tpu.models.encoders import create_sequence_encoder
    from oneprot_tpu.models.encoders import OneProtModel

    enc = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t6_8M", output_dim=32,
        proj_type="mlp", frozen=True, quantize="int8", pretrained=False)
    model = OneProtModel(encoders={"sequence": enc})
    ids = np.random.RandomState(1).randint(4, 24, (2, 12)).astype(np.int32)
    ids[:, 0] = 0
    params = model.init({"params": jax.random.key(0)},
                        jnp.asarray(ids), "sequence")["params"]

    # production path: only the trainable (head) subtree meets jax.grad —
    # the frozen transformer (which now holds int8 kernels) stays a closure
    head_params = params["encoders_sequence"]["head"]

    def loss(head_p):
        p = dict(params, encoders_sequence=dict(
            params["encoders_sequence"], head=head_p))
        feats = model.apply({"params": p}, jnp.asarray(ids), "sequence")
        return jnp.sum(feats ** 2)

    grads = jax.grad(loss)(head_params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(np.any(np.asarray(g) != 0) for g in leaves)


def test_lora_dropout_fires_only_in_training_mode():
    """lora_dropout (reference sequence_encoder.py:66-73 passes 0.1 to peft)
    perturbs the LoRA branch input when deterministic=False and is identity
    in eval mode; the base dense path is never dropped (peft LoraLayer)."""
    from oneprot_tpu.models.esm2 import LoraDense

    x = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
    m = LoraDense(8, lora_rank=4, lora_dropout=0.5)
    params = m.init(jax.random.key(0), x)["params"]
    # B init is zeros -> make the LoRA branch contribute
    params = dict(params, lora_B=jnp.ones_like(params["lora_B"]))

    out_eval = m.apply({"params": params}, x, True)
    out_eval2 = m.apply({"params": params}, x, True)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))

    out_a = m.apply({"params": params}, x, False,
                    rngs={"dropout": jax.random.key(1)})
    out_b = m.apply({"params": params}, x, False,
                    rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_eval))


def test_lora_dropout_threads_through_sequence_encoder():
    """create_sequence_encoder no longer discards lora_dropout: the train-mode
    forward (deterministic=False) is stochastic, eval mode is not."""
    from oneprot_tpu.models.encoders import create_sequence_encoder

    enc = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t6_8M", output_dim=16,
        proj_type="linear", frozen=True, use_lora=True, lora_r=4,
        lora_dropout=0.5, pretrained=False)
    assert enc.lora_dropout == 0.5
    ids = np.random.RandomState(3).randint(4, 24, (2, 10)).astype(np.int32)
    ids[:, 0] = 0
    params = enc.init({"params": jax.random.key(0)}, jnp.asarray(ids))["params"]
    # push LoRA B factors off zero so dropout on the branch is observable
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.ones_like(p)
        if any(getattr(k, "key", None) == "lora_B" for k in path) else p,
        params)
    out_a = enc.apply({"params": params}, jnp.asarray(ids), False,
                      rngs={"dropout": jax.random.key(1)})
    out_b = enc.apply({"params": params}, jnp.asarray(ids), False,
                      rngs={"dropout": jax.random.key(2)})
    out_e = enc.apply({"params": params}, jnp.asarray(ids), True)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    assert np.all(np.isfinite(np.asarray(out_e)))


@pytest.mark.parametrize("family", ["esm2", "bert"])
def test_remat_with_lora_dropout_trains(family):
    """Advisor r2 (medium): nn.remat numbers the bound module as arg 0, so
    the old static_argnums marked the wrong argument and remat=True +
    lora_dropout>0 crashed with TracerBoolConversionError in nn.Dropout.
    Gradients must flow with both enabled."""
    rng = np.random.RandomState(0)
    ids = jnp.asarray(_rand_ids(rng, (2, 16), 30))
    if family == "esm2":
        cfg = Esm2Config(vocab_size=33, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64)
        model = Esm2(cfg, lora_rank=4, lora_dropout=0.1, remat=True)
    else:
        cfg = BertConfig(vocab_size=30, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64,
                         max_position_embeddings=64)
        model = Bert(cfg, lora_rank=4, lora_dropout=0.1, remat=True)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ids, True)

    def loss(p):
        out = model.apply(p, ids, False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        return (out.astype(jnp.float32) ** 2).mean()

    grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(bool(jnp.isfinite(g).all()) for g in leaves)
    # LoRA adapters must receive nonzero gradient through the remat layers
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    lora_norms = [float(jnp.abs(v).sum()) for k, v in flat
                  if "lora" in jax.tree_util.keystr(k).lower()]
    assert lora_norms and any(n > 0 for n in lora_norms)
