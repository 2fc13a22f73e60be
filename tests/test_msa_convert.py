"""MSA-1b checkpoint conversion: mapping completeness + forward runs."""

import numpy as np
import pytest

from oneprot_tpu.models.hf_convert import convert_msa1b_state_dict
from oneprot_tpu.models.msa_transformer import MsaTransformer, MsaTransformerConfig


def _fake_fairesm_sd(layers=2, d=32, ffn=64, vocab=33, bias_scale=0.0):
    rng = np.random.RandomState(0)

    def bias(n):
        return (rng.randn(n).astype(np.float32) * bias_scale
                if bias_scale else np.zeros(n, np.float32))
    sd = {
        "embed_tokens.weight": rng.randn(vocab, d).astype(np.float32),
        # the REAL fair-esm allocation: max_positions + padding_idx + 1
        # = 1024 + 1 + 1 rows (a fabricated 1026+2 here previously masked
        # a template mismatch against real checkpoints)
        "embed_positions.weight": rng.randn(1024 + 2, d).astype(np.float32),
        "msa_position_embedding": rng.randn(1, 1024, 1, d).astype(np.float32),
        "emb_layer_norm_before.weight": np.ones(d, np.float32),
        "emb_layer_norm_before.bias": np.zeros(d, np.float32),
        "emb_layer_norm_after.weight": np.ones(d, np.float32),
        "emb_layer_norm_after.bias": np.zeros(d, np.float32),
    }
    for i in range(layers):
        for block, prefix in (("row_self_attention", "row"),
                              ("column_self_attention", "col")):
            sd[f"layers.{i}.{block}.layer_norm.weight"] = np.ones(d, np.float32)
            sd[f"layers.{i}.{block}.layer_norm.bias"] = np.zeros(d, np.float32)
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"layers.{i}.{block}.layer.{proj}.weight"] = (
                    rng.randn(d, d).astype(np.float32) * 0.05)
                sd[f"layers.{i}.{block}.layer.{proj}.bias"] = bias(d)
        sd[f"layers.{i}.feed_forward_layer.layer_norm.weight"] = np.ones(
            d, np.float32)
        sd[f"layers.{i}.feed_forward_layer.layer_norm.bias"] = np.zeros(
            d, np.float32)
        sd[f"layers.{i}.feed_forward_layer.layer.fc1.weight"] = (
            rng.randn(ffn, d).astype(np.float32) * 0.05)
        sd[f"layers.{i}.feed_forward_layer.layer.fc1.bias"] = np.zeros(
            ffn, np.float32)
        sd[f"layers.{i}.feed_forward_layer.layer.fc2.weight"] = (
            rng.randn(d, ffn).astype(np.float32) * 0.05)
        sd[f"layers.{i}.feed_forward_layer.layer.fc2.bias"] = np.zeros(
            d, np.float32)
    return sd


def test_msa1b_conversion_loads_and_runs():
    import jax.numpy as jnp

    cfg = MsaTransformerConfig(hidden_size=32, num_layers=2, num_heads=2,
                               intermediate_size=64)
    params = convert_msa1b_state_dict(_fake_fairesm_sd(), cfg.num_layers)
    assert params["embed_positions"].shape == (1024, 32)
    assert params["msa_position_embedding"].shape == (1024, 1, 32)
    tokens = np.zeros((1, 3, 8), np.int32)
    tokens[:, :, 0] = 0
    tokens[0, 2, 4:] = 1
    out = MsaTransformer(cfg).apply({"params": params}, jnp.asarray(tokens))
    assert out.shape == (1, 3, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_msa_column_padding_invariance():
    """Valid-position outputs are invariant to appended pad COLUMNS.

    Padded key columns are masked out of both attention axes (col_bias
    from the query row, matching fair-esm's masked_fill keyed on row 0's
    padding), and a padded column's garbage activations stay localized:
    row attention from valid queries never reads masked keys, and column
    attention only mixes rows within one column. Must survive nonzero
    q/k/v biases and >1 layer. Row padding is deliberately NOT tested
    here: the tied-row scale is 1/sqrt(static R) in fair-esm
    (align_scaling) and here alike, so appending pad rows changes valid
    outputs in BOTH implementations — that semantics is pinned against
    the torch oracle (test_msa_oracle.py padded case) instead."""
    import jax.numpy as jnp

    cfg = MsaTransformerConfig(hidden_size=32, num_layers=2, num_heads=2,
                               intermediate_size=64)
    params = convert_msa1b_state_dict(
        _fake_fairesm_sd(bias_scale=0.5), cfg.num_layers)

    rng = np.random.RandomState(3)
    R, L, LP = 4, 8, 12
    base = rng.randint(4, 24, size=(2, R, L)).astype(np.int32)
    base[:, :, 0] = 0  # cls column
    padded = np.full((2, R, LP), 1, np.int32)  # pad_token_id = 1
    padded[:, :, :L] = base

    model = MsaTransformer(cfg)
    out_base = np.asarray(model.apply({"params": params},
                                      jnp.asarray(base)))
    out_pad = np.asarray(model.apply({"params": params},
                                     jnp.asarray(padded)))
    np.testing.assert_allclose(out_pad[:, :, :L], out_base,
                               rtol=2e-4, atol=2e-5)
