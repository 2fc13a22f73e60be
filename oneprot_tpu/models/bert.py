"""BERT-style text encoder in JAX/flax (TPU-native).

First-party re-implementation of the BiomedBERT/SciBERT architecture the
reference loads via `transformers.AutoModel` (reference src/models/components/
text_encoder.py:37, configs/model/components/text.yaml:3). Numerics match HF
`BertModel` (post-LN blocks, learned positions, token-type embeddings,
LayerNorm eps 1e-12, exact GELU) — verified in tests/test_models.py.

Attention runs through the shared kernel dispatch (Pallas flash attention on
TPU; text length is 512 in the reference pipeline, text_dataset.py:9).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from oneprot_tpu.kernels import dot_product_attention
from oneprot_tpu.models.esm2 import LoraDense


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    pad_token_id: int = 0
    layer_norm_eps: float = 1e-12


BERT_SIZES = {
    "bert_tiny": BertConfig(hidden_size=128, num_layers=2, num_heads=2,
                            intermediate_size=512),
    "bert_small": BertConfig(hidden_size=512, num_layers=4, num_heads=8,
                             intermediate_size=2048),
    "bert_base": BertConfig(),  # BiomedBERT-base / SciBERT layout
}


def resolve_bert_config(name_or_path: str, vocab_size: Optional[int] = None) -> BertConfig:
    import json
    import os

    cfg_json = os.path.join(name_or_path, "config.json")
    if os.path.isfile(cfg_json):
        with open(cfg_json) as f:
            hf = json.load(f)
        cfg = BertConfig(
            vocab_size=int(hf.get("vocab_size", 30522)),
            hidden_size=int(hf["hidden_size"]),
            num_layers=int(hf["num_hidden_layers"]),
            num_heads=int(hf["num_attention_heads"]),
            intermediate_size=int(hf["intermediate_size"]),
            max_position_embeddings=int(hf.get("max_position_embeddings", 512)),
            type_vocab_size=int(hf.get("type_vocab_size", 2)),
            pad_token_id=int(hf.get("pad_token_id", 0)),
            layer_norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
        )
        if vocab_size is not None:
            cfg = dataclasses.replace(cfg, vocab_size=vocab_size)
        return cfg
    key = name_or_path.rstrip("/").split("/")[-1].lower()
    for prefix, cfg in BERT_SIZES.items():
        if key.startswith(prefix):
            if vocab_size is not None:
                return dataclasses.replace(cfg, vocab_size=vocab_size)
            return cfg
    # BiomedBERT / SciBERT / PubMedBERT are all bert-base layouts
    cfg = BERT_SIZES["bert_base"]
    if vocab_size is not None:
        cfg = dataclasses.replace(cfg, vocab_size=vocab_size)
    return cfg


class BertSelfAttention(nn.Module):
    config: BertConfig
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array],
                 deterministic: bool = True,
                 segment_ids: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        B, L, _ = x.shape
        nh = cfg.num_heads
        hd = cfg.hidden_size // nh

        def qkv(name):
            return LoraDense(cfg.hidden_size, lora_rank=self.lora_rank,
                             lora_alpha=self.lora_alpha,
                             lora_dropout=self.lora_dropout, dtype=self.dtype,
                             name=name)(x, deterministic=deterministic)

        q2d, k2d, v2d = qkv("q"), qkv("k"), qkv("v")   # [B, L, H*D]

        # Fused [B, L, H*D] flash MHA (no rotary for BERT) — avoids the
        # reshape/transpose layout copies around the kernel.
        from oneprot_tpu.kernels.attention import fused_mha

        ctx = fused_mha(q2d, k2d, v2d, nh, bias=bias,
                        segment_ids=segment_ids)
        if ctx is None:  # reference path (CPU tests, odd shapes)
            q = q2d.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
            k = k2d.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
            v = v2d.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
            bias4 = bias
            if segment_ids is not None:
                from oneprot_tpu.kernels.attention import packed_segment_bias

                bias4 = packed_segment_bias(segment_ids, bias4)
            ctx = dot_product_attention(q, k, v, bias=bias4)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="o")(ctx)


class BertLayer(nn.Module):
    config: BertConfig
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array],
                 deterministic: bool = True,
                 segment_ids: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        h = BertSelfAttention(cfg, self.lora_rank, self.lora_alpha,
                              self.lora_dropout, dtype=self.dtype,
                              name="attn")(x, bias, deterministic,
                                           segment_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attn_ln")(x + h)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="ffn_ln")(x + h)


class Bert(nn.Module):
    """Returns last_hidden_state [B, L, H] (like HF BertModel w/o pooler)."""

    config: BertConfig
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 deterministic: bool = True,
                 segment_ids: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        B, L = input_ids.shape

        words = self.param("word_embeddings", nn.initializers.normal(0.02),
                           (cfg.vocab_size, cfg.hidden_size))
        positions = self.param("position_embeddings",
                               nn.initializers.normal(0.02),
                               (cfg.max_position_embeddings, cfg.hidden_size))
        token_types = self.param("token_type_embeddings",
                                 nn.initializers.normal(0.02),
                                 (cfg.type_vocab_size, cfg.hidden_size))
        if segment_ids is None:
            pos_emb = positions[None, :L]
        else:
            # packed rows: BERT's learned positions are ABSOLUTE, so each
            # packed text must restart at position 0 to match its
            # stand-alone encoding (unlike RoPE, which is shift-invariant).
            # Segments are consecutive, so a token's position is its row
            # index minus its segment's start index (a cummax of change
            # points).
            idx = jnp.arange(L, dtype=jnp.int32)[None, :]
            changed = jnp.concatenate(
                [jnp.ones((B, 1), bool),
                 segment_ids[:, 1:] != segment_ids[:, :-1]], axis=1)
            seg_start = jax.lax.cummax(
                jnp.where(changed, idx, 0), axis=1)
            rel = jnp.minimum(idx - seg_start,
                              cfg.max_position_embeddings - 1)
            pos_emb = jnp.take(positions, rel, axis=0)
        x = (
            jnp.take(words, input_ids, axis=0)
            + pos_emb
            + token_types[0][None, None]
        ).astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="emb_ln")(x)

        bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        # `deterministic` is a python bool -> static under remat. flax's
        # nn.remat numbers the bound module as arg 0 (x=1, bias=2,
        # deterministic=3); (2,) would mark `bias` static and leave
        # `deterministic` traced, crashing nn.Dropout when lora_dropout>0
        # (advisor round-2 finding, regression test in test_models.py)
        layer_cls = (nn.remat(BertLayer, static_argnums=(3,))
                     if self.remat else BertLayer)
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, self.lora_rank, self.lora_alpha,
                          self.lora_dropout,
                          dtype=self.dtype, name=f"layer_{i}")(
                              x, bias, deterministic, segment_ids)
        return x
