"""MSA Transformer (axial attention) in JAX/flax.

First-party re-implementation of the architecture of fair-esm's
`esm_msa1b_t12_100M_UR50S`, which the reference loads from a local .pt and
always freezes (reference src/models/components/msa_encoder.py:18-32):
tied row attention (attention maps shared across MSA rows, scaled by
1/sqrt(num_rows)), column attention, pre-LN blocks, learned column positions
plus per-row MSA position embedding, final layer norm.

TPU notes: row attention contracts [B, R, L, D] with the MSA depth folded
into the contraction — a large batched matmul that tiles well on the MXU.
The MSA depth and length are static (host pipeline pads to
msa_depth x max_length buckets, reference msa_dataset.py:27 semantics).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MsaTransformerConfig:
    vocab_size: int = 33
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    pad_token_id: int = 1
    # usable column positions. fair-esm allocates max_positions +
    # padding_idx + 1 = 1026 table rows and indexes position i at row
    # 2 + i; the converter strips those 2 offset rows, so THIS is the
    # post-strip row count — 1026 here made every real-checkpoint import
    # fail on a (1026 vs 1024) template mismatch (review finding, round 5)
    max_positions: int = 1024
    max_rows: int = 1024
    layer_norm_eps: float = 1e-5


class TiedRowAttention(nn.Module):
    config: MsaTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, col_bias: jax.Array,
                 pad_mask: jax.Array) -> jax.Array:
        # x: [B, R, L, H]; col_bias: [B, 1, 1, L] additive key-padding bias;
        # pad_mask: [B, R, L] 1=valid. q is ZEROED at padded positions
        # before the tied row sum (fair-esm RowSelfAttention semantics):
        # from layer 1 a padded row's hiddens vary across positions (column
        # attention mixes valid rows into it), so without this its q·k
        # contribution to the shared logits is NOT position-constant and
        # would perturb valid rows' attention (caught by
        # tests/test_msa_oracle.py::..._on_padded_input).
        cfg = self.config
        B, R, L, _ = x.shape
        nh, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        q2 = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q")(x)
        q2 = q2 * pad_mask[..., None].astype(q2.dtype)
        k2 = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k")(x)
        v2 = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v")(x)
        scale = (hd ** -0.5) * (R ** -0.5)

        # Hot path: fused tied-row flash kernel — one online softmax for all
        # R rows, logits never leave VMEM (kernels/tied_row_attention.py).
        # Safe fwd-only: this tower is always frozen (stop_gradient in
        # MsaEncoder.backbone_pooled), so no VJP is ever requested.
        from oneprot_tpu.kernels.attention import fused_tied_row

        ctx = fused_tied_row(q2, k2, v2, nh, col_bias=col_bias, scale=scale)
        if ctx is None:  # einsum reference path (CPU tests, odd shapes)
            q = q2.reshape(B, R, L, nh, hd)
            k = k2.reshape(B, R, L, nh, hd)
            v = v2.reshape(B, R, L, nh, hd)
            # tied attention: sum logits over rows
            logits = jnp.einsum(
                "brihd,brjhd->bhij", q, k, preferred_element_type=jnp.float32
            ) * scale
            logits = logits + col_bias.astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            ctx = jnp.einsum("bhij,brjhd->brihd", probs, v,
                             preferred_element_type=jnp.float32).astype(v.dtype)
            ctx = ctx.reshape(B, R, L, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="o")(ctx)


class ColumnAttention(nn.Module):
    config: MsaTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, row_bias: jax.Array) -> jax.Array:
        # x: [B, R, L, H]; row_bias: [B, 1, 1, R] bias over rows per column
        cfg = self.config
        B, R, L, _ = x.shape
        nh, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v")(x)
        q = q.reshape(B, R, L, nh, hd) * (hd ** -0.5)
        k = k.reshape(B, R, L, nh, hd)
        v = v.reshape(B, R, L, nh, hd)
        logits = jnp.einsum("brlhd,bslhd->blhrs", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + row_bias[:, 0, 0, :][:, None, None, None, :].astype(
            jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("blhrs,bslhd->brlhd", probs, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        ctx = ctx.reshape(B, R, L, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="o")(ctx)


class MsaLayer(nn.Module):
    config: MsaTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, col_bias, row_bias, pad_mask):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="row_ln")(x)
        x = x + TiedRowAttention(cfg, dtype=self.dtype, name="row_attn")(
            h, col_bias, pad_mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="col_ln")(x)
        x = x + ColumnAttention(cfg, dtype=self.dtype, name="col_attn")(
            h, row_bias)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="ffn_ln")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class MsaTransformer(nn.Module):
    """Input tokens [B, R, L]; returns representations [B, R, L, H]."""

    config: MsaTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        cfg = self.config
        B, R, L = tokens.shape
        pad_mask = (tokens != cfg.pad_token_id)  # [B, R, L]

        emb = self.param("embed_tokens", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.hidden_size))
        x = jnp.take(emb, tokens, axis=0).astype(self.dtype)

        col_pos = self.param("embed_positions", nn.initializers.normal(0.02),
                             (cfg.max_positions, cfg.hidden_size))
        x = x + col_pos[None, None, :L].astype(self.dtype)
        row_pos = self.param("msa_position_embedding",
                             nn.initializers.normal(0.02),
                             (cfg.max_rows, 1, cfg.hidden_size))
        x = x + row_pos[None, :R].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="emb_ln_before")(x)
        x = x * pad_mask[..., None].astype(x.dtype)

        # column-key bias from the query row (row 0 defines valid columns)
        col_valid = pad_mask[:, 0, :]  # [B, L]
        col_bias = (1.0 - col_valid[:, None, None, :].astype(jnp.float32)) * -1e9
        row_valid = pad_mask.any(axis=2)  # [B, R]
        row_bias = (1.0 - row_valid[:, None, None, :].astype(jnp.float32)) * -1e9

        for i in range(cfg.num_layers):
            x = MsaLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, col_bias, row_bias, pad_mask)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="emb_ln_after")(x)
