"""ESM2 protein language model in JAX/flax (TPU-native).

First-party re-implementation of the ESM2 architecture used by the reference
via `transformers.AutoModel` (reference src/models/components/
sequence_encoder.py:50-59, configs/model/components/sequence.yaml:3). Numerics
match HF `EsmModel` (verified in tests/test_models.py against a
randomly-initialized torch EsmModel with converted weights):

  - rotary position embeddings on q/k (GPT-NeoX-style rotate_half)
  - pre-LN blocks + final `emb_layer_norm_after`
  - ESM2 token-dropout embedding rescale (mask-token zeroing +
    (1-0.12)/(1-observed_ratio) scaling)
  - exact (erf) GELU, LayerNorm eps 1e-5

TPU-first departures: attention runs through the fused Pallas flash-attention
kernel (oneprot_tpu/kernels/flash_attention.py) on bf16 with fp32 softmax; all
shapes are static (length-bucketed inputs).

Optional LoRA (q/k/v) replaces the reference's peft integration
(sequence_encoder.py:61-74): extra (A, B) factors live under 'lora_A'/'lora_B'
param names so freeze masks can select them by path.

Optional w8a8 int8 quantization (`quant_int8`, frozen towers only): every
dense layer swaps to `Int8Dense` for MXU int8 GEMMs (int8 peak is ~2x bf16
on v5e). Weights are quantized ONCE at load time into int8 params
(`kernel_q` + per-channel `kernel_scale` — see `quantize_esm2_int8_tree`);
activations are quantized per token in the forward. Measured on v5e with
synced timing (scripts/microbench_int8.py): 1.66x/1.93x/1.06x over the bf16
dense path at the 650M qkv/fc1/fc2 shapes. Round-1's "int8 at parity with
bf16" finding was an artifact of non-blocking dispatch timing on the
tunneled backend and is superseded (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from oneprot_tpu.kernels import dot_product_attention

MASK_RATIO_TRAIN = 0.15 * 0.8  # ESM2 pretraining mask rate (token dropout)


@dataclasses.dataclass(frozen=True)
class Esm2Config:
    vocab_size: int = 33
    hidden_size: int = 320
    num_layers: int = 6
    num_heads: int = 20
    intermediate_size: int = 1280
    pad_token_id: int = 1
    mask_token_id: int = 32
    token_dropout: bool = True
    layer_norm_eps: float = 1e-5
    max_length: int = 1026


# Published ESM2 model sizes (reference sequence.yaml:3 name surface).
ESM2_SIZES = {
    "esm2_t6_8M": Esm2Config(hidden_size=320, num_layers=6, num_heads=20,
                             intermediate_size=1280),
    "esm2_t12_35M": Esm2Config(hidden_size=480, num_layers=12, num_heads=20,
                               intermediate_size=1920),
    "esm2_t30_150M": Esm2Config(hidden_size=640, num_layers=30, num_heads=20,
                                intermediate_size=2560),
    "esm2_t33_650M": Esm2Config(hidden_size=1280, num_layers=33, num_heads=20,
                                intermediate_size=5120),
    "esm2_t36_3B": Esm2Config(hidden_size=2560, num_layers=36, num_heads=40,
                              intermediate_size=10240),
    # not a published size: 2-layer toy for CI/smoke paths where even the
    # 8M model's XLA compile dominates (tests/test_driver_entries.py)
    "esm2_tiny": Esm2Config(hidden_size=64, num_layers=2, num_heads=4,
                            intermediate_size=128),
}


def resolve_esm2_config(name_or_path: str, vocab_size: Optional[int] = None) -> Esm2Config:
    """Map HF-style names ('facebook/esm2_t33_650M_UR50D') or local HF
    checkpoint dirs (config.json) to configs."""
    import json
    import os

    cfg_json = os.path.join(name_or_path, "config.json")
    if os.path.isfile(cfg_json):
        with open(cfg_json) as f:
            hf = json.load(f)
        cfg = Esm2Config(
            vocab_size=int(hf.get("vocab_size", 33)),
            hidden_size=int(hf["hidden_size"]),
            num_layers=int(hf["num_hidden_layers"]),
            num_heads=int(hf["num_attention_heads"]),
            intermediate_size=int(hf["intermediate_size"]),
            pad_token_id=int(hf.get("pad_token_id", 1)),
            mask_token_id=int(hf.get("mask_token_id", 32)),
            token_dropout=bool(hf.get("token_dropout", True)),
            layer_norm_eps=float(hf.get("layer_norm_eps", 1e-5)),
        )
        if vocab_size is not None:
            cfg = dataclasses.replace(cfg, vocab_size=vocab_size)
        return cfg
    key = name_or_path.rstrip("/").split("/")[-1]
    for prefix, cfg in ESM2_SIZES.items():
        if key.startswith(prefix):
            if vocab_size is not None:
                return dataclasses.replace(cfg, vocab_size=vocab_size)
            return cfg
    raise ValueError(f"Unknown ESM2 model name: {name_or_path}")


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rotary_cos_sin(length: int, dim: int, dtype=jnp.float32):
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(length, dtype=jnp.float32)
    freqs = jnp.einsum("l,d->ld", t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    # x: [B, H, L, D]; cos/sin: [L, D]
    return x * cos[None, None] + rotate_half(x) * sin[None, None]


def quantize_int8_kernel(w: jax.Array):
    """fp kernel [K, N] -> (int8 kernel_q [K, N], f32 kernel_scale [1, N]):
    symmetric per-output-channel abs-max quantization."""
    w = jnp.asarray(w, jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0,
                      1e-12)
    return jnp.round(w / s_w).astype(jnp.int8), s_w


def quantize_esm2_int8_tree(tree):
    """Convert a float Esm2 transformer param tree into the Int8Dense layout:
    every dict holding a `kernel` leaf (q/k/v dense, o, fc1, fc2 — the only
    kernel-bearing modules inside the transformer; embeddings and LayerNorms
    have none) is rewritten to `kernel_q` + `kernel_scale`. Used once at
    weight-load time (train/module.py _load_pretrained) so no per-step
    weight-quantize pass exists (advisor round-1 finding)."""
    if isinstance(tree, dict):
        if "kernel" in tree:
            out = {k: v for k, v in tree.items() if k != "kernel"}
            out["kernel_q"], out["kernel_scale"] = quantize_int8_kernel(
                tree["kernel"])
            return out
        return {k: quantize_esm2_int8_tree(v) for k, v in tree.items()}
    return tree


class Int8Dense(nn.Module):
    """Dense with w8a8 int8 quantization for FROZEN towers.

    Weights live pre-quantized as params (`kernel_q` int8 + per-output-channel
    `kernel_scale` f32 — produced from a float checkpoint by
    `quantize_esm2_int8_tree`), halving frozen-weight HBM traffic and
    removing any per-step weight-quantize pass. The forward quantizes
    activations per token (symmetric abs-max), runs an int8 x int8 -> int32
    dot on the MXU (~2x bf16 peak on v5e), and dequantizes in the XLA-fused
    epilogue `* s_x * s_w + bias`.

    Only valid under `stop_gradient` (frozen backbone): `round` has a zero
    gradient, so the trainable path must never route through this module.
    Random init uses a fixed scale (3 sigma of lecun-normal) so uninitialized
    quantized towers are still approximately lecun-distributed for tests.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jax.Array],
                 pre_quant: Optional[tuple] = None) -> jax.Array:
        """`pre_quant=(x_q int8 [..., K], s_x f32 [..., 1])` skips the
        internal activation quantization — used by the fused gelu->quant
        kernel between fc1 and fc2 (kernels/gelu_quant.py); `x` is ignored
        (pass None)."""
        if pre_quant is not None:
            x_q, s_x = pre_quant
            in_dim = x_q.shape[-1]
            lead = x_q.shape[:-1]
            x_q = x_q.reshape(-1, in_dim)
            s_x = s_x.reshape(-1, 1)
        else:
            in_dim = x.shape[-1]
            lead = x.shape[:-1]
        s0 = 3.0 / (127.0 * float(in_dim) ** 0.5)

        def kq_init(key, shape):
            w = nn.initializers.lecun_normal()(key, shape)
            return jnp.clip(jnp.round(w / s0), -127, 127).astype(jnp.int8)

        w_q = self.param("kernel_q", kq_init, (in_dim, self.features))
        s_w = self.param("kernel_scale", nn.initializers.constant(s0),
                         (1, self.features))

        if pre_quant is None:
            xf = x.astype(jnp.float32)
            x2 = xf.reshape(-1, in_dim)
            s_x = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
            s_x = jnp.maximum(s_x, 1e-12)
            x_q = jnp.round(x2 / s_x).astype(jnp.int8)

        y = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * s_x * s_w.astype(jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.reshape(*lead, self.features).astype(self.dtype)


class LoraDense(nn.Module):
    """Dense with optional LoRA factors (peft-compatible math:
    y = xW + b + (alpha/r) * dropout(x) @ A^T @ B^T, A init kaiming-uniform,
    B zeros; input dropout on the LoRA branch only, matching peft's
    LoraLayer — reference sequence_encoder.py:66-73 passes lora_dropout)."""

    features: int
    use_bias: bool = True
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dense_cls = Int8Dense if self.quant_int8 else nn.Dense
        y = dense_cls(self.features, use_bias=self.use_bias, dtype=self.dtype,
                      name="dense")(x)
        if self.lora_rank > 0:
            in_dim = x.shape[-1]
            a = self.param(
                "lora_A",
                # peft's kaiming_uniform(a=sqrt(5)) over fan_in: bound
                # sqrt(1/fan_in) = variance_scaling(1/3, fan_in, uniform).
                # he_uniform's sqrt(6/fan_in) was ~2.45x wider than the
                # peft init this class claims to match
                nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
                (in_dim, self.lora_rank),
            ).astype(self.dtype)
            b = self.param(
                "lora_B", nn.initializers.zeros, (self.lora_rank, self.features)
            ).astype(self.dtype)
            xl = x
            if self.lora_dropout > 0.0:
                xl = nn.Dropout(self.lora_dropout)(
                    xl, deterministic=deterministic)
            y = y + (self.lora_alpha / self.lora_rank) * ((xl @ a) @ b)
        return y


class Esm2SelfAttention(nn.Module):
    config: Esm2Config
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array],
                 lens: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 segment_ids: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        B, L, H = x.shape
        nh = cfg.num_heads
        hd = cfg.hidden_size // nh

        def qkv(name):
            return LoraDense(cfg.hidden_size, lora_rank=self.lora_rank,
                             lora_alpha=self.lora_alpha,
                             lora_dropout=self.lora_dropout, dtype=self.dtype,
                             quant_int8=self.quant_int8, name=name)(
                                 x, deterministic=deterministic)

        q2d, k2d, v2d = qkv("q"), qkv("k"), qkv("v")   # [B, L, H*D]

        # Hot path: fused [B, L, H*D] flash MHA with in-kernel rotary —
        # consumes the QKV projections' natural layout (no transposes).
        from oneprot_tpu.kernels.attention import fused_mha

        cos, sin = rotary_cos_sin(L, hd, dtype=q2d.dtype)
        ctx = fused_mha(q2d, k2d, v2d, nh, bias=bias,
                        rope_cos=cos, rope_sin=sin, lens=lens,
                        segment_ids=segment_ids)
        if ctx is None:  # reference path (CPU tests, odd shapes)
            q = q2d.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
            k = k2d.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
            v = v2d.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
            bias4 = bias
            if segment_ids is not None:
                from oneprot_tpu.kernels.attention import (
                    packed_segment_bias,
                )

                bias4 = packed_segment_bias(segment_ids, bias4)
            ctx = dot_product_attention(q, k, v, bias=bias4)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, cfg.hidden_size)
        o_cls = Int8Dense if self.quant_int8 else nn.Dense
        return o_cls(cfg.hidden_size, dtype=self.dtype, name="o")(ctx)


class Esm2Layer(nn.Module):
    config: Esm2Config
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array],
                 lens: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 segment_ids: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attn_ln")(x)
        h = Esm2SelfAttention(cfg, self.lora_rank, self.lora_alpha,
                              self.lora_dropout,
                              dtype=self.dtype, quant_int8=self.quant_int8,
                              name="attn")(h, bias, lens, deterministic,
                                           segment_ids)
        x = x + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="ffn_ln")(x)
        dense_cls = Int8Dense if self.quant_int8 else nn.Dense
        h = dense_cls(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        if self.quant_int8:
            # fused gelu -> per-token int8 quant (one HBM pass instead of
            # three over [tokens, 4H]; kernels/gelu_quant.py, measured
            # 2.74 -> 2.29 ms/block at 650M shapes); None -> unfused path
            from oneprot_tpu.kernels.gelu_quant import fused_gelu_quant

            pq = fused_gelu_quant(h)
            if pq is not None:
                return x + Int8Dense(cfg.hidden_size, dtype=self.dtype,
                                     name="fc2")(None, pre_quant=pq)
        h = jax.nn.gelu(h, approximate=False)
        h = dense_cls(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class Esm2(nn.Module):
    """Returns last_hidden_state [B, L, H] (like HF EsmModel w/o pooler)."""

    config: Esm2Config
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    quant_int8: bool = False

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 deterministic: bool = True,
                 segment_ids: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)

        emb_table = self.param(
            "embed_tokens",
            nn.initializers.normal(stddev=0.02),
            (cfg.vocab_size, cfg.hidden_size),
        )
        x = jnp.take(emb_table, input_ids, axis=0).astype(self.dtype)

        if cfg.token_dropout:
            is_mask = (input_ids == cfg.mask_token_id)
            x = jnp.where(is_mask[..., None], 0.0, x)
            if segment_ids is None:
                src_lengths = jnp.maximum(attention_mask.sum(-1), 1)
                mask_ratio_observed = (
                    is_mask.astype(jnp.float32).sum(-1) / src_lengths
                )
                scale = ((1.0 - MASK_RATIO_TRAIN)
                         / (1.0 - mask_ratio_observed))[:, None]
            else:
                # PACKED rows: the rescale is per PROTEIN (segment), not
                # per row — a row-aggregate ratio would make packed and
                # unpacked encodings of the same protein diverge whenever
                # mask tokens are present (each protein must see its own
                # observed mask ratio, exactly as when encoded alone)
                same = ((segment_ids[:, :, None] == segment_ids[:, None, :])
                        & (segment_ids[:, None, :] >= 0))
                valid = attention_mask.astype(jnp.float32)
                seg_len = jnp.maximum(
                    jnp.einsum("blm,bm->bl", same.astype(jnp.float32),
                               valid), 1.0)
                seg_masked = jnp.einsum(
                    "blm,bm->bl", same.astype(jnp.float32),
                    is_mask.astype(jnp.float32))
                scale = ((1.0 - MASK_RATIO_TRAIN)
                         / (1.0 - seg_masked / seg_len))
            x = x * scale[..., None].astype(x.dtype)

        # zero out pad embeddings (HF EsmEmbeddings tail behaviour)
        x = x * attention_mask[..., None].astype(x.dtype)

        bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        # True lengths enable padded-block skipping in the fused kernel.
        # Measured on v5e: at length-bucketed fills (~75%) the skip variant
        # LOSES (330->409 ms/step at L=1024 B=16) — lax.cond + 256-blocks
        # cost more than the skipped work saves — so it stays opt-in for
        # low-fill workloads (ONEPROT_ATTN_SKIP=1).
        import os as _os

        lens = (attention_mask.sum(-1).astype(jnp.int32)
                if _os.environ.get("ONEPROT_ATTN_SKIP", "0") == "1" else None)

        layer_cls = Esm2Layer
        if self.remat:
            # `deterministic` is a python bool -> static under remat. flax
            # numbers the bound module as arg 0 (x=1, bias=2, lens=3,
            # deterministic=4); (3,) would mark `lens` static and leave
            # `deterministic` traced, crashing nn.Dropout when
            # lora_dropout>0 (advisor round-2 finding)
            layer_cls = nn.remat(Esm2Layer, static_argnums=(4,))
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, self.lora_rank, self.lora_alpha,
                          self.lora_dropout,
                          dtype=self.dtype, quant_int8=self.quant_int8,
                          name=f"layer_{i}")(x, bias, lens, deterministic,
                                             segment_ids)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_ln")(x)
        return x
