"""HF checkpoint conversion: torch EsmModel/BertModel state dicts -> flax params.

The reference pulls pretrained ESM2/BiomedBERT weights through
`transformers.AutoModel.from_pretrained` (reference src/models/components/
sequence_encoder.py:50-55). The TPU build loads the same checkpoints from
disk (pytorch_model.bin or model.safetensors) and converts them into the
first-party flax trees. Conversion is exercised in tests against
randomly-initialized HF models built offline from configs, which pins the
layer mapping AND the numerics of our implementations.

Also covers the struct-token embedding resize (+21 3Di rows,
struct_token_encoder.py:27) and peft-LoRA adapter import/export for the
q/k/v target modules (sequence_encoder.py:61-74).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import numpy as np


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _strip_prefix(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Drop the model-root prefix ('esm.', 'bert.') if present."""
    out = {}
    for k, v in sd.items():
        for pref in ("esm.", "bert.", "model."):
            if k.startswith(pref):
                k = k[len(pref):]
                break
        out[k] = _np(v)
    return out


def load_torch_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load a HF checkpoint directory (safetensors preferred, else .bin)."""
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.isfile(st_path):
        from safetensors.numpy import load_file

        return dict(load_file(st_path))
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.isfile(bin_path):
        import torch

        return {k: _np(v) for k, v in torch.load(
            bin_path, map_location="cpu", weights_only=True).items()}
    raise FileNotFoundError(f"No checkpoint found in {model_dir}")


# ---------------------------------------------------------------------------
# ESM2
# ---------------------------------------------------------------------------


def convert_esm2_state_dict(
    state_dict: Mapping[str, Any],
    num_layers: int,
    extra_vocab_rows: int = 0,
    seed: int = 0,
) -> Dict[str, Any]:
    """HF EsmModel state dict -> Esm2 flax params (the 'transformer' subtree).

    extra_vocab_rows appends newly-initialized embedding rows (the reference's
    `resize_token_embeddings(vocab+21)` for 3Di tokens).
    """
    sd = _strip_prefix(state_dict)

    def lin(name):  # torch Linear -> flax Dense
        return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    emb = sd["embeddings.word_embeddings.weight"]
    if extra_vocab_rows:
        rng = np.random.RandomState(seed)
        new_rows = rng.normal(0.0, 0.02, (extra_vocab_rows, emb.shape[1]))
        emb = np.concatenate([emb, new_rows.astype(emb.dtype)], axis=0)

    params: Dict[str, Any] = {"embed_tokens": emb}
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attn_ln": ln(f"{p}.attention.LayerNorm"),
            "attn": {
                "q": {"dense": lin(f"{p}.attention.self.query")},
                "k": {"dense": lin(f"{p}.attention.self.key")},
                "v": {"dense": lin(f"{p}.attention.self.value")},
                "o": lin(f"{p}.attention.output.dense"),
            },
            "ffn_ln": ln(f"{p}.LayerNorm"),
            "fc1": lin(f"{p}.intermediate.dense"),
            "fc2": lin(f"{p}.output.dense"),
        }
    params["final_ln"] = ln("encoder.emb_layer_norm_after")
    return params


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------


def convert_bert_state_dict(
    state_dict: Mapping[str, Any], num_layers: int
) -> Dict[str, Any]:
    """HF BertModel state dict -> Bert flax params subtree."""
    sd = _strip_prefix(state_dict)

    def lin(name):
        return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    params: Dict[str, Any] = {
        "word_embeddings": sd["embeddings.word_embeddings.weight"],
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attn": {
                "q": {"dense": lin(f"{p}.attention.self.query")},
                "k": {"dense": lin(f"{p}.attention.self.key")},
                "v": {"dense": lin(f"{p}.attention.self.value")},
                "o": lin(f"{p}.attention.output.dense"),
            },
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "fc1": lin(f"{p}.intermediate.dense"),
            "fc2": lin(f"{p}.output.dense"),
            "ffn_ln": ln(f"{p}.output.LayerNorm"),
        }
    return params


# ---------------------------------------------------------------------------
# fair-esm MSA-Transformer (.pt) -> MsaTransformer params
# ---------------------------------------------------------------------------


def load_fairesm_checkpoint(pt_path: str) -> Dict[str, np.ndarray]:
    """Load a fair-esm .pt (the reference loads esm_msa1b from a local .pt,
    reference msa_encoder.py:18)."""
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return {k: _np(v) for k, v in sd.items()}


def convert_msa1b_state_dict(
    state_dict: Mapping[str, Any], num_layers: int
) -> Dict[str, Any]:
    """fair-esm MSATransformer state dict -> MsaTransformer flax params.

    Name mapping (fair-esm AxialTransformerLayer wraps each sublayer in a
    NormalizedResidualBlock): layers.{i}.row_self_attention.{layer_norm,
    layer.{q,k,v,out}_proj} etc. The learned column positions are stored with
    fair-esm's padding-idx offset (+2 rows); real MSA rows are left-aligned,
    so absolute indexing after dropping the first two rows is equivalent.
    """
    sd = {k.removeprefix("encoder.").removeprefix("sentence_encoder."): _np(v)
          for k, v in state_dict.items()}

    def lin(name):
        return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    msa_pos = sd["msa_position_embedding"]
    msa_pos = msa_pos.reshape(msa_pos.shape[-3], 1, msa_pos.shape[-1]) \
        if msa_pos.ndim == 4 else msa_pos
    params: Dict[str, Any] = {
        "embed_tokens": sd["embed_tokens.weight"],
        "embed_positions": sd["embed_positions.weight"][2:],
        "msa_position_embedding": msa_pos,
        "emb_ln_before": ln("emb_layer_norm_before"),
        "emb_ln_after": ln("emb_layer_norm_after"),
    }
    for i in range(num_layers):
        p = f"layers.{i}"
        params[f"layer_{i}"] = {
            "row_ln": ln(f"{p}.row_self_attention.layer_norm"),
            "row_attn": {
                "q": lin(f"{p}.row_self_attention.layer.q_proj"),
                "k": lin(f"{p}.row_self_attention.layer.k_proj"),
                "v": lin(f"{p}.row_self_attention.layer.v_proj"),
                "o": lin(f"{p}.row_self_attention.layer.out_proj"),
            },
            "col_ln": ln(f"{p}.column_self_attention.layer_norm"),
            "col_attn": {
                "q": lin(f"{p}.column_self_attention.layer.q_proj"),
                "k": lin(f"{p}.column_self_attention.layer.k_proj"),
                "v": lin(f"{p}.column_self_attention.layer.v_proj"),
                "o": lin(f"{p}.column_self_attention.layer.out_proj"),
            },
            "ffn_ln": ln(f"{p}.feed_forward_layer.layer_norm"),
            "fc1": lin(f"{p}.feed_forward_layer.layer.fc1"),
            "fc2": lin(f"{p}.feed_forward_layer.layer.fc2"),
        }
    return params


# ---------------------------------------------------------------------------
# peft LoRA adapters (q/k/v)
# ---------------------------------------------------------------------------

_PEFT_NAME = {"q": "query", "k": "key", "v": "value"}


def import_peft_lora(
    adapter_state: Mapping[str, Any], params: Dict[str, Any], num_layers: int
) -> Dict[str, Any]:
    """Merge a peft adapter_model state dict into LoraDense params in-place.

    peft stores `...query.lora_A.weight [r, in]` / `lora_B.weight [out, r]`;
    LoraDense stores lora_A [in, r], lora_B [r, out].
    """
    sd = {k: _np(v) for k, v in adapter_state.items()}

    def find(i: int, proj: str, which: str) -> Optional[np.ndarray]:
        suffix = f"layer.{i}.attention.self.{_PEFT_NAME[proj]}.lora_{which}.weight"
        for k, v in sd.items():
            if k.endswith(suffix):
                return v
        return None

    for i in range(num_layers):
        for proj in ("q", "k", "v"):
            a = find(i, proj, "A")
            b = find(i, proj, "B")
            if a is None or b is None:
                continue
            node = params[f"layer_{i}"]["attn"][proj]
            node["lora_A"] = a.T
            node["lora_B"] = b.T
    return params


def export_peft_lora(params: Dict[str, Any], num_layers: int,
                     prefix: str = "base_model.model.encoder") -> Dict[str, np.ndarray]:
    """LoraDense params -> peft-layout adapter state dict (for
    PeftBestModelCheckpoint parity, reference peft_checkpoint.py:12-21)."""
    out: Dict[str, np.ndarray] = {}
    for i in range(num_layers):
        layer = params.get(f"layer_{i}", {})
        attn = layer.get("attn", {})
        for proj in ("q", "k", "v"):
            node = attn.get(proj, {})
            if "lora_A" in node:
                name = f"{prefix}.layer.{i}.attention.self.{_PEFT_NAME[proj]}"
                out[f"{name}.lora_A.weight"] = _np(node["lora_A"]).T
                out[f"{name}.lora_B.weight"] = _np(node["lora_B"]).T
    return out
