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


_REPLICATORS: Dict[Any, Any] = {}


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    if hasattr(t, "is_fully_addressable") and not t.is_fully_addressable:
        # multi-host pod: model-parallel leaves (e.g. lora_B, sharded along
        # the model axis by core/partitioning.py:58) span hosts, where a
        # direct np.asarray raises — replicate through a collective identity
        # first; every process must reach this call. The jitted identity is
        # cached per target sharding: a fresh lambda per leaf would retrace
        # the reshard for every exported tensor (num_layers x 3 LoRA pairs
        # on every val-loss improvement).
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(t.sharding.mesh, PartitionSpec())
        fn = _REPLICATORS.get(sh)
        if fn is None:
            fn = jax.jit(lambda a: a, out_shardings=sh)
            _REPLICATORS[sh] = fn
        t = fn(t)
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


# ---------------------------------------------------------------------------
# Reference-trained OneProt Lightning checkpoints -> flax params
# ---------------------------------------------------------------------------


def load_lightning_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference Lightning .ckpt and return its state_dict
    (reference eval.py:128-133 `torch.load(...)["state_dict"]`)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: _np(v) for k, v in sd.items()}


def _split_peft(tsd: Mapping[str, np.ndarray]):
    """Normalize a (possibly peft-wrapped) HF transformer state dict:
    strips `base_model.model.` / `.base_layer` (peft Linear wrapping) and
    splits out LoRA factors keyed `<module>.lora_{A,B}.weight` (the adapter
    name infix `.default.` is dropped)."""
    import re

    hf, lora = {}, {}
    for k, v in tsd.items():
        k = k.removeprefix("base_model.model.").replace(".base_layer", "")
        m = re.match(r"(.*)\.lora_([AB])\.(?:[^.]+\.)?weight$", k)
        if m:
            lora[f"{m.group(1)}.lora_{m.group(2)}.weight"] = v
        else:
            hf[k] = v
    return hf, lora


def _convert_ref_head(sub: Mapping[str, np.ndarray], enc) -> Dict[str, Any]:
    """Reference BaseEncoder head (proj/norm/pooling Sequentials,
    base_encoder.py:129-194) -> EncoderHead flax params."""

    def ln(n):
        return {"scale": sub[f"{n}.weight"], "bias": sub[f"{n}.bias"]}

    head: Dict[str, Any] = {}
    proj_type = getattr(enc, "proj_type", None)
    if proj_type == "linear":
        head["proj"] = {"ln": ln("proj.0"),
                        "dense": {"kernel": sub["proj.1.weight"].T}}
    elif proj_type == "mlp":
        head["proj"] = {"ln1": ln("proj.0"),
                        "dense1": {"kernel": sub["proj.1.weight"].T},
                        "ln2": ln("proj.3"),
                        "dense2": {"kernel": sub["proj.4.weight"].T}}
    if (getattr(enc, "learnable_logit_scale", False)
            and "norm.1.log_logit_scale" in sub):
        head["logit_scale"] = {
            "log_logit_scale": np.asarray(
                sub["norm.1.log_logit_scale"]).reshape(())}
    if (getattr(enc, "pooling_type", "") == "attention1d"
            and "pooling.layer.weight" in sub):
        # MaskedConv1d(hidden, 1, kernel=1): weight [1, hidden, 1] is exactly
        # a Dense(hidden -> 1) kernel
        w = np.asarray(sub["pooling.layer.weight"]).reshape(1, -1).T
        head["attention1d"] = {"attn": {
            "kernel": w, "bias": np.asarray(sub["pooling.layer.bias"])}}
    return head


def _merge_converted(target: Any, new: Any, path: str = "") -> Any:
    """Deep-merge `new` onto the param template `target`, preserving leaves
    the checkpoint does not cover and casting to the template dtype."""
    if isinstance(target, dict):
        out = dict(target)
        if not isinstance(new, dict):
            raise ValueError(f"structure mismatch at {path!r}")
        for k, v in new.items():
            if k in out:
                out[k] = _merge_converted(out[k], v, f"{path}/{k}")
            else:
                raise KeyError(
                    f"checkpoint key {path}/{k} not in param template")
        return out
    arr = np.asarray(new)
    tgt = np.asarray(target)
    if arr.shape != tgt.shape:
        raise ValueError(
            f"shape mismatch at {path!r}: ckpt {arr.shape} vs "
            f"model {tgt.shape}")
    return arr.astype(tgt.dtype)


def convert_oneprot_state_dict(
    state_dict: Mapping[str, Any],
    encoders: Mapping[str, Any],
    params: Dict[str, Any],
    seed: int = 0,
) -> Dict[str, Any]:
    """Map a reference-trained OneProtLitModule state_dict onto the flax
    param tree (VERDICT r2 #3; reference src/train.py:73-82 strips an
    optional `model.` prefix, src/eval.py:128-133 loads raw).

    Covers all encoder towers whose architectures transfer weight-for-weight
    (sequence/struct_token: HF EsmModel incl. peft-LoRA factors; text: HF
    BertModel; msa: fair-esm MSATransformer) plus every head (projection,
    learnable logit scale, attention1d pooling). The struct_graph/pocket GNN
    is a first-party re-design (dense padded kNN vs DIG ProNet's
    torch_geometric graph), so only its head converts — backbone weights
    from DIG cannot be mapped and a warning is logged.
    """
    import logging

    log = logging.getLogger(__name__)
    sd = {k: _np(v) for k, v in state_dict.items()}
    first = next(iter(sd), "")
    if first.startswith("model."):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}

    out = dict(params)
    for name, enc in encoders.items():
        pref = f"network.{name}."
        sub = {k[len(pref):]: v for k, v in sd.items() if k.startswith(pref)}
        key = f"encoders_{name}"
        if not sub or key not in params:
            continue
        tgt = dict(out[key])
        tsd = {k[len("transformer."):]: v for k, v in sub.items()
               if k.startswith("transformer.")}
        cls = type(enc).__name__
        conv = None
        if cls in ("SequenceEncoder", "StructTokenEncoder") and tsd:
            hf, lora = _split_peft(tsd)
            emb_rows = hf["embeddings.word_embeddings.weight"].shape[0]
            extra = enc.config.vocab_size - emb_rows
            conv = convert_esm2_state_dict(
                hf, enc.config.num_layers,
                extra_vocab_rows=max(extra, 0), seed=seed)
            if lora:
                conv = import_peft_lora(lora, conv, enc.config.num_layers)
            if getattr(enc, "quant_int8", False):
                from oneprot_tpu.models.esm2 import quantize_esm2_int8_tree

                conv = quantize_esm2_int8_tree(conv)
        elif cls == "TextEncoder" and tsd:
            hf, lora = _split_peft(tsd)
            conv = convert_bert_state_dict(hf, enc.config.num_layers)
            if lora:
                conv = import_peft_lora(lora, conv, enc.config.num_layers)
        elif cls == "MsaEncoder" and tsd:
            conv = convert_msa1b_state_dict(tsd, enc.config.num_layers)
        elif tsd or any(k.startswith("encoder.") for k in sub):
            log.warning(
                f"{name}: reference GNN backbone (DIG ProNet) does not map "
                "onto the first-party graph encoder; converting head only")
        if conv is not None:
            tgt["transformer"] = _merge_converted(
                tgt["transformer"], conv, f"{name}/transformer")
        head = _convert_ref_head(sub, enc)
        if head:
            tgt["head"] = _merge_converted(tgt["head"], head, f"{name}/head")
        out[key] = tgt
    return out
