"""Optimizer construction + parameter freeze/trainability masks.

The reference uses a single Adam over all parameters (reference
configs/model/default.yaml optimizer block), with freezing expressed through
`requires_grad=False` on backbone transformers (sequence_encoder.py:57-59)
and peft-LoRA marking adapters (+ all biases, `bias="all"`) trainable
(sequence_encoder.py:61-74).

TPU equivalent: a path-based trainability mask over the flax param tree.
The train step differentiates ONLY the trainable subtree (frozen backbones
never get a backward pass — a large win over torch's requires_grad, which
still backprops through frozen layers that feed trainable ones upstream of
the head), and optax states exist only for trainable leaves.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import optax


def adam(lr: float = 1e-3, weight_decay: float = 0.0, **kwargs: Any):
    """torch.optim.Adam-surface factory (reference model/default.yaml keys).

    Built through optax.inject_hyperparams so the learning rate lives in the
    optimizer state and can be rewritten at runtime (plateau scheduler,
    oneprot_tpu/train/scheduler.py) without recompiling the train step.
    """
    if weight_decay:
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay,
            eps=1e-8, b1=0.9, b2=0.999)
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, eps=1e-8, b1=0.9, b2=0.999)


def build_optimizer(
    optimizer_fn: Optional[Callable[[], optax.GradientTransformation]] = None,
    gradient_clip_val: float = 1.0,
) -> optax.GradientTransformation:
    """clip-by-global-norm (reference oneprot_module.py:106) -> Adam."""
    base = optimizer_fn() if optimizer_fn is not None else adam()
    chain = []
    if gradient_clip_val and gradient_clip_val > 0:
        chain.append(optax.clip_by_global_norm(gradient_clip_val))
    chain.append(base)
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# Trainability masks
# ---------------------------------------------------------------------------


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
        else:
            names.append(str(p))
    return tuple(names)


def trainable_mask(
    params: Dict[str, Any], encoders: Dict[str, Any]
) -> Dict[str, Any]:
    """True = trainable. Mirrors the reference's freeze semantics:

      - encoder.frozen and no LoRA: entire `transformer` subtree frozen
      - encoder.frozen with LoRA: lora_A/lora_B and all biases trainable
        (peft `bias="all"`, sequence_encoder.py:70), rest of transformer frozen
      - heads (pool/proj/logit-scale) always trainable
      - non-transformer encoders (GNN/MSA wrapper) follow their own flags
        (MSA transformer is always frozen, msa_encoder.py:30-32)
    """
    flags = {}
    for name, enc in encoders.items():
        frozen = bool(getattr(enc, "frozen", False))
        lora = int(getattr(enc, "lora_rank", 0)) > 0
        flags[name] = (frozen, lora)

    def decide(path: Tuple[str, ...]) -> bool:
        # path[0] like "encoders_sequence"
        enc_name = path[0][len("encoders_"):] if path[0].startswith("encoders_") else path[0]
        frozen, lora = flags.get(enc_name, (False, False))
        if not frozen:
            return True
        in_transformer = "transformer" in path or "encoder" in path
        if not in_transformer:
            return True  # head subtree
        if lora:
            leaf = path[-1]
            if leaf in ("lora_A", "lora_B", "bias"):
                return True
        return False

    return jax.tree_util.tree_map_with_path(
        lambda path, _: decide(_path_names(path)), params
    )


def partition_params(params, mask):
    """Split into (trainable, frozen) trees with None placeholders."""
    trainable = jax.tree.map(
        lambda p, m: p if m else None, params, mask,
        is_leaf=lambda x: x is None)
    frozen = jax.tree.map(
        lambda p, m: None if m else p, params, mask,
        is_leaf=lambda x: x is None)
    return trainable, frozen


def merge_params(trainable, frozen):
    return jax.tree.map(
        lambda t, f: t if f is None else f, trainable, frozen,
        is_leaf=lambda x: x is None)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree) if hasattr(x, "size"))
