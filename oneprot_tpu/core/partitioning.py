"""Parameter partitioning rules: Megatron-style tensor parallelism.

The reference never shards parameters (DDP only, SURVEY §2.3); the TPU build
adds an optional "model" mesh axis for large hubs (ESM2-3B+). Rules are
path-based over the flax param tree:

  - attention q/k/v kernels  [H, H]    -> P(None, "model")   (column-parallel)
  - attention o kernel       [H, H]    -> P("model", None)   (row-parallel)
  - MLP fc1 kernel           [H, 4H]   -> P(None, "model")
  - MLP fc2 kernel           [4H, H]   -> P("model", None)
  - matching biases follow their kernel's output sharding
  - embeddings, layer norms, heads, LoRA A: replicated

With these placements GSPMD inserts the canonical all-reduce after o/fc2;
activations stay batch-sharded over "data". `shard_params` places a param
tree onto the mesh; with model=1 everything is replicated (pure DP).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from oneprot_tpu.core.mesh import MODEL_AXIS


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


def param_pspec(path_names: Tuple[str, ...], ndim: int) -> P:
    joined = "/".join(path_names)
    leaf = path_names[-1]
    if leaf == "kernel" and ndim == 2:
        if any(f"/attn/{p}/dense/kernel" in f"/{joined}" for p in "qkv"):
            return P(None, MODEL_AXIS)
        if joined.endswith("attn/o/kernel"):
            return P(MODEL_AXIS, None)
        if joined.endswith("fc1/kernel"):
            return P(None, MODEL_AXIS)
        if joined.endswith("fc2/kernel"):
            return P(MODEL_AXIS, None)
    if leaf == "bias" and ndim == 1:
        if any(f"/attn/{p}/dense/bias" in f"/{joined}" for p in "qkv"):
            return P(MODEL_AXIS)
        if joined.endswith("fc1/bias"):
            return P(MODEL_AXIS)
    if leaf == "lora_B" and ndim == 2:
        if "/attn/" in f"/{joined}":
            return P(None, MODEL_AXIS)
    return P()


def _divisible(shape, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, tuple(spec) + (None,) * len(shape)):
        if axis is None:
            continue
        if dim % mesh.shape[axis] != 0:
            return False
    return True


def _placement_spec(path, x, mesh: Mesh) -> P:
    if mesh.shape.get(MODEL_AXIS, 1) > 1 and hasattr(x, "shape"):
        spec = param_pspec(_path_names(path), getattr(x, "ndim", 0))
        if spec != P() and not _divisible(x.shape, spec, mesh):
            spec = P()
        return spec
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put every param with its rule's NamedSharding."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, _placement_spec(path, x, mesh))),
        params)


def abstract_placed(tree: Any, mesh: Mesh) -> Any:
    """ShapeDtypeStructs carrying the shardings `shard_params` would assign.

    Lets AOT lowering (`jax.jit(...).lower(abstract_state, ...)`) happen
    BEFORE the real `module.init` executes: lower against
    `abstract_placed(jax.eval_shape(module.init, batch), mesh)` and the
    compiled executable accepts the real mesh-placed state. The path rules
    tolerate the extra 'params'/'opt_state' prefix (they match on suffixes).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=NamedSharding(mesh, _placement_spec(path, x, mesh))),
        tree)


def state_shardings(state: Any) -> Any:
    """Sharding pytree of an already-placed state (for jit out_shardings)."""
    return jax.tree.map(
        lambda x: x.sharding if hasattr(x, "sharding") else None, state)
