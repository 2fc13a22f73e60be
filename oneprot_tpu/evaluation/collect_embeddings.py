"""Frozen-embedding collection for downstream probes.

Re-implements reference src/collect_embeddings.py: for each model x task x
split CSV, embed every sequence (mean-pooled last hidden state,
collect_embeddings.py:95-100), write per-shard files, then combine into
`{task}_{split}_embeddings_labels` (lines 266-291). Label types:
classification / regression / multi-label / ppi (lines 35-51; PPI pairs
concatenate the two sequence embeddings, lines 115-119).

TPU changes: the DDP-predict sharding becomes process-sharded chunks (each
JAX process embeds its slice on its addressable devices); backbones are the
first-party ESM2 (esm2/saprot names) or a trained OneProt run's sequence
tower; shards are .npz instead of .pt.
"""

from __future__ import annotations

import ast
import glob
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from oneprot_tpu.data.tokenizers import esm2_tokenizer, struct_token_tokenizer
from oneprot_tpu.utils.loggers import get_pylogger

log = get_pylogger(__name__)


class SequenceDataset:
    """CSV with columns sequence(+sequence_2 for ppi) and label/fitness
    (also accepts the simpler id,sequence,label fixture schema)."""

    def __init__(self, csv_file: str, label_type: str = "classification"):
        self.data = pd.read_csv(csv_file)
        self.label_type = label_type
        label_col = ("label/fitness" if "label/fitness" in self.data.columns
                     else "label")
        col = self.data[label_col]
        if label_type in ("classification", "ppi"):
            self.labels = col.values.astype(np.int64)
        elif label_type == "regression":
            self.labels = col.values.astype(np.float32)
        elif label_type == "multi-label":
            self.labels = np.array([ast.literal_eval(str(v)) for v in col],
                                   np.int32)
        else:
            raise ValueError(f"Unsupported label_type: {label_type}")

    def __len__(self):
        return len(self.data)

    def batch(self, idxs) -> Tuple[List[str], Optional[List[str]], np.ndarray]:
        rows = self.data.iloc[idxs]
        if self.label_type == "ppi":
            return (rows["sequence_1"].tolist(), rows["sequence_2"].tolist(),
                    self.labels[idxs])
        return rows["sequence"].tolist(), None, self.labels[idxs]


class EmbeddingBackbone:
    """Mean-pooled last-hidden-state embedder over ESM2 or a OneProt tower."""

    def __init__(self, kind: str = "esm2",
                 model_name_or_path: str = "facebook/esm2_t33_650M_UR50D",
                 run_dir: Optional[str] = None,
                 checkpoint_dir: Optional[str] = None,
                 max_length: int = 1024, seed: int = 0,
                 dtype: str = "bfloat16"):
        from oneprot_tpu.models.esm2 import Esm2, resolve_esm2_config

        self.kind = kind
        self.max_length = max_length
        if kind in ("esm2", "saprot"):
            self.tok = (struct_token_tokenizer() if kind == "saprot"
                        else esm2_tokenizer())
            cfg = resolve_esm2_config(model_name_or_path,
                                      vocab_size=self.tok.vocab_size)
            self.model = Esm2(cfg, dtype=jnp.bfloat16 if dtype == "bfloat16"
                              else jnp.float32)
            if checkpoint_dir:
                # the converted weights fully replace the params: skip the
                # random init (a full 650M on-device init that the next
                # line would throw away)
                from oneprot_tpu.models.hf_convert import (
                    convert_esm2_state_dict,
                    load_torch_state_dict,
                )

                sd = load_torch_state_dict(checkpoint_dir)
                extra = self.tok.vocab_size - 33 if kind == "saprot" else 0
                self.params = convert_esm2_state_dict(
                    sd, cfg.num_layers, extra_vocab_rows=extra)
            else:
                example = jnp.zeros((1, 8), jnp.int32)
                self.params = self.model.init(
                    jax.random.key(seed), example)["params"]
            # params are a jit ARGUMENT, not a closure: closing over them
            # bakes the full weight set into the HLO as constants —
            # enormous lowered programs and oversized compile payloads
            # through a remote-compile backend (serving.py observed
            # HTTP 413 on the identical pattern)
            self._embed = jax.jit(self._embed_esm2)
            self._embed_params = lambda: self.params
        elif kind in ("custom", "oneprot"):
            from oneprot_tpu.evaluation.retrieval_eval import load_trained_module
            from oneprot_tpu.train.checkpoint import CheckpointManager

            module, _ = load_trained_module(run_dir)
            self.tok = esm2_tokenizer()
            # FULL param template: the run's checkpoint was saved from a
            # TrainState holding ALL encoders, and Orbax restore raises on
            # a tree-structure mismatch against a sequence-only init
            # (same contract as retrieval_eval.embed_all)
            module.init_for_restore()
            best = os.path.join(run_dir, "checkpoints", "best")
            if os.path.isdir(best):
                module.state = CheckpointManager.restore_path(best, module.state)
            self.module = module
            self._embed = jax.jit(
                lambda params, ids: module.model.apply(
                    {"params": params}, ids, "sequence"))
            self._embed_params = lambda: module.state.params
        else:
            raise ValueError(f"Unknown backbone kind: {kind}")

    def _embed_esm2(self, params, ids: jax.Array) -> jax.Array:
        hidden = self.model.apply({"params": params}, ids)
        mask = (ids != 1).astype(hidden.dtype)[..., None]
        return (hidden * mask).sum(1) / mask.sum(1)

    def __call__(self, sequences: List[str], pad: int) -> np.ndarray:
        ids = jnp.asarray(self.tok(sequences, max_length=self.max_length,
                                   padding=pad))
        return np.asarray(self._embed(self._embed_params(), ids), np.float32)


def generate_embeddings(
    csv_file: str,
    output_dir: str,
    backbone: EmbeddingBackbone,
    label_type: str = "classification",
    batch_size: int = 32,
    buckets: Optional[List[int]] = None,
) -> None:
    """Embed one split CSV into per-process shard files."""
    from oneprot_tpu.data.common import pick_bucket

    os.makedirs(output_dir, exist_ok=True)
    ds = SequenceDataset(csv_file, label_type)
    rank = jax.process_index()
    nproc = jax.process_count()
    # clear THIS rank's stale shards: a re-run with a different batch size
    # leaves old higher-numbered shard files behind, and the combine glob
    # would silently merge them in (duplicated rows in the output)
    for stale in glob.glob(os.path.join(
            output_dir, f"embeddings_rank{rank}_batch*.npz")):
        os.remove(stale)
    idxs = np.arange(len(ds))[rank::nproc]
    for b, start in enumerate(range(0, len(idxs), batch_size)):
        chunk = idxs[start:start + batch_size]
        seqs, seqs2, labels = ds.batch(chunk)
        pad = pick_bucket(max(len(s) + 2 for s in seqs), buckets,
                          backbone.max_length)
        emb = backbone(seqs, pad)
        if seqs2 is not None:  # ppi: concat pair embeddings
            pad2 = pick_bucket(max(len(s) + 2 for s in seqs2), buckets,
                               backbone.max_length)
            emb = np.concatenate([emb, backbone(seqs2, pad2)], axis=1)
        np.savez(os.path.join(output_dir, f"embeddings_rank{rank}_batch{b}.npz"),
                 embeddings=emb, labels_fitness=labels)


def combine_embeddings_for_split(split_dir: str, output_file: str) -> None:
    """Concatenate per-shard files (reference lines 172-198)."""
    files = sorted(glob.glob(os.path.join(split_dir, "embeddings_rank*_batch*.npz")))
    embs, labels = [], []
    for f in files:
        data = np.load(f, allow_pickle=True)
        embs.append(data["embeddings"])
        labels.append(data["labels_fitness"])
    np.savez(output_file, embeddings=np.concatenate(embs, 0),
             labels_fitness=np.concatenate(labels, 0))
    log.info(f"combined {len(files)} shards -> {output_file} "
             f"({sum(len(e) for e in embs)} rows)")


def run_collection(cfg: Dict[str, Any]) -> List[str]:
    """Full flow from the collect_embeddings config."""
    outputs = []
    out_root = str(cfg["output_dir"])
    for model_name, model_cfg in dict(cfg["models"]).items():
        backbone = EmbeddingBackbone(
            kind=str(model_cfg.get("type", "esm2")),
            model_name_or_path=str(model_cfg.get(
                "model_name_or_path", "facebook/esm2_t33_650M_UR50D")),
            run_dir=model_cfg.get("run_dir"),
            checkpoint_dir=model_cfg.get("checkpoint_dir"),
            max_length=int(cfg.get("max_length", 1024)))
        for task in cfg.get("tasks", []):
            for split in cfg.get("splits", ["train", "valid", "test"]):
                csv_file = os.path.join(str(cfg["downstream_dir"]),
                                        f"{task}_{split}.csv")
                if not os.path.isfile(csv_file):
                    log.warning(f"missing {csv_file}; skipping")
                    continue
                shard_dir = os.path.join(out_root, model_name, task, split)
                generate_embeddings(
                    csv_file, shard_dir, backbone,
                    label_type=_task_label_type(task, cfg),
                    batch_size=int(cfg.get("batch_size", 32)),
                    buckets=_bucket_list(cfg))
                out = os.path.join(
                    out_root, model_name,
                    f"{task}_{split}_embeddings_labels.npz")
                # multi-process: all ranks finish their shards before
                # process 0 (alone) combines — unsynchronized, a fast rank
                # globbed while others were mid-write (BadZipFile /
                # missing rows) and every rank raced on the output file
                if jax.process_count() > 1:
                    from jax.experimental import multihost_utils

                    multihost_utils.sync_global_devices(
                        f"collect_{task}_{split}")
                if jax.process_index() == 0:
                    combine_embeddings_for_split(shard_dir, out)
                outputs.append(out)
    return outputs


def _task_label_type(task: str, cfg: Dict[str, Any]) -> str:
    """Per-task label family: tasks in one run differ (EC is multi-label,
    DeepLoc10 classification), so a single config-wide label_type either
    crashes the CSV parse or mislabels the probe input. The registry's
    per-task type wins; an explicit cfg label_type is the fallback for
    tasks the registry does not know."""
    from oneprot_tpu.downstream.mlp_probe import TASK_REGISTRY

    info = TASK_REGISTRY.get(task)
    if info is not None:
        return str(info["type"])
    return str(cfg.get("label_type", "classification"))


def _bucket_list(cfg: Dict[str, Any]):
    """Length buckets for the embed forwards: without them every distinct
    per-batch max length compiles a fresh 650M executable (multi-minute
    each through a tunneled backend)."""
    from oneprot_tpu.serving import DEFAULT_BUCKETS

    buckets = cfg.get("buckets") or list(DEFAULT_BUCKETS)
    return [int(b) for b in buckets]
