"""Retrieval metrics: R@k + median rank, both directions.

Re-implements the reference RetrievalMetric (reference src/models/components/
retrieval_metric.py:59-99): accumulate (sequence, modality) feature pairs
over the val/test epoch, then rank by dense similarity. The torchmetrics
cross-rank `dist_reduce_fx="cat"` (retrieval_metric.py:68-69) becomes
`gather_features`: on multi-process runs, eval-step outputs are global
sharded arrays whose non-addressable shards can't be materialized locally —
they are all-gathered across processes before ranking, so every host ranks
the identical global pool.

Ranking runs with host numpy (similarity matmul + argsort): val/test pools
are capped at 1000 rows (reference dataset __len__ caps), where a [1k, 1k]
argsort is microseconds — far below the device-dispatch latency a
lax.top_k round-trip would add.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def gather_features(x) -> np.ndarray:
    """Materialize eval features as a full host array on every process.

    Single-process: plain np.asarray. Multi-process: all-gather the
    non-addressable shards (the reference's torchmetrics cat-reduce,
    retrieval_metric.py:68-69)."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


class RetrievalMetric:
    def __init__(self, ks: Sequence[int] = (1, 10, 100)):
        self.ks = list(ks)
        self.reset()

    def reset(self) -> None:
        self._preds: List[np.ndarray] = []
        self._targets: List[np.ndarray] = []

    def update(self, sequence_features, modality_features) -> None:
        self._preds.append(np.asarray(sequence_features, dtype=np.float32))
        self._targets.append(np.asarray(modality_features, dtype=np.float32))

    def compute(self) -> Dict[str, float]:
        if not self._preds:
            return {}
        seq = np.concatenate(self._preds, axis=0)
        mod = np.concatenate(self._targets, axis=0)
        return retrieval_metrics(seq, mod, self.ks)


def retrieval_metrics(
    seq: np.ndarray, mod: np.ndarray, ks: Sequence[int] = (1, 10, 100)
) -> Dict[str, float]:
    """R@k + median rank for seq->mod and mod->seq (retrieval_metric.py:87-99).

    Rank of item i = position of column i in the descending sort of row i.
    Median rank is floor(median(0-based positions)) + 1, matching the
    reference's numpy expression exactly.
    """
    logits_per_sequence = seq @ mod.T
    out: Dict[str, float] = {}
    for name, logits in (
        ("seq_to_mod", logits_per_sequence),
        ("mod_to_seq", logits_per_sequence.T),
    ):
        ranking = np.argsort(-logits, axis=1, kind="stable")
        n = logits.shape[0]
        positions = np.argmax(ranking == np.arange(n)[:, None], axis=1)
        out[f"{name}_median_rank"] = float(np.floor(np.median(positions)) + 1)
        for k in ks:
            out[f"{name}_R@{k}"] = float(np.mean(positions < k))
    return out


class MeanMetric:
    """Streaming mean (torchmetrics.MeanMetric equivalent)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._total = 0.0
        self._count = 0

    def update(self, value: float, weight: int = 1) -> None:
        self._total += float(value) * weight
        self._count += weight

    def compute(self) -> float:
        return self._total / max(self._count, 1)


class MinMetric:
    """Running min (torchmetrics.MinMetric equivalent, for val/loss_best)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._best = float("inf")

    def update(self, value: float) -> None:
        self._best = min(self._best, float(value))

    def compute(self) -> float:
        return self._best
