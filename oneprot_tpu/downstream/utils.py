"""Downstream-probe utilities: f1_max, embedding loading, results CSV.

Re-implements reference src/utils/downstream.py: `count_f1_max` (the
TorchDrug threshold-optimal F1, lines 12-59 — numpy port verified against
the torch algorithm in tests), the embeddings loader with optional label
binarization (lines 121-147), and the fixed-width results-CSV appender
(lines 62-118).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional, Tuple

import numpy as np


def count_f1_max(pred: np.ndarray, target: np.ndarray) -> float:
    """F1 at the optimal global threshold (TorchDrug algorithm).

    pred: [B, N] scores; target: [B, N] binary. Sweeps every distinct score
    as a threshold; precision averages only over samples that have at least
    one prediction at the threshold, recall averages over all samples.
    """
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    b, n = pred.shape

    order = np.argsort(-pred, axis=1, kind="stable")
    target_sorted = np.take_along_axis(target, order, axis=1)
    cum = target_sorted.cumsum(1)
    precision = cum / np.arange(1, n + 1)[None, :]
    recall = cum / (target.sum(1, keepdims=True) + 1e-10)

    is_start = np.zeros_like(target_sorted, dtype=bool)
    is_start[:, 0] = True
    is_start_scattered = np.zeros_like(is_start)
    np.put_along_axis(is_start_scattered, order, is_start, axis=1)

    all_order = np.argsort(-pred.flatten(), kind="stable")
    order_flat = (order + np.arange(b)[:, None] * n).flatten()
    inv_order = np.zeros_like(order_flat)
    inv_order[order_flat] = np.arange(b * n)
    is_start_f = is_start_scattered.flatten()[all_order]
    all_order = inv_order[all_order]

    precision_f = precision.flatten()
    recall_f = recall.flatten()
    all_precision = precision_f[all_order] - np.where(
        is_start_f, 0.0, precision_f[all_order - 1])
    all_precision = np.cumsum(all_precision) / np.cumsum(is_start_f)
    all_recall = recall_f[all_order] - np.where(
        is_start_f, 0.0, recall_f[all_order - 1])
    all_recall = np.cumsum(all_recall) / b
    all_f1 = 2 * all_precision * all_recall / (
        all_precision + all_recall + 1e-10)
    return float(np.max(all_f1))


def load_data(
    path: str, binarize_threshold: Optional[float] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Load a combined embeddings file (.npz from collect_embeddings)."""
    data = np.load(path, allow_pickle=True)
    emb = np.asarray(data["embeddings"], np.float32)
    labels = np.asarray(data["labels_fitness"])
    if binarize_threshold is not None:
        labels = (labels > binarize_threshold).astype(np.int64)
    return emb, labels


def save_results_to_csv(results: Dict[str, float], output_path: str,
                        header_order: Optional[list] = None) -> None:
    """Append one fixed-width row per run (reference downstream.py:62-118)."""
    keys = header_order or list(results.keys())
    exists = os.path.isfile(output_path)
    with open(output_path, "a", newline="") as f:
        writer = csv.writer(f)
        if not exists:
            writer.writerow([f"{k:<20}" for k in keys])
        writer.writerow([
            f"{results.get(k, ''):<20}" if not isinstance(results.get(k), float)
            else f"{results[k]:<20.5f}"
            for k in keys
        ])
