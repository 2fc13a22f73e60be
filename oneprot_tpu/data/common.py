"""Shared data-layer plumbing: HDF5 handle cache, bucketing, base dataset.

Fixes the reference's per-sample `h5py.File` open (reference
src/data/datasets/text_dataset.py:43, struct_graph_dataset.py:47 — flagged in
SURVEY §3.5 as a known host-side inefficiency): handles are opened once per
(path, thread) and reused.

Length bucketing is the key torch->XLA change (SURVEY §7 hard-part 1): every
batch is padded up to a static bucket length so each (modality, bucket)
shape compiles exactly once.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


class H5Cache:
    """Per-thread cache of open h5py.File handles (h5py handles are not
    thread-safe to share, but are cheap to hold per thread)."""

    def __init__(self):
        self._local = threading.local()

    def get(self, path: str):
        if h5py is None:
            raise ImportError("h5py is required for HDF5 datasets")
        files = getattr(self._local, "files", None)
        if files is None:
            files = {}
            self._local.files = files
        if path not in files:
            files[path] = h5py.File(path, "r")
        return files[path]


H5 = H5Cache()


def pick_bucket(length: int, buckets: Optional[Sequence[int]],
                max_length: int) -> int:
    """Smallest bucket >= length, else max bucket (inputs then truncate)."""
    cap = max_length
    if not buckets:
        return min(length, cap)
    for b in sorted(buckets):
        if length <= b:
            return min(b, cap)
    return min(sorted(buckets)[-1], cap)


class BaseDataset:
    """Item protocol mirrors the reference datasets: __getitem__ returns an
    id; `collate_fn(ids)` does IO + tokenization and returns the batch tuple
    (seq_tokens, modality_input, modality, raw_seqs)."""

    modality: str = ""
    split: str = "train"
    val_test_cap: int = 1000  # reference __len__ cap (text_dataset.py:30-32)

    def __len__(self) -> int:
        n = self.num_items()
        if self.split == "train":
            return n
        return min(n, self.val_test_cap) if n else 0

    def num_items(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, idx: int):  # pragma: no cover - abstract
        raise NotImplementedError

    def collate_fn(self, items, rng: Optional[np.random.RandomState] = None):
        raise NotImplementedError
