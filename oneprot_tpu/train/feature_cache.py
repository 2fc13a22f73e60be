"""Frozen-backbone feature cache.

The reference's production config freezes the ESM2-650M hub (reference
configs/model/components/sequence.yaml: frozen: true, use_lora: false), so
the hub's transformer+pooling output for a tokenized sequence is constant
for the entire run — yet the reference recomputes it every step of every
epoch (the dominant cost of its hot loop, oneprot_module.py:95). This cache
stores the pooled [d_model] representation per unique tokenized row after
its first computation; subsequent epochs train through the head only
(OneProtModule.train_step_cached), with numerics equal to the uncached step
(tests/test_feature_cache.py).

Keying: the raw bytes of the tokenized id row — exact, collision-free, and
independent of dataset indices (works across shuffles and loaders).
Memory: entries * d_model * 4 bytes (650M hub: 1M samples -> ~5 GB host
RAM); cap with max_entries (LRU-free: once full, misses just recompute).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class FrozenFeatureCache:
    def __init__(self, max_entries: Optional[int] = None):
        self._store: Dict[bytes, np.ndarray] = {}
        self.max_entries = max_entries
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        return len(self._store)

    def get_pooled(self, module, seq_inputs,
                   modality: str = "sequence") -> np.ndarray:
        """Pooled backbone representations for a batch, cached where known.

        On any miss the whole batch is computed in one jitted forward and
        every row is stored (first epoch = all misses, one forward per
        batch exactly like the uncached path). Entries are namespaced by
        encoder ('seqsim' shares the sequence encoder and its entries)."""
        if modality in ("sequence", "seqsim"):
            modality = "sequence"
        ns = modality.encode() + b"|"
        seq_np = np.ascontiguousarray(np.asarray(seq_inputs))
        keys = [ns + row.tobytes() for row in seq_np]
        if all(k in self._store for k in keys):
            self.hits += len(keys)
            return np.stack([self._store[k] for k in keys])
        self.misses += len(keys)
        pooled = np.asarray(
            module.encode_pooled(module.state.params, modality, seq_np))
        if self.max_entries is None or len(self._store) < self.max_entries:
            for k, row in zip(keys, pooled):
                self._store[k] = row
                if (self.max_entries is not None
                        and len(self._store) >= self.max_entries):
                    break
        return pooled
