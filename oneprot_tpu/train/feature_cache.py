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
independent of dataset indices (works across shuffles and loaders). PACKED
batches key each protein by its token SUBSEQUENCE bytes instead, so entries
hit across epochs even though the packer re-arranges rows every epoch.

Memory: entries * d_model * 4 bytes (650M hub: 1M samples -> ~5 GB host
RAM); cap with max_entries. Eviction is LRU (round-2's insert-stop policy
permanently pinned whichever rows arrived first and recomputed everything
else forever — the worst case when the cap binds; advisor/VERDICT r2 #8).

Persistence (VERDICT r4 next-step 3): pass `persist_dir` and every computed
row is ALSO appended to an on-disk shard store (`DiskFeatureStore`), and
RAM misses fall back to a disk lookup before recomputing. This turns the
steady-state speedup from a per-process property into a per-dataset one:
the chain-resubmission workflow (scripts/start_training_chain.sh) restarts
the process every job, and without persistence every link re-paid the full
epoch-1 hub cost. Disk size: entries * (d_model * 4 + key) bytes — ~5.3 GB
per 1M samples at d=1280; cap RAM with max_entries (the disk store is
append-only and uncapped; delete the directory to reclaim space). The
store is guarded by a fingerprint of the FROZEN params (see
params_fingerprint): a persist_dir reused across different checkpoints
raises instead of serving stale features.
"""

from __future__ import annotations

import hashlib
import os
import struct
from collections import OrderedDict
from typing import Optional

import numpy as np


def params_fingerprint(params) -> str:
    """Cheap deterministic digest of a (frozen) param tree.

    Per leaf: tree path, shape, dtype, and the first 4 values — enough to
    catch a different checkpoint, model size, or vocabulary behind an
    existing persist_dir without transferring full weights off-device
    (the 650M hub stays put; only 4-element slices move). The digest is
    sharding-independent: slices are taken through JAX's logical indexing,
    not per-shard buffers."""
    import jax

    h = hashlib.sha256()
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if leaf is None:
            continue
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(tuple(getattr(leaf, "shape", ()))).encode())
        h.update(str(getattr(leaf, "dtype", "")).encode())
        try:
            head = np.asarray(jax.device_get(
                leaf.reshape(-1)[:4] if hasattr(leaf, "reshape") else leaf))
            h.update(np.asarray(head, np.float32).tobytes())
        except RuntimeError:
            # a leaf sharded across non-addressable devices (multi-host
            # model parallelism) cannot be fetched; fold its metadata only.
            # The digest stays deterministic for a given topology — a
            # store shared across topologies may mismatch, which errs on
            # the refuse-stale side
            h.update(b"non-addressable")
    return h.hexdigest()


class DiskFeatureStore:
    """Append-only persistent shard store for pooled feature rows.

    Layout: `<dir>/shard-<pid>-<seq>.idx/.bin` pairs. The `.bin` holds raw
    little-endian float32 row data back to back; the `.idx` frames each
    entry as `[key_len:u32][dim:u32][offset:u64][key bytes]`. Each process
    appends to its OWN shard pair (name unique per pid + counter), so
    concurrent chain links never contend and no locking is needed; readers
    merge every shard's index at open (last writer wins on duplicate keys
    — rows for a given key are identical by construction, the hub is
    frozen). Row reads go through np.memmap, so the OS page cache — not
    this process — owns the resident set; a warm restart touches only the
    pages it actually reads.

    Rows are stored as float32 (pooled features are f32-accumulated;
    bf16 inputs upcast losslessly).
    """

    MAGIC = b"OPFC1\n"

    def __init__(self, directory: str, flush_every: int = 256,
                 fingerprint: Optional[str] = None):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self._check_fingerprint(fingerprint)
        self._index: dict = {}  # key -> (bin_path, offset, dim)
        self._mmaps: dict = {}  # bin_path -> np.memmap
        self._load_existing()
        self._flush_every = max(int(flush_every), 1)
        self._pending = 0
        self._own_bin = None  # opened lazily on first append
        self._own_idx = None
        self._own_path = None
        self._own_off = 0

    def __len__(self) -> int:
        return len(self._index)

    def _check_fingerprint(self, fingerprint: Optional[str]) -> None:
        """Refuse to serve a store built with different frozen weights.

        Rows key on token bytes only, so pointing cache_persist_dir at a
        store from another checkpoint would silently train on stale
        features — strictly worse than any crash. Writers with the same
        fingerprint racing on the sentinel write identical bytes, so no
        locking is needed; a store predating the sentinel (or an opener
        that passes None) adopts/skips the check for compatibility."""
        if fingerprint is None:
            return
        path = os.path.join(self.dir, "FINGERPRINT")
        if os.path.exists(path):
            with open(path) as f:
                existing = f.read().strip()
            if existing and existing != fingerprint:
                raise ValueError(
                    f"feature store at {self.dir} was built with different "
                    f"frozen weights (fingerprint {existing[:12]}... != "
                    f"{fingerprint[:12]}...): serving it would silently "
                    "train on stale features. Delete the directory, or "
                    "point cache_persist_dir at a store built with this "
                    "checkpoint.")
        else:
            with open(path, "w") as f:
                f.write(fingerprint + "\n")

    def _load_existing(self) -> None:
        for name in sorted(os.listdir(self.dir)):
            if not name.endswith(".idx"):
                continue
            idx_path = os.path.join(self.dir, name)
            bin_path = idx_path[:-4] + ".bin"
            if not os.path.exists(bin_path):
                continue
            try:
                with open(idx_path, "rb") as f:
                    data = f.read()
            except OSError:
                continue
            if not data.startswith(self.MAGIC):
                continue
            # rows whose .bin bytes never hit disk (writer killed between
            # the two flushes) must not enter the index: a registered-but-
            # torn key would shadow a later shard's good row at merge
            try:
                bin_rows = os.path.getsize(bin_path) // 4
            except OSError:
                continue
            pos = len(self.MAGIC)
            n = len(data)
            while pos + 16 <= n:
                key_len, dim, off = struct.unpack_from("<IIQ", data, pos)
                pos += 16
                if pos + key_len > n:
                    break  # torn tail (killed mid-write): ignore
                key = data[pos:pos + key_len]
                pos += key_len
                if off + dim <= bin_rows:
                    self._index[key] = (bin_path, off, dim)

    def _open_own_shard(self) -> None:
        seq = 0
        while True:
            stem = os.path.join(self.dir, f"shard-{os.getpid()}-{seq}")
            try:
                # x-mode: never append to a file another (or a previous,
                # same-pid) writer produced — offsets must stay consistent
                self._own_idx = open(stem + ".idx", "xb")
                break
            except FileExistsError:
                seq += 1
        self._own_bin = open(stem + ".bin", "wb")
        self._own_path = stem + ".bin"
        self._own_idx.write(self.MAGIC)
        self._own_off = 0

    def lookup(self, key: bytes) -> Optional[np.ndarray]:
        ent = self._index.get(key)
        if ent is None:
            return None
        bin_path, off, dim = ent
        if bin_path == self._own_path:
            # rows this process wrote may still sit in the stdio buffer
            self._own_bin.flush()
        mm = self._mmaps.get(bin_path)
        if mm is None or off + dim > mm.shape[0]:
            # (re)map — a shard this or another process appended to has
            # grown past an earlier map's length; a stale map would turn
            # every RAM-evicted row written after first map into a
            # permanent recompute
            try:
                mm = np.memmap(bin_path, dtype=np.float32, mode="r")
            except (OSError, ValueError):
                return None
            self._mmaps[bin_path] = mm
        if off + dim > mm.shape[0]:
            # torn row (writer killed between .idx and .bin reaching disk):
            # DROP the key so the recomputed row re-persists — keeping it
            # would make append() a no-op ('key in index') and turn this
            # key into a full hub forward in every future process
            del self._index[key]
            return None
        return np.array(mm[off:off + dim])  # copy out of the map

    def append(self, key: bytes, row: np.ndarray) -> None:
        if key in self._index:
            return
        if self._own_bin is None:
            self._open_own_shard()
        row32 = np.ascontiguousarray(np.asarray(row, np.float32))
        self._own_bin.write(row32.tobytes())
        self._own_idx.write(
            struct.pack("<IIQ", len(key), row32.shape[-1], self._own_off))
        self._own_idx.write(key)
        self._index[key] = (self._own_path, self._own_off, row32.shape[-1])
        self._own_off += row32.shape[-1]
        self._pending += 1
        if self._pending >= self._flush_every:
            self.flush()

    def flush(self) -> None:
        if self._own_bin is not None:
            self._own_bin.flush()
            self._own_idx.flush()
        self._pending = 0

    def close(self) -> None:
        self.flush()
        if self._own_bin is not None:
            self._own_bin.close()
            self._own_idx.close()
            self._own_bin = self._own_idx = self._own_path = None


class FrozenFeatureCache:
    def __init__(self, max_entries: Optional[int] = None,
                 persist_dir: Optional[str] = None,
                 fingerprint: Optional[str] = None):
        self._store: "OrderedDict[bytes, np.ndarray]" = OrderedDict()
        self.max_entries = max_entries
        self._disk = (DiskFeatureStore(persist_dir, fingerprint=fingerprint)
                      if persist_dir else None)
        self.hits = 0
        self.misses = 0
        self.disk_hits = 0

    def __len__(self) -> int:
        return len(self._store)

    def stats(self) -> dict:
        """hit/miss/occupancy snapshot for validation-point logging."""
        total = self.hits + self.misses
        out = {
            "cache/hits": float(self.hits),
            "cache/misses": float(self.misses),
            "cache/hit_rate": (self.hits / total) if total else 0.0,
            "cache/entries": float(len(self._store)),
        }
        if self._disk is not None:
            out["cache/disk_hits"] = float(self.disk_hits)
            out["cache/disk_entries"] = float(len(self._disk))
        return out

    def flush(self) -> None:
        """Push write-behind rows to disk (no-op without persist_dir)."""
        if self._disk is not None:
            self._disk.flush()

    def close(self) -> None:
        if self._disk is not None:
            self._disk.close()

    # -- LRU primitives -------------------------------------------------
    def _lookup(self, key: bytes) -> Optional[np.ndarray]:
        row = self._store.get(key)
        if row is not None:
            self._store.move_to_end(key)
            return row
        if self._disk is not None:
            row = self._disk.lookup(key)
            if row is not None:
                self.disk_hits += 1
                self._insert_ram(key, row)  # promote into the RAM LRU
                return row
        return None

    def _insert_ram(self, key: bytes, row: np.ndarray) -> None:
        if key in self._store:
            self._store.move_to_end(key)
            return
        if (self.max_entries is not None
                and len(self._store) >= self.max_entries):
            self._store.popitem(last=False)  # evict least-recently-used
        self._store[key] = row

    def _insert(self, key: bytes, row: np.ndarray) -> None:
        self._insert_ram(key, row)
        if self._disk is not None:
            self._disk.append(key, row)  # write-behind (flush_every)

    # -- unpacked batches ----------------------------------------------
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
        rows = [self._lookup(k) for k in keys]
        if all(r is not None for r in rows):
            self.hits += len(keys)
            return np.stack(rows)
        self.misses += len(keys)
        pooled = np.asarray(
            module.encode_pooled(module.state.params, modality, seq_np))
        for k, row in zip(keys, pooled):
            self._insert(k, row)
        return pooled

    # -- packed batches -------------------------------------------------
    def get_pooled_packed(self, module, ids, segment_ids, valid,
                          modality: str = "sequence") -> np.ndarray:
        """Per-protein pooled representations for a PACKED batch.

        ids/segment_ids [R, L], valid [R, P] -> pooled [R*P, d_model],
        slot-aligned with the packed modality tower (train/module.py
        train_step_packed_cached_fn). Each protein keys on its token
        subsequence bytes, so hits survive epoch-to-epoch re-packing.
        Empty slots receive segment_mean_pool's deterministic filler
        vector (models/heads.py) so cached and uncached packed steps are
        numerically identical; their features are masked out of the loss.
        """
        if modality in ("sequence", "seqsim"):
            modality = "sequence"
        ns = b"packed|" + modality.encode() + b"|"
        ids_np = np.ascontiguousarray(np.asarray(ids))
        seg_np = np.asarray(segment_ids)
        valid_np = np.asarray(valid)
        R = ids_np.shape[0]
        P = valid_np.shape[1]
        keys: list = [None] * (R * P)
        for r in range(R):
            seg_r = seg_np[r]
            for s in range(P):
                if valid_np[r, s] > 0:
                    keys[r * P + s] = ns + ids_np[r][seg_r == s].tobytes()
        n_valid = sum(1 for k in keys if k is not None)
        rows = [None if k is None else self._lookup(k) for k in keys]
        if all(r is not None for k, r in zip(keys, rows) if k is not None):
            self.hits += n_valid
            d = next(r for r in rows if r is not None).shape[-1]
            # the SINGLE filler definition (models/heads.py) — the all-hit
            # path must reproduce the compute path's empty-slot vector
            # bit-exactly for cached==uncached step equality
            from oneprot_tpu.models.heads import empty_slot_filler

            filler = np.asarray(empty_slot_filler(d), np.float32)
            out = np.stack([filler if r is None else
                            np.asarray(r, np.float32) for r in rows])
            return out
        self.misses += n_valid
        p_slots = P
        pooled = np.asarray(module.encode_packed_pooled(
            module.state.params, modality, ids_np, seg_np, p_slots))
        for k, row in zip(keys, pooled):
            if k is not None:
                self._insert(k, row)
        return pooled
