"""OneProtDataModule: per-modality loaders + combined iteration.

Parity with the reference datamodule (reference src/data/
oneprot_datamodule.py): one loader per modality with its own batch size
(line 63) and dataset-owned collate (line 70); combined "min_size" cycling
for train and "sequential" for val/test (line 75); DATASET_CLASSES registry
(lines 15-23) with pocket reusing StructDataset.

TPU replacements for torch DataLoader: a thread-pool prefetcher (collate is
HDF5 IO + tokenization + graph building — the host hot loop, SURVEY §3.5)
and seeded numpy RNG per batch for reproducible augmentations.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from oneprot_tpu.data.datasets.msa_dataset import MSADataset
from oneprot_tpu.data.datasets.seqsim_dataset import SequenceSimDataset
from oneprot_tpu.data.datasets.struct_graph_dataset import StructDataset
from oneprot_tpu.data.datasets.struct_token_dataset import StructTokenDataset
from oneprot_tpu.data.datasets.text_dataset import TextDataset
from oneprot_tpu.utils.loggers import get_pylogger

log = get_pylogger(__name__)

DATASET_CLASSES = {
    "msa": MSADataset,
    "struct_graph": StructDataset,
    "pocket": StructDataset,
    "text": TextDataset,
    "struct_token": StructTokenDataset,
    "seqsim": SequenceSimDataset,
}


class DataLoader:
    """Minimal loader: shuffling sampler -> dataset.collate_fn, with
    background thread prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, prefetch: int = 2,
                 num_workers: int = 2, group_by_length: bool = True,
                 pack_rows: int = 0, pack_row_len: int = 1024,
                 pack_slots: int = 16):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = num_workers
        # sequence packing (data/packing.py): multiple proteins per row at
        # a FIXED row count; engages when >0 and the dataset exposes
        # tokenize_pair
        self.pack_rows = (pack_rows
                          if hasattr(dataset, "tokenize_pair") else 0)
        self.pack_row_len = pack_row_len
        self.pack_slots = pack_slots
        self.epoch = 0
        # Length-grouped batching: shuffled megabatch windows are sorted by
        # item length before chunking, so batches land in the smallest
        # length bucket (static shapes + ~2x less padded compute on real
        # length distributions). Engages only for shuffled (train) loaders
        # on datasets that expose lengths(); randomness is preserved at the
        # window and batch-order level.
        self.group_by_length = group_by_length
        self._lengths = None

    def __len__(self) -> int:
        """Per-PROCESS batch count: _order shards items rank::nproc, so a
        global count would over-report steps-per-epoch by a factor of
        process_count. Packed mode returns the lockstep cap (the full-fill
        floor every process is pinned to on multi-host; a best-effort
        estimate single-host)."""
        try:
            import jax

            nproc, rank = jax.process_count(), jax.process_index()
        except Exception:  # pragma: no cover
            nproc, rank = 1, 0
        if self.pack_rows:
            return self._packed_lockstep_cap(max(nproc, 1))
        n = len(self.dataset)
        n_local = len(range(rank, n, nproc)) if nproc > 1 else n
        if self.drop_last:
            return n_local // self.batch_size
        return -(-n_local // self.batch_size)

    def _item_lengths(self):
        if self._lengths is None and hasattr(self.dataset, "lengths"):
            try:
                self._lengths = np.asarray(self.dataset.lengths())
            except Exception:  # pragma: no cover - length probe optional
                self._lengths = False
        return self._lengths if self._lengths is not False else None

    def _order(self, epoch: int) -> np.ndarray:
        """Shuffled (seeded, identical on every host), then per-process
        interleaved-sharded item order — torch DistributedSampler
        semantics; the reference gets this from Lightning DDP."""
        order = np.arange(len(self.dataset))
        rng = np.random.RandomState(self.seed + epoch)
        if self.shuffle:
            rng.shuffle(order)
        try:
            import jax

            nproc, rank = jax.process_count(), jax.process_index()
        except Exception:  # pragma: no cover
            nproc, rank = 1, 0
        if nproc > 1:
            order = order[rank::nproc]
        return order

    def _batches(self, epoch: int) -> Iterator[List[Any]]:
        order = self._order(epoch)
        rng = np.random.RandomState(self.seed + epoch)

        lengths = (self._item_lengths()
                   if (self.shuffle and self.group_by_length) else None)
        if lengths is not None and len(order) > self.batch_size:
            window = self.batch_size * 16
            chunks = []
            for w0 in range(0, len(order), window):
                win = order[w0:w0 + window]
                win = win[np.argsort(lengths[win], kind="stable")]
                chunks.extend(win[s:s + self.batch_size]
                              for s in range(0, len(win), self.batch_size))
            rng.shuffle(chunks)
            batches = chunks
        else:
            batches = [order[s:s + self.batch_size]
                       for s in range(0, len(order), self.batch_size)]
        for idxs in batches:
            if self.drop_last and len(idxs) < self.batch_size:
                continue
            yield [self.dataset[int(i)] for i in idxs]

    def _packed_lockstep_cap(self, nproc: int) -> int:
        """Pre-agreed per-process packed-batch count for multi-host runs.

        Packed batch counts are data-dependent per process (each host packs
        its own interleaved shard; fill varies with its sequence lengths),
        but `make_array_from_process_local_data` needs every process in
        lockstep — divergent counts hang the pod at epoch end (advisor
        round-2 finding). All processes derive the SAME cap from global
        dataset statistics (identical on every host: same dataset, no
        communication needed): total tokens / (nproc * rows * row_len)
        assumes full fill, i.e. it under-counts slightly, so most
        processes truncate a tail batch or two and any process whose
        packer runs dry first simply re-streams its shard (harmless
        repeats for contrastive training, lockstep preserved).
        """
        lengths = self._item_lengths()
        if lengths is not None:
            # lengths() already include the +2 cls/eos framing (each
            # dataset adds it at the source); adding it again here
            # inflated the cap past the full-fill floor, injecting more
            # re-streamed duplicates than designed. The seq side stands
            # in for the pair (the packer consumes max(seq, other) per
            # slot; for struct_token pairs the two sides are equal-length
            # by construction).
            total_tokens = float(np.sum(lengths))
            cap = int(total_tokens // (nproc * self.pack_rows
                                       * self.pack_row_len))
        else:
            # no length probe: assume every row holds a single item
            cap = len(self.dataset) // (nproc * self.pack_rows)
        return max(cap, 1)

    def _packed_iter(self, epoch: int):
        """Sequence-packed batches: stream the (shuffled, sharded) items
        through the first-fit packer — constant [rows, row_len] shapes, one
        jit compile, near-full fill. Yields the packed-batch protocol:
        ({ids, segment_ids}, {ids, segment_ids}, modality+':packed', valid).

        Multi-host: every process yields EXACTLY `_packed_lockstep_cap`
        batches per epoch (truncating or re-streaming its shard as
        needed), so collective array construction never deadlocks on
        divergent per-host packed-batch counts.
        """
        from oneprot_tpu.data.packing import pack_stream

        def items():
            # stream the shuffled/sharded order DIRECTLY — not via
            # _batches(), whose batch_size + drop_last chunking is
            # meaningless for packing (the packer has its own [rows,
            # row_len] geometry) and silently dropped the whole epoch
            # whenever the dataset was smaller than one batch
            for i in self._order(epoch):
                pair = self.dataset.tokenize_pair(self.dataset[int(i)])
                if pair is not None:
                    yield pair

        def packed():
            for p in pack_stream(items(), self.pack_row_len,
                                 self.pack_rows, self.pack_slots):
                yield ({"ids": p["ids_a"], "segment_ids": p["seg_a"]},
                       {"ids": p["ids_b"], "segment_ids": p["seg_b"]},
                       modality, p["valid"])

        modality = getattr(self.dataset, "modality", "struct_token")
        try:
            import jax

            nproc = jax.process_count()
        except Exception:  # pragma: no cover
            nproc = 1
        if nproc <= 1:
            yield from packed()
            return
        cap = self._packed_lockstep_cap(nproc)
        produced = 0
        while produced < cap:
            got_any = False
            for batch in packed():
                got_any = True
                yield batch
                produced += 1
                if produced >= cap:
                    return
            if not got_any:  # empty shard: cannot keep lockstep by cycling
                raise RuntimeError(
                    "packed loader produced no batches on this process; "
                    "dataset too small for multi-host packing")

    def __iter__(self):
        # both the order RNG and the collate RNG key off the SAME epoch
        # index (round-1 review: pre/post-increment mismatch was harmless
        # but made the two streams drift by one epoch)
        epoch = self.epoch
        self.epoch += 1
        rng_seed = self.seed * 100003 + epoch
        if self.pack_rows:
            yield from self._packed_iter(epoch)
            return
        if self.prefetch <= 0:
            for b, items in enumerate(self._batches(epoch)):
                yield self.dataset.collate_fn(
                    items, rng=np.random.RandomState(rng_seed + b))
            return
        # multi-threaded collate with in-order delivery: collate does HDF5
        # IO + tokenization + graph building (the host hot loop, SURVEY §3.5);
        # numpy/h5py release the GIL, so threads scale on the host CPUs
        from concurrent.futures import ThreadPoolExecutor

        batches = list(self._batches(epoch))
        workers = max(1, self.num_workers)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futures = []
            depth = max(self.prefetch, workers) * 2
            it = iter(enumerate(batches))
            submitted = 0
            for b, items in it:
                futures.append(pool.submit(
                    self.dataset.collate_fn, items,
                    rng=np.random.RandomState(rng_seed + b)))
                submitted += 1
                if submitted >= depth:
                    break
            next_to_submit = submitted
            i = 0
            while i < len(futures):
                result = futures[i].result()
                # drop the reference: a completed Future pins its collated
                # batch, so keeping the whole list alive grows host memory
                # with every batch of the epoch (~10 MB/graph batch)
                futures[i] = None
                i += 1
                if next_to_submit < len(batches):
                    b, items = next_to_submit, batches[next_to_submit]
                    futures.append(pool.submit(
                        self.dataset.collate_fn, items,
                        rng=np.random.RandomState(rng_seed + b)))
                    next_to_submit += 1
                yield result


class CombinedLoader:
    """min_size: one dict {modality: batch} per step, stops at the shortest
    loader (reference CombinedLoader 'min_size'). sequential: flat stream of
    per-modality batches (reference 'sequential' for val/test)."""

    def __init__(self, loaders: Dict[str, DataLoader], mode: str = "min_size"):
        self.loaders = loaders
        self.mode = mode

    def __len__(self) -> int:
        if not self.loaders:
            return 0
        if self.mode == "min_size":
            return min(len(l) for l in self.loaders.values())
        return sum(len(l) for l in self.loaders.values())

    def __iter__(self):
        if self.mode == "min_size":
            iters = {k: iter(v) for k, v in self.loaders.items()}
            while True:
                out = {}
                try:
                    for k, it in iters.items():
                        out[k] = next(it)
                except StopIteration:
                    return
                yield out
        else:
            for k, loader in self.loaders.items():
                for batch in loader:
                    yield batch


class OneProtDataModule:
    def __init__(
        self,
        modalities: Dict[str, Any],
        num_workers: int = 4,
        pin_memory: bool = False,
        default_batch_size: int = 32,
        buckets: Optional[List[int]] = None,
        prefetch: int = 2,
        seed: int = 0,
        group_by_length: bool = True,
        pack_sequences: bool = False,
        pack_rows: int = 16,
        pack_row_len: int = 1024,
        pack_slots: int = 16,
    ):
        self.modalities = modalities
        self.num_workers = num_workers  # collate thread-pool width
        self.default_batch_size = default_batch_size
        self.buckets = list(buckets) if buckets else None
        self.prefetch = prefetch
        self.seed = seed
        self.group_by_length = group_by_length
        # sequence packing for TRAIN loaders of token-pair modalities
        # (datasets exposing tokenize_pair); val/test stay unpacked
        self.pack_sequences = pack_sequences
        self.pack_rows = pack_rows
        self.pack_row_len = pack_row_len
        self.pack_slots = pack_slots
        self.datasets: Dict[str, Any] = {}
        self._epoch = 0  # global epoch for train-loader shuffle/collate RNG

    def set_epoch(self, epoch: int) -> None:
        """Seed the NEXT train_dataloader()'s shuffle/collate/packing RNG
        with this global epoch index (torch DistributedSampler-style). The
        trainer calls it every epoch — train loaders are rebuilt per epoch,
        so without it each rebuild restarts at epoch 0 and every epoch
        replays the same order."""
        self._epoch = int(epoch)

    def setup(self, stage: Optional[str] = None) -> None:
        if self.datasets:
            return
        for modality, modality_cfg in self.modalities.items():
            if modality not in DATASET_CLASSES:
                log.error(f"Unknown modality: {modality}")
                continue
            cls = DATASET_CLASSES[modality]
            for split in ("train", "val", "test"):
                kwargs = dict(modality_cfg["dataset"])
                kwargs.pop("_target_", None)
                kwargs["split"] = split
                kwargs.setdefault("buckets", self.buckets)
                try:
                    self.datasets[f"{modality}_{split}"] = cls(**kwargs)
                except Exception as e:
                    log.error(f"Error creating dataset for {modality} {split}: {e}")
            log.info(
                f"{modality} Train/Val/Test sizes = "
                f"{len(self.datasets.get(f'{modality}_train', []))} / "
                f"{len(self.datasets.get(f'{modality}_val', []))} / "
                f"{len(self.datasets.get(f'{modality}_test', []))}")

    def _create_dataloader(self, split: str, shuffle: bool = False) -> CombinedLoader:
        iterables = {}
        for modality, modality_cfg in self.modalities.items():
            key = f"{modality}_{split}"
            if key not in self.datasets:
                continue
            bs_cfg = modality_cfg.get("batch_size", {})
            batch_size = bs_cfg.get(split, self.default_batch_size)
            iterables[modality] = DataLoader(
                self.datasets[key], batch_size=int(batch_size),
                shuffle=shuffle, seed=self.seed, prefetch=self.prefetch,
                num_workers=self.num_workers,
                group_by_length=self.group_by_length,
                pack_rows=(self.pack_rows
                           if (self.pack_sequences and shuffle) else 0),
                pack_row_len=self.pack_row_len,
                pack_slots=self.pack_slots,
                # static shapes + even DP sharding for train (val/test keep
                # every item; the module replicates ragged tail batches)
                drop_last=shuffle)
            if shuffle:
                # continue the global epoch sequence (set_epoch); val/test
                # loaders stay at epoch 0 for deterministic evaluation
                iterables[modality].epoch = self._epoch
        return CombinedLoader(iterables, "min_size" if shuffle else "sequential")

    def train_dataloader(self) -> CombinedLoader:
        return self._create_dataloader("train", shuffle=True)

    def val_dataloader(self) -> CombinedLoader:
        return self._create_dataloader("val")

    def test_dataloader(self) -> CombinedLoader:
        return self._create_dataloader("test")

    def example_batches(self) -> Dict[str, Any]:
        """One small batch per modality, for model init."""
        out = {}
        for modality in self.modalities:
            key = f"{modality}_train"
            ds = self.datasets.get(key) or self.datasets.get(f"{modality}_val")
            if ds is None:
                continue
            items = [ds[i] for i in range(min(2, len(ds)))]
            seq, mod, name, _ = ds.collate_fn(
                items, rng=np.random.RandomState(0))
            out[name] = (seq, mod)
        return out
