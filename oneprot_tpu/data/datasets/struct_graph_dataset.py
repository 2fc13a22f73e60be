"""Structure-graph / binding-pocket dataset (seq <-> residue graph pairs).

Parity with the reference StructDataset (reference src/data/datasets/
struct_graph_dataset.py): shared by struct_graph and pocket via the `pocket`
flag (line 15; `pockets_100_residues.h5` vs `seqstruc.h5`, line 19); ids from
`{split}_{pocket|seqstruc}.csv` first column; train-time augmentations
(mask/noise/deform, lines 59-77) reproduced in
oneprot_tpu/data/utils/graphs.py:augment_graph_batch.

TPU change: graphs are built as fixed-shape padded dicts with kNN neighbor
lists (see graphs.py) instead of torch_geometric Batch objects.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from oneprot_tpu.data.common import H5, BaseDataset, pick_bucket
from oneprot_tpu.data.tokenizers import esm2_tokenizer
from oneprot_tpu.data.utils.graphs import (
    augment_graph_batch,
    protein_to_padded_graph,
    stack_graphs,
)


class StructDataset(BaseDataset):
    def __init__(
        self,
        data_dir: str,
        split: str,
        max_length: int = 1024,
        seq_tokenizer: str = "facebook/esm2_t33_650M_UR50D",
        use_struct_mask: bool = False,
        use_struct_coord_noise: bool = False,
        use_struct_deform: bool = False,
        pocket: bool = False,
        max_residues: int = 1024,
        max_neighbors: int = 24,
        cutoff: float = 10.0,
        buckets: Optional[List[int]] = None,
    ):
        self.split = split
        self.pocket = pocket
        self.modality = "pocket" if pocket else "struct_graph"
        self.h5_file = f"{data_dir}/{'pockets_100_residues' if pocket else 'seqstruc'}.h5"
        self.h5_file_seq = f"{data_dir}/seqstruc.h5"
        self.max_length = max_length
        self.max_residues = max_residues
        self.max_neighbors = max_neighbors
        self.cutoff = cutoff
        self.use_struct_mask = use_struct_mask
        self.use_struct_coord_noise = use_struct_coord_noise
        self.use_struct_deform = use_struct_deform
        self.buckets = buckets
        csv_file = f"{data_dir}/{split}_{'pocket' if pocket else 'seqstruc'}.csv"
        with open(csv_file) as f:
            self.id_list = [line.split(",")[0].strip() for line in f
                            if line.strip()]
        self.seq_tok = esm2_tokenizer()

    def num_items(self) -> int:
        return len(self.id_list)

    def __getitem__(self, idx: int) -> str:
        return self.id_list[idx]

    def _load_structure(self, seq_id: str):
        h5 = H5.get(self.h5_file)
        node = h5[seq_id]["structure"]["0"]["A"]
        seq = node["residues"]["seq1"][()].decode("utf-8")
        poly = node["polypeptide"]
        return (
            seq,
            poly["type"][()],
            poly["atom_amino_id"][()],
            np.asarray(poly["xyz"][()], np.float64),
        )

    def collate_fn(self, seq_ids: List[str],
                   rng: Optional[np.random.RandomState] = None):
        h5_seq = H5.get(self.h5_file_seq)
        sequences, graphs = [], []
        for seq_id in seq_ids:
            try:
                full_seq = h5_seq[seq_id]["structure"]["0"]["A"]["residues"][
                    "seq1"][()].decode("utf-8")
                seq, names, amino_id, xyz = self._load_structure(seq_id)
            except KeyError:
                continue
            sequences.append(full_seq)
            graphs.append(protein_to_padded_graph(
                seq, names, amino_id, xyz,
                max_residues=self.max_residues,
                max_neighbors=self.max_neighbors,
                cutoff=self.cutoff,
            ))
        if not graphs:
            # every id missed the h5 (csv/h5 drift): raise a diagnosable
            # error instead of stack_graphs' opaque IndexError surfacing
            # from a prefetch thread
            raise ValueError(
                f"no valid structure ids in batch for {self.h5_file}: "
                f"first ids {seq_ids[:3]} missing from the HDF5")
        batch = stack_graphs(graphs)
        if self.split == "train" and rng is not None:
            batch = augment_graph_batch(
                batch, rng,
                use_mask=self.use_struct_mask,
                use_coord_noise=self.use_struct_coord_noise,
                use_deform=self.use_struct_deform,
            )
        longest = max((len(s) + 2 for s in sequences), default=2)
        pad = pick_bucket(longest, self.buckets, self.max_length)
        seq_input = self.seq_tok(sequences, max_length=self.max_length,
                                 padding=pad)
        return seq_input, batch, self.modality, sequences
