"""SaProt structure-token dataset (seq <-> foldseek-3Di pairs).

Behavioral parity with the reference StructTokenDataset (reference
src/data/datasets/struct_token_dataset.py): ids from `{split}_saprot.txt`
(`_saprot_full.txt` when full=True, lines 24-30), interleaved `strucseq`
de-interleaved into AA sequence (even chars) and 3Di string (odd chars,
lines 73-77), optional '#' removal (line 82), ESM2 tokenizer + 21 3Di tokens.

TPU changes: one cached HDF5 handle instead of per-batch open; outputs padded
to static length buckets.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from oneprot_tpu.data.common import H5, BaseDataset, pick_bucket
from oneprot_tpu.data.tokenizers import esm2_tokenizer, struct_token_tokenizer


class StructTokenDataset(BaseDataset):
    modality = "struct_token"

    def __init__(
        self,
        data_dir: str,
        filename: str,
        split: str,
        max_length: int = 1024,
        seq_tokenizer: str = "facebook/esm2_t33_650M_UR50D",
        remove_hash: bool = True,
        full: bool = False,
        buckets: Optional[List[int]] = None,
    ):
        self.split = split
        self.remove_hash = remove_hash
        self.max_length = max_length
        self.buckets = buckets
        suffix = "_saprot_full.txt" if (split == "train" and full) else "_saprot.txt"
        txt_file = f"{data_dir}/{split}{suffix}"
        with open(txt_file) as f:
            self.ids = [line.strip() for line in f if line.strip()]
        self.filename = filename
        self.seq_tok = esm2_tokenizer()
        self.struct_tok = struct_token_tokenizer()

    def num_items(self) -> int:
        return len(self.ids)

    def __getitem__(self, idx: int) -> str:
        return self.ids[idx]

    def lengths(self) -> np.ndarray:
        """Tokenized lengths for length-grouped batching — read from the
        HDF5 dtype itemsize (no data read): strucseq is a fixed-length
        bytes scalar holding the interleaved AA+3Di string."""
        h5 = H5.get(self.filename)
        out = np.empty(len(self.ids), np.int32)
        for i, sid in enumerate(self.ids):
            try:
                out[i] = h5[sid]["strucseq"].dtype.itemsize // 2 + 2
            except KeyError:
                out[i] = 2
        return np.minimum(out, self.max_length)

    def tokenize_pair(self, seq_id: str):
        """Unpadded token pair for SEQUENCE PACKING (data/packing.py):
        (seq tokens, struct tokens) incl. cls/eos, or None for missing ids."""
        h5 = H5.get(self.filename)
        if seq_id not in h5:
            return None
        strucseq = h5[seq_id]["strucseq"][()].decode("utf-8")
        sequence = strucseq[0::2].replace("#", "")
        structure_seq = strucseq[1::2]
        if self.remove_hash:
            structure_seq = structure_seq.replace("#", "")
        return (np.asarray(self.seq_tok.encode_ids(
                    sequence, self.max_length), np.int32),
                np.asarray(self.struct_tok.encode_ids(
                    structure_seq, self.max_length), np.int32))

    def collate_fn(self, seq_ids: List[str],
                   rng: Optional[np.random.RandomState] = None):
        h5 = H5.get(self.filename)
        sequences, structs = [], []
        for seq_id in seq_ids:
            if seq_id not in h5:
                continue
            strucseq = h5[seq_id]["strucseq"][()].decode("utf-8")
            sequence = strucseq[0::2].replace("#", "")
            structure_seq = strucseq[1::2]
            if self.remove_hash:
                structure_seq = structure_seq.replace("#", "")
            sequences.append(sequence)
            structs.append(structure_seq)
        longest = max((len(s) + 2 for s in sequences + structs), default=2)
        pad = pick_bucket(longest, self.buckets, self.max_length)
        seq_input = self.seq_tok(sequences, max_length=self.max_length,
                                 padding=pad)
        struct_input = self.struct_tok(structs, max_length=self.max_length,
                                       padding=pad)
        return seq_input, struct_input, "struct_token", sequences
