"""Protein <-> biomedical-text dataset.

Parity with the reference TextDataset (reference src/data/datasets/
text_dataset.py): CSV of (id, text); per-item protein sequence pulled from
`seqstruc.h5` at `[id]/structure/0/A/residues/seq1` (lines 43-46); ESM2
tokenizer for sequences (max 1024), WordPiece for text (max 512).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

from oneprot_tpu.data.common import H5, BaseDataset, pick_bucket
from oneprot_tpu.data.tokenizers import esm2_tokenizer, resolve_text_tokenizer


class TextDataset(BaseDataset):
    modality = "text"

    def __init__(
        self,
        data_dir: str,
        split: str,
        max_length: int = 1024,
        text_max_length: int = 512,
        text_tokenizer: str = "tiny",
        seq_tokenizer: str = "facebook/esm2_t33_650M_UR50D",
        buckets: Optional[List[int]] = None,
    ):
        self.split = split
        self.max_length = max_length
        self.text_max_length = text_max_length
        self.h5_file = f"{data_dir}/seqstruc.h5"
        self.buckets = buckets
        csv_file = f"{data_dir}/{split}_text.csv"
        self.df = pd.read_csv(csv_file, header=None)
        self._index = {v: i for i, v in enumerate(self.df[0].tolist())}
        self.seq_tok = esm2_tokenizer()
        self.text_tok = resolve_text_tokenizer(text_tokenizer)

    def num_items(self) -> int:
        return self.df.shape[0]

    def __getitem__(self, idx: int) -> str:
        return self.df[0].iloc[idx]

    def lengths(self) -> np.ndarray:
        """Tokenized sequence lengths for length-grouped batching (h5 dtype
        itemsize only; no data read)."""
        h5 = H5.get(self.h5_file)
        out = np.empty(self.df.shape[0], np.int32)
        for i, sid in enumerate(self.df[0].tolist()):
            try:
                node = h5[sid]["structure"]["0"]["A"]["residues"]["seq1"]
                out[i] = node.dtype.itemsize + 2
            except KeyError:
                out[i] = 2
        return np.minimum(out, self.max_length)

    def tokenize_pair(self, seq_id: str):
        """Unpadded token pair for SEQUENCE PACKING (data/packing.py):
        (seq tokens, text tokens) incl. specials, or None for missing ids.
        Exposing this enables the packed loader for seq<->text; the text
        side runs the segment-masked BERT path (models/bert.py)."""
        h5 = H5.get(self.h5_file)
        if seq_id not in h5:
            return None
        seq = h5[seq_id]["structure"]["0"]["A"]["residues"]["seq1"][()]
        text = str(self.df[1].iloc[self._index[seq_id]])
        return (np.asarray(self.seq_tok.encode_ids(
                    seq.decode("utf-8"), self.max_length), np.int32),
                np.asarray(self.text_tok.encode_ids(
                    text, self.text_max_length), np.int32))

    def collate_fn(self, seq_ids: List[str],
                   rng: Optional[np.random.RandomState] = None):
        h5 = H5.get(self.h5_file)
        sequences, texts = [], []
        for seq_id in seq_ids:
            if seq_id not in h5:
                continue
            seq = h5[seq_id]["structure"]["0"]["A"]["residues"]["seq1"][()]
            sequences.append(seq.decode("utf-8"))
            texts.append(str(self.df[1].iloc[self._index[seq_id]]))
        seq_longest = max((len(s) + 2 for s in sequences), default=2)
        seq_pad = pick_bucket(seq_longest, self.buckets, self.max_length)
        seq_input = self.seq_tok(sequences, max_length=self.max_length,
                                 padding=seq_pad)
        text_ids = [self.text_tok.encode_ids(t, self.text_max_length)
                    for t in texts]
        text_longest = max((len(t) for t in text_ids), default=2)
        text_pad = pick_bucket(text_longest, self.buckets, self.text_max_length)
        text_input = np.full((len(text_ids), text_pad),
                             self.text_tok.pad_token_id, np.int32)
        for i, ids in enumerate(text_ids):
            text_input[i, : min(len(ids), text_pad)] = ids[:text_pad]
        return seq_input, text_input, "text", sequences
