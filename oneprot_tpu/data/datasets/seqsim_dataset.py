"""Sequence-similarity (ClinVar triplet) dataset.

Parity with the reference SequenceSimDataset (reference src/data/datasets/
seqsim_dataset.py): two parallel lists per item — list1 = (MSA original seq,
wild-type seq_id string, pathogenic mutant 1), list2 = (MSA aligned seq,
benign mutant, pathogenic mutant 2) — 3 entries per protein (lines 80-121);
`_apply_mutation` parses 'A123B' strings and retries on mismatch
(lines 66-72, 96-120). Both sides use the ESM2 tokenizer; the modality
routes to the sequence encoder (reference oneprot_module.py:69-71).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from oneprot_tpu.data.common import BaseDataset, pick_bucket
from oneprot_tpu.data.tokenizers import esm2_tokenizer


class SequenceSimDataset(BaseDataset):
    modality = "seqsim"

    def __init__(
        self,
        data_dir: str,
        split: str,
        seq_tokenizer: str = "facebook/esm2_t33_650M_UR50D",
        max_length: int = 1024,
        modality: str = "combined_seqsim_msa",
        buckets: Optional[List[int]] = None,
    ):
        self.split = split
        self.max_length = max_length
        self.buckets = buckets
        with open(os.path.join(data_dir, f"{split}_seqsim.txt")) as f:
            self.sequence_ids = [line.strip() for line in f if line.strip()]
        with open(os.path.join(data_dir, "clinvar_full_benign_mutations.json")) as f:
            self.benign_mutations = json.load(f)
        with open(os.path.join(data_dir,
                               "clinvar_full_pathogenic_mutations.json")) as f:
            self.pathogenic_mutations = json.load(f)
        self.msa_data = pd.read_csv(f"{data_dir}/{split}_msa_seqsim.csv")
        self.seq_tok = esm2_tokenizer()

    def num_items(self) -> int:
        return len(self.msa_data)

    def __getitem__(self, idx: int) -> Tuple[str, int]:
        seq_id = self.sequence_ids[idx % len(self.sequence_ids)]
        return seq_id, idx

    @staticmethod
    def _apply_mutation(sequence: str, mutation: str) -> str:
        letter1, position, letter2 = (
            mutation[0], int(mutation[1:-1]), mutation[-1])
        position -= 1
        if position >= len(sequence) or sequence[position] != letter1:
            raise ValueError(
                f"Mutation mismatch: expected {letter1} at {position}")
        return sequence[:position] + letter2 + sequence[position + 1:]

    def _pick_mutation(self, seq_id: str, table, rng) -> str:
        """Random valid mutation with retry (reference assert-retry loops)."""
        # a sequence missing from the mutation JSON (drift between the
        # seqsim txt and the clinvar tables) falls back to the wild type
        # like an invalid mutation does, instead of crashing the epoch
        # with a KeyError from the prefetch thread
        candidates = list(table.get(seq_id, ()))
        rng.shuffle(candidates)
        for mutation in candidates:
            try:
                return self._apply_mutation(seq_id, mutation)
            except (ValueError, IndexError):
                continue
        return seq_id  # no valid mutation: fall back to the wild type

    def collate_fn(self, items: List[Tuple[str, int]],
                   rng: Optional[np.random.RandomState] = None):
        rng = rng or np.random.RandomState(0)
        list1, list2 = [], []
        for seq_id, idx in items:
            row = self.msa_data.iloc[idx % len(self.msa_data)]
            list1.append(str(row["req_seq"]))
            list2.append(str(row["aligned_seq"]))
            list1.append(seq_id)
            list2.append(self._pick_mutation(seq_id, self.benign_mutations, rng))
            list1.append(self._pick_mutation(seq_id, self.pathogenic_mutations, rng))
            list2.append(self._pick_mutation(seq_id, self.pathogenic_mutations, rng))
        longest = max((len(s) + 2 for s in list1 + list2), default=2)
        pad = pick_bucket(longest, self.buckets, self.max_length)
        input1 = self.seq_tok(list1, max_length=self.max_length, padding=pad)
        input2 = self.seq_tok(list2, max_length=self.max_length, padding=pad)
        return input1, input2, "seqsim", list1
