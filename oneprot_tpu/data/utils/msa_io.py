"""MSA file IO + diversity subsampling.

Re-implements the reference's fair-esm/Bio-based MSA utilities
(reference src/data/utils/msa_utils.py) without BioPython: a3m/FASTA parsing
with lowercase-insertion removal (lines 42-57) and greedy max-hamming-
diversity subselection (lines 21-40) — vectorized with numpy instead of the
reference's per-step scipy cdist loop.
"""

from __future__ import annotations

import string
from typing import List, Tuple

import numpy as np

_DELETE_TABLE = str.maketrans(
    "", "", string.ascii_lowercase + "." + "*")


def remove_insertions(sequence: str) -> str:
    """Drop lowercase insertion states and '.'/'*' (msa_utils.py:42-50)."""
    return sequence.translate(_DELETE_TABLE)


def read_fasta(path: str) -> List[Tuple[str, str]]:
    """Minimal FASTA/a3m reader returning (description, sequence) pairs."""
    records: List[Tuple[str, str]] = []
    desc = None
    chunks: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if desc is not None:
                    records.append((desc, "".join(chunks)))
                desc = line[1:].strip()
                chunks = []
            elif line:
                chunks.append(line.strip())
    if desc is not None:
        records.append((desc, "".join(chunks)))
    return records


def read_msa(path: str) -> List[Tuple[str, str]]:
    """Read an MSA, removing insertions (msa_utils.py:51-57)."""
    try:
        recs = read_fasta(path)
    except FileNotFoundError:
        recs = read_fasta(path + ".a3m")
    return [(d, remove_insertions(s)) for d, s in recs]


def greedy_select(
    msa: List[Tuple[str, str]], num_seqs: int, mode: str = "max"
) -> List[Tuple[str, str]]:
    """Greedy hamming-diversity subselect (msa_utils.py:21-40 semantics).

    Starts from the query row 0, then repeatedly picks the sequence whose
    mean hamming distance to the already-selected set is max (or min).
    """
    assert mode in ("max", "min")
    if len(msa) <= num_seqs:
        return msa
    arr = np.array([list(seq) for _, seq in msa], dtype="S1").view(np.uint8)
    from oneprot_tpu import native

    fast = native.greedy_select_indices(arr, num_seqs, mode)
    if fast is not None:
        return [msa[int(i)] for i in fast]
    n, L = arr.shape
    optfunc = np.argmax if mode == "max" else np.argmin
    selected = [0]
    # running sum of hamming distances from each candidate to selected rows
    dist_sum = np.zeros(n, dtype=np.float64)
    for _ in range(num_seqs - 1):
        last = arr[selected[-1]]
        dist_sum += (arr != last[None, :]).mean(axis=1)
        mean_dist = dist_sum / len(selected)
        mean_dist[selected] = -np.inf if mode == "max" else np.inf
        selected.append(int(optfunc(mean_dist)))
    return [msa[i] for i in sorted(selected)]


def filter_and_create_msa_file_list(filename: str) -> List[str]:
    """Second CSV column of rows mentioning .a3m (msa_utils.py:9-19)."""
    out: List[str] = []
    with open(filename) as f:
        for line in f:
            line = line.strip()
            if ".a3m" in line:
                out.append(line.split(",")[1])
    return out
