#!/usr/bin/env python
"""Build a training-ready seqstruc.h5 (+ split CSV) from raw PDB/mmCIF files.

The TPU-native replacement for the reference's CIF/PDB loading tutorial
(reference notebooks/tutorials/Tutorial_CIF_and_PDB_loading.ipynb): instead
of a notebook that stops at coordinate arrays, this CLI writes the exact
HDF5 layout the structure datasets read, so raw structures go straight into
struct_graph / struct_token-style training.

Usage:
    python scripts/ingest_structures.py 12AS.pdb AF-P12345.cif \
        --out data/my_structs --split train
    python scripts/ingest_structures.py pdb_dir/ --out data/ --split val

Writes/extends `{out}/seqstruc.h5` and appends new ids to
`{out}/{split}_seqstruc.csv` (the id list StructDataset reads).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oneprot_tpu.data.utils.structure_io import ingest_files  # noqa: E402

EXTS = (".pdb", ".ent", ".cif", ".mmcif")


def collect_paths(inputs):
    paths = []
    for p in inputs:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                if name.lower().endswith(EXTS):
                    paths.append(os.path.join(p, name))
        else:
            paths.append(p)
    return paths


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("inputs", nargs="+",
                    help="PDB/mmCIF files or directories of them")
    ap.add_argument("--out", required=True,
                    help="dataset dir (seqstruc.h5 + split csv live here)")
    ap.add_argument("--split", default="train",
                    choices=["train", "val", "test"])
    ap.add_argument("--chain", default="first",
                    help="'first' (default: first chain stored as A), "
                         "'all', or a chain id")
    ap.add_argument("--no-csv", action="store_true",
                    help="only write the h5, skip the split id list")
    args = ap.parse_args()

    paths = collect_paths(args.inputs)
    if not paths:
        print("no structure files found", file=sys.stderr)
        return 1
    os.makedirs(args.out, exist_ok=True)
    h5_path = os.path.join(args.out, "seqstruc.h5")
    written = ingest_files(paths, h5_path, chain=args.chain)
    skipped = len(paths) - len(written)
    print(f"wrote {len(written)} entries to {h5_path}"
          + (f" ({skipped} files skipped: no parseable chains)"
             if skipped else ""))

    if not args.no_csv and written:
        csv_path = os.path.join(args.out, f"{args.split}_seqstruc.csv")
        have = set()
        if os.path.exists(csv_path):
            with open(csv_path) as f:
                have = {line.split(",")[0].strip() for line in f
                        if line.strip()}
        new = [i for i in written if i not in have]
        with open(csv_path, "a") as f:
            for i in new:
                f.write(i + "\n")
        print(f"appended {len(new)} ids to {csv_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
