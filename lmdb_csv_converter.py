#!/usr/bin/env python
"""LMDB -> CSV converter entry (reference src/lmdb_csv_converter.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oneprot_tpu.downstream.lmdb_converter import convert_tree  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--ppi-pattern", default="HumanPPI",
                   help="dirs containing this pattern use the ppi schema")
    p.add_argument("--regression-pattern", default="Thermo",
                   help="dirs containing this pattern use the regression schema")
    args = p.parse_args(argv)
    return convert_tree(args.root_dir, args.output_dir, schema_map={
        args.ppi_pattern: "ppi",
        args.regression_pattern: "regression",
    })


if __name__ == "__main__":
    print("\n".join(main()))
