"""SaProt LMDB -> CSV converter (reference src/lmdb_csv_converter.py).

Walks a folder tree of LMDB downstream datasets (`data.mdb`), flattens the
directory names, and writes classification / regression / ppi CSV schemas
(reference lmdb_csv_converter.py:19-27, 53-73). Gated on the lmdb package
(a host-side tool; not part of the TPU training path).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from oneprot_tpu.utils.loggers import get_pylogger

log = get_pylogger(__name__)

SCHEMAS = {
    "classification": ["id", "sequence", "label/fitness"],
    "regression": ["id", "sequence", "label/fitness"],
    "ppi": ["id", "sequence_1", "sequence_2", "label/fitness"],
}


def convert_lmdb_to_csv(lmdb_dir: str, output_csv: str,
                        schema: str = "classification") -> int:
    """Convert one LMDB dataset directory to a CSV; returns row count."""
    try:
        import lmdb
    except ImportError as e:
        raise ImportError(
            "lmdb is not installed; the converter is a host-side tool — "
            "run it in an environment with `pip install lmdb`") from e

    import csv

    columns = SCHEMAS[schema]
    env = lmdb.open(lmdb_dir, readonly=True, lock=False)
    rows = 0
    with env.begin() as txn, open(output_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(columns)
        length = txn.get(b"length")
        n = int(length.decode()) if length else None
        cursor = txn.cursor()
        for key, value in cursor:
            if key == b"length":
                continue
            try:
                entry = json.loads(value.decode())
            except (UnicodeDecodeError, json.JSONDecodeError):
                continue
            if schema == "ppi":
                writer.writerow([
                    key.decode(), entry.get("seq_1", ""),
                    entry.get("seq_2", ""),
                    entry.get("label", entry.get("fitness", ""))])
            else:
                writer.writerow([
                    key.decode(),
                    entry.get("seq", entry.get("sequence", "")),
                    entry.get("label", entry.get("fitness", ""))])
            rows += 1
            if n is not None and rows >= n:
                break
    log.info(f"{lmdb_dir} -> {output_csv} ({rows} rows)")
    return rows


def convert_tree(root_dir: str, output_dir: str,
                 schema_map: Optional[Dict[str, str]] = None) -> List[str]:
    """Walk root_dir for data.mdb dirs; flatten names like the reference
    (lmdb_csv_converter.py:53-73: path components joined with '_')."""
    os.makedirs(output_dir, exist_ok=True)
    outputs = []
    for dirpath, _, filenames in os.walk(root_dir):
        if "data.mdb" not in filenames:
            continue
        rel = os.path.relpath(dirpath, root_dir)
        flat = rel.replace(os.sep, "_")
        schema = "classification"
        for pattern, s in (schema_map or {}).items():
            if pattern in flat:
                schema = s
        out_csv = os.path.join(output_dir, f"{flat}.csv")
        convert_lmdb_to_csv(dirpath, out_csv, schema)
        outputs.append(out_csv)
    return outputs
