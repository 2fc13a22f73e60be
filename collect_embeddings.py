#!/usr/bin/env python
"""Embedding-collection entry point (reference src/collect_embeddings.py).

`python collect_embeddings.py tasks=[ToyCls] models.esm2.model_name_or_path=...`
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oneprot_tpu.core.config import load_config, prepare_run_dir  # noqa: E402
from oneprot_tpu.evaluation.collect_embeddings import run_collection  # noqa: E402


def main(argv=None):
    from oneprot_tpu.core.mesh import enable_compilation_cache

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "configs")
    cfg = load_config(config_dir, "collect_embeddings", overrides=argv)
    cfg = prepare_run_dir(cfg)
    return run_collection(cfg)


if __name__ == "__main__":
    outs = main()
    print("\n".join(outs))
