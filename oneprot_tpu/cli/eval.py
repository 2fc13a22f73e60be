#!/usr/bin/env python
"""Retrieval evaluation entry point: `python eval.py run_dir=<run> [...]`.

TPU-native equivalent of the reference's `python src/eval.py`
(reference src/eval.py:209-241): loads a trained run, embeds all modalities
from a combined CSV, computes all-pairs R@{1,10,100,500} + median rank, and
writes the fixed-width results CSV.
"""

from __future__ import annotations

import sys

from oneprot_tpu.cli import default_config_dir  # noqa: E402
from oneprot_tpu.core.config import load_config, prepare_run_dir  # noqa: E402
from oneprot_tpu.evaluation.retrieval_eval import run_eval  # noqa: E402


def main(argv=None):
    from oneprot_tpu.core.mesh import enable_compilation_cache

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = default_config_dir()
    cfg = load_config(config_dir, "eval", overrides=argv)
    cfg = prepare_run_dir(cfg)
    return run_eval(cfg)


if __name__ == "__main__":
    main()
