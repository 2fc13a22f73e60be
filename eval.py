#!/usr/bin/env python
"""Retrieval evaluation entry point: `python eval.py run_dir=<run> [...]`.

Thin checkout wrapper over `oneprot_tpu.cli.eval` (the reference exposes
`python src/eval.py`, reference src/eval.py:209-241; the installable
console script is `eval_command = oneprot_tpu.cli.eval:main`).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oneprot_tpu.cli.eval import main  # noqa: E402,F401

if __name__ == "__main__":
    main()
