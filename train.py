#!/usr/bin/env python
"""Training entry point: `python train.py [overrides...]`.

Thin checkout wrapper over `oneprot_tpu.cli.train` (the reference exposes
`python src/train.py`, reference src/train.py; the installable console
script is `train_command = oneprot_tpu.cli.train:main`).
"""

import os
import sys

# keep project-root imports working from anywhere (pyrootutils equivalent)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oneprot_tpu.cli.train import (  # noqa: E402,F401
    expand_multirun,
    extract_sweeper,
    log,
    main,
    run_search,
    train,
)

if __name__ == "__main__":
    metrics = main()
    for m in metrics if isinstance(metrics, list) else [metrics]:
        printable = {k: round(float(v), 4) for k, v in m.items()
                     if isinstance(v, (int, float))}
        log.info(f"final metrics: {printable}")
