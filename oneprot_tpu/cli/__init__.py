"""Package-namespaced CLI entry modules (console scripts
`train_command`/`eval_command` point here).

The reference namespaces its entry points inside the package
(reference setup.py:15-20 -> src.train:main); shipping top-level `train`/
`eval` modules in a wheel would collide with any other distribution using
those generic names (advisor r3 finding). The repo root keeps thin
`train.py`/`eval.py` wrappers for `python train.py ...` checkout use.
"""

import os


def default_config_dir() -> str:
    """Locate the hydra-style config tree: $ONEPROT_CONFIG_DIR, else the
    repo checkout's `configs/` (two levels above this package), else
    `./configs` relative to the caller's cwd (installed-wheel use)."""
    env = os.environ.get("ONEPROT_CONFIG_DIR")
    if env:
        return env
    repo = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
    cand = os.path.join(repo, "configs")
    if os.path.isdir(cand):
        return cand
    return os.path.join(os.getcwd(), "configs")
