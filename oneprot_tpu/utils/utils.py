"""Framework utilities: extras, task wrapper, rich config printing.

Re-implements the reference's run plumbing (reference src/utils/utils.py,
rich_utils.py): warning filters + tag enforcement + rich config tree
(utils.py:11-46), and the task_wrapper that logs exceptions and always closes
loggers (utils.py:53-103).
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, Dict, Optional, Sequence

from oneprot_tpu.utils.loggers import get_pylogger

log = get_pylogger(__name__)

_PRINT_ORDER = ("data", "model", "trainer", "callbacks", "logger", "paths",
                "extras")


def extras(cfg: Dict[str, Any]) -> None:
    """Apply optional pre-task behaviors (reference utils.py:11-46)."""
    ex = cfg.get("extras") or {}
    if ex.get("ignore_warnings"):
        warnings.filterwarnings("ignore")
    if ex.get("enforce_tags") and not cfg.get("tags"):
        log.warning("no tags provided (extras.enforce_tags=True)")
    if ex.get("print_config", True):
        print_config_tree(cfg)


def print_config_tree(cfg: Dict[str, Any],
                      order: Sequence[str] = _PRINT_ORDER) -> None:
    """Rich config tree (reference rich_utils.py:18-76)."""
    try:
        import rich
        import rich.syntax
        import rich.tree
        import yaml

        from oneprot_tpu.core.config import to_plain

        tree = rich.tree.Tree("CONFIG", style="dim")
        plain = to_plain(cfg)
        keys = [k for k in order if k in plain]
        keys += [k for k in plain if k not in keys]
        for key in keys:
            branch = tree.add(key, style="bold")
            value = plain[key]
            if isinstance(value, dict):
                branch.add(rich.syntax.Syntax(
                    yaml.safe_dump(value, sort_keys=False), "yaml"))
            else:
                branch.add(str(value))
        rich.print(tree)
    except Exception as e:  # printing must never kill a run
        log.warning(f"config tree printing failed: {e}")


def task_wrapper(task_func: Callable) -> Callable:
    """Exception-safe task execution (reference utils.py:53-103): log and
    re-raise failures, always finalize loggers, log the output dir."""

    @functools.wraps(task_func)
    def wrap(cfg: Dict[str, Any], *args: Any, **kwargs: Any):
        try:
            return task_func(cfg, *args, **kwargs)
        except Exception:
            log.exception("task failed")
            raise
        finally:
            out = (cfg.get("paths") or {}).get("output_dir")
            if out:
                log.info(f"Output dir: {out}")

    return wrap


def log_hyperparameters(cfg: Dict[str, Any], module: Any, logger: Any) -> None:
    """Param counts + resolved config to the logger
    (reference logging_utils.py:9-50)."""
    from oneprot_tpu.core.config import to_plain

    hparams = to_plain(cfg)
    if getattr(module, "state", None) is not None:
        total, trainable = module.num_params()
        hparams["model/params/total"] = total
        hparams["model/params/trainable"] = trainable
        hparams["model/params/non_trainable"] = total - trainable
    logger.log_hyperparams(hparams)
