"""Experiment loggers: CSV/JSONL (first-party) and optional wandb.

Replaces the reference's WandbLogger + Lightning log plumbing
(reference configs/logger/wandb.yaml, src/utils/logging_utils.py). wandb is
not part of the baked TPU image, so the default logger is a dependency-free
CSV/JSONL pair; WandbLogger engages only if wandb is importable.
"""

from __future__ import annotations

import csv
import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


class _NonZeroRankFilter(logging.Filter):
    """Demote INFO on non-zero ranks, probing the rank LAZILY per record.

    get_pylogger runs at MODULE IMPORT time in every entry point; an eager
    jax.process_index() there would initialize the XLA backend before
    jax.distributed.initialize (breaking every multi-host launch — the
    exact hazard core/mesh.init_distributed documents) and would always
    read rank 0 anyway. Probe only after a backend already exists, so the
    filter itself can never trigger initialization."""

    def filter(self, record: logging.LogRecord) -> bool:
        if record.levelno >= logging.WARNING:
            return True
        try:
            from jax._src import xla_bridge

            if not xla_bridge.backends_are_initialized():
                return True  # pre-init: keep logging, do NOT initialize
            import jax

            return jax.process_index() == 0
        except Exception:
            return True


def get_pylogger(name: str = __name__) -> logging.Logger:
    """Process-zero-aware logger (reference src/utils/pylogger.py:6-17)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(
            "[%(asctime)s][%(name)s][%(levelname)s] - %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.addFilter(_NonZeroRankFilter())
    return logger


class CsvLogger:
    """Appends metrics to metrics.csv + metrics.jsonl in the run dir."""

    def __init__(self, save_dir: str, name: str = "metrics"):
        self.save_dir = save_dir
        self.csv_path = os.path.join(save_dir, f"{name}.csv")
        self.jsonl_path = os.path.join(save_dir, f"{name}.jsonl")
        self._fieldnames: Optional[list] = None
        os.makedirs(save_dir, exist_ok=True)

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        row = {"step": step, "time": time.time()}
        row.update({k: _to_float(v) for k, v in metrics.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        # csv needs a stable header: rewrite if new keys appear
        if self._fieldnames is None or any(k not in self._fieldnames for k in row):
            self._rewrite_csv(row)
        else:
            with open(self.csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fieldnames)
                w.writerow(row)

    def _rewrite_csv(self, new_row: Dict[str, Any]) -> None:
        rows = []
        if os.path.isfile(self.jsonl_path):
            with open(self.jsonl_path) as f:
                rows = [json.loads(line) for line in f if line.strip()]
        else:
            rows = [new_row]
        keys: list = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        self._fieldnames = keys
        with open(self.csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        with open(os.path.join(self.save_dir, "hparams.json"), "w") as f:
            json.dump(params, f, indent=2, default=str)

    def finalize(self) -> None:
        pass


class WandbLogger:
    """wandb logger, gated on import (offline by default, like the
    reference configs/logger/wandb.yaml:3-17)."""

    def __init__(self, save_dir: str, project: str = "oneprot",
                 offline: bool = True, **kwargs: Any):
        try:
            import wandb
        except ImportError:
            self._run = None
            self._fallback = CsvLogger(save_dir, name="wandb_fallback")
            return
        mode = "offline" if offline else "online"
        self._run = wandb.init(project=project, dir=save_dir, mode=mode, **kwargs)
        self._fallback = None

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        if self._run is None:
            self._fallback.log_metrics(metrics, step)
        else:
            self._run.log({k: _to_float(v) for k, v in metrics.items()}, step=step)

    def log_hyperparams(self, params: Dict[str, Any]) -> None:
        if self._run is not None:
            self._run.config.update(params, allow_val_change=True)

    def finalize(self) -> None:
        if self._run is not None:
            self._run.finish()


def _to_float(v: Any) -> Any:
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


class MultiLogger:
    def __init__(self, loggers):
        self.loggers = list(loggers)

    def log_metrics(self, metrics, step):
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def log_hyperparams(self, params):
        for lg in self.loggers:
            lg.log_hyperparams(params)

    def finalize(self):
        for lg in self.loggers:
            lg.finalize()
