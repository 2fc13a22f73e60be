"""LR scheduling: ReduceLROnPlateau on val/loss_best.

The reference's optional scheduler is torch ReduceLROnPlateau monitoring
"val/loss_best", stepped per epoch (reference oneprot_module.py:157-170).
TPU equivalent: the optimizer is built with `optax.inject_hyperparams`, so
the learning rate lives in the (replicated) optimizer state; this host-side
callback rewrites it in place after each validation — no recompilation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from oneprot_tpu.utils.loggers import get_pylogger

log = get_pylogger(__name__)


class ReduceLROnPlateau:
    def __init__(
        self,
        monitor: str = "val/loss_best",
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 10,
        min_lr: float = 0.0,
        threshold: float = 1e-4,
        **unused: Any,
    ):
        self.monitor = monitor
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return value < self.best - self.threshold
        return value > self.best + self.threshold

    def on_validation_end(self, module, metrics: Dict[str, float]) -> Optional[float]:
        """Returns the new lr if reduced, else None."""
        value = metrics.get(self.monitor)
        if value is None:
            return None
        if self._improved(float(value)):
            self.best = float(value)
            self.bad_epochs = 0
            return None
        self.bad_epochs += 1
        if self.bad_epochs <= self.patience:
            return None
        self.bad_epochs = 0
        current = get_learning_rate(module.state.opt_state)
        if current is None:
            log.warning("optimizer state has no injected learning_rate; "
                        "plateau scheduler inactive")
            return None
        new_lr = max(current * self.factor, self.min_lr)
        module.state = module.state.replace(
            opt_state=set_learning_rate(module.state.opt_state, new_lr))
        log.info(f"ReduceLROnPlateau: lr {current:.2e} -> {new_lr:.2e}")
        return new_lr


def _find_hyperparams(opt_state) -> Optional[Any]:
    """Locate an InjectStatefulHyperparamsState node holding learning_rate."""
    found = []

    def visit(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            found.append(node)
            return
        if isinstance(node, (tuple, list)):
            for child in node:
                visit(child)

    visit(opt_state)
    return found[0] if found else None


def get_learning_rate(opt_state) -> Optional[float]:
    node = _find_hyperparams(opt_state)
    if node is None:
        return None
    return float(np.asarray(node.hyperparams["learning_rate"]))


def set_learning_rate(opt_state, new_lr: float):
    """Pure-tree rewrite of the injected learning rate (sharding-preserving)."""
    node = _find_hyperparams(opt_state)
    if node is None:
        return opt_state
    old = node.hyperparams["learning_rate"]
    new_val = jax.device_put(
        np.asarray(new_lr, np.asarray(old).dtype), _sharding_of(old))

    def rewrite(n):
        if n is node:
            hp = dict(n.hyperparams)
            hp["learning_rate"] = new_val
            return n._replace(hyperparams=hp) if hasattr(n, "_replace") else n
        if isinstance(n, tuple) and not hasattr(n, "_replace"):
            return tuple(rewrite(c) for c in n)
        if hasattr(n, "_replace") and isinstance(n, tuple):
            return n._replace(**{
                f: rewrite(getattr(n, f)) for f in n._fields
                if isinstance(getattr(n, f), tuple)
            })
        return n

    return rewrite(opt_state)


def _sharding_of(x):
    try:
        return x.sharding
    except AttributeError:
        return jax.devices()[0]
