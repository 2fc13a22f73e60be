"""MLP probe on frozen embeddings (reference src/saprot_fit_mlp.py).

JAX/optax re-implementation of the reference's Lightning MLP probe: the
SaProt task registry with hard-coded output dims (reference
saprot_fit_mlp.py:135-150), per-task losses (BCE multi-label / MSE
regression / CE classification, lines 164-169), grid sweep over
cfg.sweep (lines 348-360), and the task-family metric suites
(acc/f1/auc, f1_max for GO/EC, MSE/R2/Spearman, lines 298-331).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from oneprot_tpu.downstream.utils import count_f1_max
from oneprot_tpu.utils.loggers import get_pylogger

log = get_pylogger(__name__)

# reference saprot_fit_mlp.py:135-150
TASK_REGISTRY: Dict[str, Dict[str, Any]] = {
    "EC": {"output_dim": 585, "type": "multi-label"},
    "GO-BP": {"output_dim": 1943, "type": "multi-label"},
    "GO-MF": {"output_dim": 489, "type": "multi-label"},
    "GO-CC": {"output_dim": 320, "type": "multi-label"},
    "DeepLoc10": {"output_dim": 10, "type": "classification"},
    "DeepLoc2": {"output_dim": 2, "type": "classification"},
    "TopEnzyme": {"output_dim": 826, "type": "classification"},
    "MetalIonBinding": {"output_dim": 2, "type": "classification"},
    "ThermoStability": {"output_dim": 1, "type": "regression"},
    "HumanPPI": {"output_dim": 2, "type": "ppi"},
    "ToyCls": {"output_dim": 3, "type": "classification"},
    "ToyReg": {"output_dim": 1, "type": "regression"},
}


@dataclasses.dataclass
class MLPProbeConfig:
    hidden_dims: Sequence[int] = (512,)
    dropout: float = 0.2
    lr: float = 1e-3
    batch_size: int = 128
    max_epochs: int = 50
    weight_decay: float = 0.0
    patience: int = 5
    seed: int = 0


def _init_mlp(key, dims: List[int]):
    params = []
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (d_in, d_out)) * (2.0 / d_in) ** 0.5
        params.append({"w": w, "b": jnp.zeros((d_out,))})
    return params


def _mlp_forward(params, x, dropout_rate=0.0, rng=None):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.relu(x)
            if dropout_rate > 0 and rng is not None:
                keep = jax.random.bernoulli(rng, 1 - dropout_rate, x.shape)
                x = jnp.where(keep, x / (1 - dropout_rate), 0.0)
    return x


def _loss_fn(task_type: str):
    if task_type == "multi-label":
        return lambda logits, y: optax.sigmoid_binary_cross_entropy(
            logits, y.astype(jnp.float32)).mean()
    if task_type == "regression":
        return lambda logits, y: jnp.mean((logits[:, 0] - y) ** 2)
    return lambda logits, y: optax.softmax_cross_entropy_with_integer_labels(
        logits, y).mean()


def compute_metrics(task_type: str, logits: np.ndarray,
                    labels: np.ndarray) -> Dict[str, float]:
    """Task-family metrics (reference saprot_fit_mlp.py:298-331)."""
    out: Dict[str, float] = {}
    if task_type == "regression":
        from scipy.stats import spearmanr

        pred = logits[:, 0]
        out["mse"] = float(np.mean((pred - labels) ** 2))
        ss_res = np.sum((labels - pred) ** 2)
        ss_tot = np.sum((labels - labels.mean()) ** 2) + 1e-12
        out["r2"] = float(1 - ss_res / ss_tot)
        out["spearman"] = float(spearmanr(pred, labels).statistic)
        return out
    if task_type == "multi-label":
        probs = 1.0 / (1.0 + np.exp(-logits))
        out["f1_max"] = count_f1_max(probs, labels)
        return out
    # classification / ppi
    from sklearn.metrics import accuracy_score, f1_score, roc_auc_score

    pred = logits.argmax(-1)
    out["accuracy"] = float(accuracy_score(labels, pred))
    out["f1"] = float(f1_score(labels, pred, average="macro"))
    try:
        probs = jax.nn.softmax(jnp.asarray(logits), -1)
        if logits.shape[1] == 2:
            out["auc"] = float(roc_auc_score(labels, np.asarray(probs)[:, 1]))
        else:
            out["auc"] = float(roc_auc_score(
                labels, np.asarray(probs), multi_class="ovr"))
    except ValueError:
        pass  # some classes absent in the split
    return out


def fit_mlp_probe(
    train: Tuple[np.ndarray, np.ndarray],
    valid: Tuple[np.ndarray, np.ndarray],
    test: Tuple[np.ndarray, np.ndarray],
    task: str,
    config: Optional[MLPProbeConfig] = None,
    output_dim: Optional[int] = None,
) -> Dict[str, float]:
    """Train the probe with early stopping on valid loss; report test metrics."""
    cfg = config or MLPProbeConfig()
    info = TASK_REGISTRY.get(task, {"output_dim": output_dim or 2,
                                    "type": "classification"})
    task_type = info["type"]
    out_dim = output_dim or info["output_dim"]

    x_tr, y_tr = train
    dims = [x_tr.shape[1], *cfg.hidden_dims, out_dim]
    key = jax.random.key(cfg.seed)
    params = _init_mlp(key, dims)
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    loss_fn = _loss_fn(task_type)

    @jax.jit
    def step(params, opt_state, x, y, rng):
        def l(p):
            return loss_fn(_mlp_forward(p, x, cfg.dropout, rng), y)

        loss, grads = jax.value_and_grad(l)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params, x, y):
        logits = _mlp_forward(params, x)
        return loss_fn(logits, y), logits

    x_tr = jnp.asarray(x_tr)
    y_tr = jnp.asarray(y_tr)
    x_va, y_va = map(jnp.asarray, valid)
    best_val = float("inf")
    best_params = params
    bad = 0
    rng_np = np.random.RandomState(cfg.seed)
    for epoch in range(cfg.max_epochs):
        order = rng_np.permutation(len(x_tr))
        for start in range(0, len(order), cfg.batch_size):
            idx = order[start:start + cfg.batch_size]
            key, sub = jax.random.split(key)
            params, opt_state, _ = step(
                params, opt_state, x_tr[idx], y_tr[idx], sub)
        val_loss = float(evaluate(params, x_va, y_va)[0])
        if val_loss < best_val - 1e-6:
            best_val, best_params, bad = val_loss, params, 0
        else:
            bad += 1
            if bad >= cfg.patience:
                break
    x_te, y_te = test
    _, logits = evaluate(best_params, jnp.asarray(x_te), jnp.asarray(y_te))
    metrics = compute_metrics(task_type, np.asarray(logits), np.asarray(y_te))
    metrics["val_loss"] = best_val
    return metrics


def sweep_mlp_probe(train, valid, test, task: str,
                    sweep: Dict[str, List[Any]],
                    base: Optional[MLPProbeConfig] = None) -> List[Dict]:
    """Grid sweep (reference saprot_fit_mlp.py:348-360)."""
    base = base or MLPProbeConfig()
    keys = list(sweep.keys())
    results = []
    for combo in itertools.product(*(sweep[k] for k in keys)):
        cfg = dataclasses.replace(base, **dict(zip(keys, combo)))
        metrics = fit_mlp_probe(train, valid, test, task, cfg)
        metrics.update({f"sweep/{k}": v for k, v in zip(keys, combo)})
        results.append(metrics)
        log.info(f"sweep {dict(zip(keys, combo))} -> {metrics}")
    return results
