"""Gradient-boosted probes (reference src/saprot_fit_cls.py / saprot_fit_reg.py).

The reference hydra-instantiates xgboost.XGBClassifier/Regressor
(reference configs/downstream_model/xgboost_*.yaml). xgboost is not part of
the baked TPU image, so these factories return xgboost when importable and
sklearn HistGradientBoosting otherwise (same fit/predict surface); the
objective is auto-set per task like saprot_fit_cls.py:23-30.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from oneprot_tpu.downstream.mlp_probe import TASK_REGISTRY, compute_metrics
from oneprot_tpu.utils.loggers import get_pylogger

log = get_pylogger(__name__)


def make_classifier(n_estimators: int = 500, max_depth: int = 6,
                    learning_rate: float = 0.1, **kwargs: Any):
    try:
        from xgboost import XGBClassifier

        return XGBClassifier(n_estimators=n_estimators, max_depth=max_depth,
                             learning_rate=learning_rate, **kwargs)
    except ImportError:
        from sklearn.ensemble import HistGradientBoostingClassifier

        log.warning("xgboost unavailable; using sklearn HistGradientBoosting")
        return HistGradientBoostingClassifier(
            max_iter=n_estimators, max_depth=max_depth,
            learning_rate=learning_rate)


def make_regressor(n_estimators: int = 500, max_depth: int = 6,
                   learning_rate: float = 0.1, **kwargs: Any):
    try:
        from xgboost import XGBRegressor

        return XGBRegressor(n_estimators=n_estimators, max_depth=max_depth,
                            learning_rate=learning_rate, **kwargs)
    except ImportError:
        from sklearn.ensemble import HistGradientBoostingRegressor

        log.warning("xgboost unavailable; using sklearn HistGradientBoosting")
        return HistGradientBoostingRegressor(
            max_iter=n_estimators, max_depth=max_depth,
            learning_rate=learning_rate)


def fit_booster(train, valid, test, task: str, model=None) -> Dict[str, float]:
    """Fit on train embeddings, report test metrics. `valid` is accepted
    for signature parity with the reference flow but boosters do not use a
    validation split (the reference's xgboost configs fit on train only,
    saprot_fit_cls.py)."""
    del valid
    info = TASK_REGISTRY.get(task, {"type": "classification", "output_dim": 2})
    task_type = info["type"]
    x_tr, y_tr = train
    x_te, y_te = test
    if model is None:
        model = (make_regressor() if task_type == "regression"
                 else make_classifier())
    if task_type == "regression":
        model.fit(np.asarray(x_tr), np.asarray(y_tr))
        pred = np.asarray(model.predict(x_te))[:, None]
        return compute_metrics("regression", pred, np.asarray(y_te))
    # label-encode: a train split missing some class ids would make
    # predict_proba columns follow model.classes_, so a bare argmax over
    # columns silently misaligns with the original label values (and
    # xgboost outright rejects non-contiguous labels). Fit on contiguous
    # encoded labels and scatter the probabilities back into the full
    # class space before comparing with y_te.
    y_tr = np.asarray(y_tr)
    y_te = np.asarray(y_te)
    classes, y_enc = np.unique(y_tr, return_inverse=True)
    n_cls = int(max(int(classes.max()), int(y_te.max()))) + 1
    model.fit(np.asarray(x_tr), y_enc)
    logits = np.full((len(y_te), n_cls), -30.0)
    if hasattr(model, "predict_proba"):
        probs = np.asarray(model.predict_proba(x_te))
        logits[:, classes.astype(int)] = np.log(np.clip(probs, 1e-9, 1.0))
    else:
        pred = classes[np.asarray(model.predict(x_te)).astype(int)]
        logits[np.arange(len(pred)), pred.astype(int)] = 0.0
    return compute_metrics("classification", logits, y_te)
