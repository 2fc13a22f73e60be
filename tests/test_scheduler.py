"""Plateau LR scheduler: runtime lr rewrite inside the optax state."""

import jax.numpy as jnp
import numpy as np
import optax

from oneprot_tpu.train.optim import adam, build_optimizer
from oneprot_tpu.train.scheduler import (
    ReduceLROnPlateau,
    get_learning_rate,
    set_learning_rate,
)


def test_lr_is_injected_and_rewritable():
    tx = build_optimizer(lambda: adam(1e-3), gradient_clip_val=1.0)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9
    new_state = set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(new_state) - 5e-4) < 1e-9
    # updates still apply after the rewrite and reflect the smaller lr
    grads = {"w": jnp.ones((4,))}
    upd_old, _ = tx.update(grads, state, params)
    upd_new, _ = tx.update(grads, new_state, params)
    assert np.abs(upd_new["w"]).max() < np.abs(upd_old["w"]).max()


def test_reduce_on_plateau_logic():
    class FakeState:
        def __init__(self, opt_state):
            self.opt_state = opt_state

        def replace(self, opt_state):
            return FakeState(opt_state)

    class FakeModule:
        def __init__(self):
            tx = build_optimizer(lambda: adam(1e-2))
            self.state = FakeState(tx.init({"w": jnp.ones(2)}))

    sched = ReduceLROnPlateau(monitor="val/loss_best", factor=0.5, patience=1)
    m = FakeModule()
    assert sched.on_validation_end(m, {"val/loss_best": 1.0}) is None  # best
    assert sched.on_validation_end(m, {"val/loss_best": 1.0}) is None  # bad 1
    new_lr = sched.on_validation_end(m, {"val/loss_best": 1.0})  # bad 2 > patience
    assert new_lr is not None and abs(new_lr - 5e-3) < 1e-9
    assert abs(get_learning_rate(m.state.opt_state) - 5e-3) < 1e-9
