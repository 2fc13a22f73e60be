#!/usr/bin/env python
"""Training entry point: `python train.py [overrides...]`.

TPU-native equivalent of the reference's `python src/train.py`
(reference src/train.py): composes the config (same group surface), seeds,
instantiates datamodule / module / trainer / callbacks / loggers, optionally
restores a checkpoint, fits, and optionally tests with the best weights.

No SLURM rendezvous or MASTER_ADDR patching (reference src/train.py:109-127,
src/distributed.py) — on TPU pods `jax.distributed.initialize()` handles
topology; single-host runs need nothing.
"""

from __future__ import annotations

import os
import sys

from oneprot_tpu.cli import default_config_dir  # noqa: E402
from oneprot_tpu.core.config import (  # noqa: E402
    instantiate,
    load_config,
    prepare_run_dir,
    to_plain,
)
from oneprot_tpu.utils.loggers import CsvLogger, MultiLogger, get_pylogger  # noqa: E402
from oneprot_tpu.utils.utils import extras, task_wrapper  # noqa: E402

log = get_pylogger("train")


@task_wrapper
def train(cfg) -> dict:
    """Run one training task from a resolved config (reference train.py:26-92)."""
    import jax

    from oneprot_tpu.core.mesh import enable_compilation_cache, init_distributed

    enable_compilation_cache()
    init_distributed()
    seed = int(cfg.get("seed", 0))

    output_dir = cfg["paths"]["output_dir"]
    log.info(f"output_dir: {output_dir}")

    data_dir = str(cfg["paths"]["data_dir"])
    if data_dir.endswith("synthetic") or not (
            os.path.isdir(data_dir) and os.listdir(data_dir)):
        from oneprot_tpu.data.synthetic import ensure_fixtures

        log.info(f"generating synthetic fixtures in {data_dir}")
        ensure_fixtures(data_dir)

    log.info("Instantiating datamodule")
    data_cfg = dict(cfg["data"])
    datamodule = instantiate({**data_cfg, "seed": seed})

    log.info("Instantiating model")
    model_cfg = dict(cfg["model"])
    module = instantiate({**model_cfg, "seed": seed})

    log.info("Instantiating trainer")
    trainer = instantiate(cfg["trainer"])

    loggers = [CsvLogger(output_dir)]
    for name, lg_cfg in (cfg.get("logger") or {}).items():
        if isinstance(lg_cfg, dict) and "_target_" in lg_cfg:
            try:
                loggers.append(instantiate(lg_cfg))
            except Exception as e:  # optional deps (wandb) may be absent
                log.warning(f"logger {name} unavailable: {e}")
    logger = MultiLogger(loggers)
    logger.log_hyperparams(to_plain(cfg))

    metrics = {}
    if cfg.get("train", True):
        log.info("Starting training")
        metrics = trainer.fit(
            module, datamodule,
            ckpt_path=cfg.get("ckpt_path"),
            callbacks=cfg.get("callbacks"),
            logger=logger,
            output_dir=output_dir,
        )

    if cfg.get("test", False):
        log.info("Starting testing (best checkpoint)")
        if not cfg.get("train", True):
            # test-only run (train=false test=true, reference train.py
            # surface): fit() never ran, so the trainer has no logger/
            # callbacks and the module no params — set up explicitly, and
            # honor an explicit ckpt_path for the restore
            trainer.setup(module, datamodule,
                          callbacks=cfg.get("callbacks"), logger=logger,
                          output_dir=output_dir)
            if cfg.get("ckpt_path"):
                from oneprot_tpu.train.checkpoint import CheckpointManager

                module.state = CheckpointManager.restore_path(
                    str(cfg["ckpt_path"]), module.state)
        best = os.path.join(output_dir, "checkpoints", "best")
        if os.path.isdir(best):
            module.state = trainer.callbacks["checkpoint"].restore(
                module.state, "best")
        metrics.update(trainer.test(module, datamodule))

    logger.finalize()
    return metrics


def expand_multirun(overrides):
    """hydra-style `-m a=1,2 b=x,y` -> cartesian product of override sets."""
    import itertools

    choices = []
    for ov in overrides:
        key, sep, val = ov.partition("=")
        if sep and "," in val and not val.startswith("["):
            choices.append([f"{key}={v}" for v in val.split(",")])
        else:
            choices.append([ov])
    return [list(combo) for combo in itertools.product(*choices)]


def extract_sweeper(argv):
    """Split hydra-sweeper overrides (`hydra/sweeper=optuna`,
    `hydra.sweeper.<opt>=...`, `hydra.sweeper.params.<key>=<space>`) from the
    regular overrides. Mirrors the reference's optuna sweep surface
    (reference tests/test_sweeps.py:59-70)."""
    sweeper_name = None
    options = {}
    params = {}
    rest = []
    for ov in argv:
        key, sep, val = ov.partition("=")
        key = key.lstrip("+")
        if key == "hydra/sweeper":
            sweeper_name = val
        elif key.startswith("hydra.sweeper.params."):
            params[key[len("hydra.sweeper.params."):]] = val
        elif key.startswith("hydra.sweeper."):
            options[key[len("hydra.sweeper."):]] = val
        else:
            rest.append(ov)
    return sweeper_name, options, params, rest


def run_search(sweeper_name, options, params, base_overrides, config_dir):
    """Sequential ask/tell hyperparameter search over train()."""
    from oneprot_tpu.core.sweep import make_sweeper

    objective = options.pop("objective", "val/loss")
    direction = options.pop("direction", "minimize")
    kwargs = {}
    for k in ("n_trials", "seed", "n_startup_trials", "n_candidates"):
        if k in options:
            kwargs[k] = int(float(options.pop(k)))
    if "gamma" in options:
        kwargs["gamma"] = float(options.pop("gamma"))
    sweeper = make_sweeper(sweeper_name, params, direction=direction,
                           **kwargs)
    sign = 1.0 if direction == "minimize" else -1.0
    all_metrics = []
    best = (float("inf"), None)
    trial_idx = 0
    while True:
        trial = sweeper.ask()
        if trial is None:
            break
        combo = base_overrides + [f"{k}={v}" for k, v in trial.items()]
        log.info(f"search trial {trial_idx} ({sweeper_name}): {trial}")
        cfg = load_config(config_dir, "train", overrides=combo)
        cfg = prepare_run_dir(cfg)
        extras(cfg)
        metrics = train(cfg)
        value = float(metrics.get(objective, float("nan")))
        sweeper.tell(trial, value)
        metrics = dict(metrics)
        metrics["search/trial"] = trial_idx
        metrics.update({f"search/{k}": v for k, v in trial.items()})
        all_metrics.append(metrics)
        if sign * value < best[0]:
            best = (sign * value, trial)
        trial_idx += 1
    log.info(f"search best {objective}={sign * best[0]:.6f} params={best[1]}")
    return all_metrics


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = default_config_dir()
    multirun = False
    for flag in ("-m", "--multirun"):
        if flag in argv:
            argv.remove(flag)
            multirun = True
    if multirun:
        sweeper_name, options, params, rest = extract_sweeper(argv)
        if sweeper_name not in (None, "basic") and params:
            return run_search(sweeper_name, options, params, rest,
                              config_dir)
        all_metrics = []
        for i, combo in enumerate(expand_multirun(rest)):
            log.info(f"multirun job {i}: {combo}")
            cfg = load_config(config_dir, "train", overrides=combo)
            cfg = prepare_run_dir(cfg)
            extras(cfg)
            all_metrics.append(train(cfg))
        return all_metrics
    cfg = load_config(config_dir, "train", overrides=argv)
    cfg = prepare_run_dir(cfg)
    extras(cfg)
    return train(cfg)


if __name__ == "__main__":
    metrics = main()
    for m in metrics if isinstance(metrics, list) else [metrics]:
        printable = {k: round(float(v), 4) for k, v in m.items()
                     if isinstance(v, (int, float))}
        log.info(f"final metrics: {printable}")
