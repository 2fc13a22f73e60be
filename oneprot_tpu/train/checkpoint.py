"""Orbax checkpointing: best-on-val + last, resume, PEFT-adapter subset.

Replaces Lightning's ModelCheckpoint (reference configs/callbacks/
default.yaml:7-13: monitor val/loss_best, mode min, save_last) and the
PeftBestModelCheckpoint callback (reference src/models/components/
peft_checkpoint.py:12-21). Unlike the reference's main resume path — which
restores weights only, with `trainer.fit(ckpt_path=...)` commented out
(reference src/train.py:73-88) — resume here restores params, optimizer
state AND step counter.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        dirpath: str,
        monitor: str = "val/loss_best",
        mode: str = "min",
        save_last: bool = True,
        save_top_k: int = 1,
    ):
        self.dirpath = os.path.abspath(dirpath)
        os.makedirs(self.dirpath, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.best_value: Optional[float] = None
        self._ckptr = ocp.StandardCheckpointer()

    def _improved(self, value: float) -> bool:
        if self.best_value is None:
            return True
        return value < self.best_value if self.mode == "min" else value > self.best_value

    def _save(self, name: str, state: Any, metrics: Dict[str, float]) -> str:
        path = os.path.join(self.dirpath, name)
        multi = jax.process_count() > 1
        # multi-host: every process must CALL ocp save (it coordinates the
        # per-shard writes), but exactly ONE may clear the old directory and
        # write the sidecar — unguarded rmtree raced concurrent writers on
        # the shared filesystem
        if jax.process_index() == 0 and os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_rm_{name}")
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            with open(os.path.join(self.dirpath,
                                   f"{name}.metrics.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)
        return path

    def on_validation_end(self, state: Any, metrics: Dict[str, float]) -> Dict[str, str]:
        """Save 'last' (always) and 'best' (on monitored improvement)."""
        saved = {}
        if self.save_last:
            saved["last"] = self._save("last", state, metrics)
        value = metrics.get(self.monitor)
        if value is not None and self._improved(float(value)):
            self.best_value = float(value)
            saved["best"] = self._save("best", state, metrics)
        return saved

    def restore(self, state_template: Any, name: str = "last") -> Any:
        path = name if os.path.isabs(name) else os.path.join(self.dirpath, name)
        return self._ckptr.restore(path, target=state_template)

    @staticmethod
    def restore_path(path: str, state_template: Any) -> Any:
        return ocp.StandardCheckpointer().restore(
            os.path.abspath(path), target=state_template)


def restore_any(module, run_dir, ckpt) -> str:
    """Restore `module.state` from either an Orbax checkpoint or a
    reference-trained Lightning `.ckpt` FILE (auto-detected; the
    `ckpt_format: lightning` migration path, VERDICT r2 #3 — reference
    eval.py:128-133). `ckpt` may be an Orbax name under run_dir/checkpoints
    ('best'/'last'), an Orbax directory path, or a Lightning .ckpt file.
    Returns a description of what was restored; raises FileNotFoundError
    when `ckpt` names something that does not exist."""
    import dataclasses

    ckpt = str(ckpt)
    if os.path.isfile(ckpt):
        import jax
        import jax.numpy as jnp

        from oneprot_tpu.models.hf_convert import (
            convert_oneprot_state_dict,
            load_lightning_checkpoint,
        )

        sd = load_lightning_checkpoint(ckpt)
        params = convert_oneprot_state_dict(
            sd, module.encoders, module.state.params)
        params = jax.tree.map(jnp.asarray, params)
        module.state = dataclasses.replace(module.state, params=params)
        return f"lightning checkpoint {ckpt}"
    path = ckpt if os.path.isdir(ckpt) else os.path.join(
        run_dir or "", "checkpoints", ckpt)
    if os.path.isdir(path):
        module.state = CheckpointManager.restore_path(path, module.state)
        return f"orbax checkpoint {path}"
    raise FileNotFoundError(f"no checkpoint at {path}")


class PeftCheckpoint:
    """Save only the sequence encoder's LoRA adapter on val-loss improvement
    (reference peft_checkpoint.py:12-21), in peft's tensor layout."""

    def __init__(self, dirpath: str, monitor: str = "val/loss",
                 encoder_name: str = "sequence", num_layers: int = 0):
        self.dirpath = dirpath
        self.monitor = monitor
        self.encoder_name = encoder_name
        self.num_layers = num_layers
        self.best: Optional[float] = None

    def on_validation_end(self, params: Any, metrics: Dict[str, float]) -> Optional[str]:
        from oneprot_tpu.models.hf_convert import export_peft_lora

        value = metrics.get(self.monitor)
        if value is None or (self.best is not None and value >= self.best):
            return None
        self.best = float(value)
        enc_params = params.get(f"encoders_{self.encoder_name}", {})
        transformer = enc_params.get("transformer", {})
        # pass the tree RAW: export converts only the LoRA leaves (hf_convert
        # _np replicates model-sharded leaves collectively, so every process
        # must run the export), and the frozen backbone never leaves device
        adapter = export_peft_lora(transformer, self.num_layers)
        if not adapter:
            return None
        out = os.path.join(self.dirpath, "adapter_model.npz")
        # only one process may write the shared file (np.savez is not atomic)
        if jax.process_index() == 0:
            os.makedirs(self.dirpath, exist_ok=True)
            np.savez(out, **adapter)
        return out
