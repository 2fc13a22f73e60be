"""Child process for the multi-process TRAINING test (VERDICT r2 #2).

Usage: python mp_train_child.py <process_id> <num_processes> <port> <out_npz>

Each process owns 4 virtual CPU devices (global mesh = nproc*4) and holds
its own slice of every global batch (loader-sharding convention: rows
pid::nproc). It runs the PRODUCTION multi-host training branch —
`make_array_from_process_local_data` in OneProtModule._shard_batch
(train/module.py) — for:

  phase 1: N regular train_steps (full fwd+bwd+Adam; trainable hub)
  phase 2: N cached train_steps (frozen hub: pooled features computed
           process-locally, fed through train_step_cached)

and writes per-step losses plus the final trainable params to an npz. The
parent (tests/test_multiprocess.py) asserts both processes agree and match
a single-process oracle over the same global batches — the TPU-native
equivalent of DDP gradient all-reduce correctness (reference
configs/trainer/ddp.yaml:12).
"""

import os
import sys

pid, nproc, port, out_npz = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

repo = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Bootstrap through the PRODUCTION path (core.mesh.init_distributed), not a
# direct jax.distributed.initialize: this proves init_distributed's
# already-initialized probe does not itself initialize the XLA backend
# (which would make the initialize call below unreachable — it raises once
# any backend is up).
from oneprot_tpu.core.mesh import init_distributed  # noqa: E402

init_distributed(coordinator_address=f"127.0.0.1:{port}",
                 num_processes=nproc, process_id=pid)
assert jax.distributed.is_initialized()

import numpy as np  # noqa: E402

from helpers.tiny_models import build_tiny_module, tiny_ids  # noqa: E402

from oneprot_tpu.core.mesh import make_mesh  # noqa: E402

assert len(jax.devices()) == nproc * 4, jax.devices()
mesh = make_mesh(data=nproc * 4, model=1)

GLOBAL_B = 16
N_STEPS = 5

# -- phase 1: regular multi-host train steps (trainable hub) ----------------
module = build_tiny_module(mesh)
init_seq = tiny_ids(24, 0, batch=GLOBAL_B)
init_st = tiny_ids(54, 1, batch=GLOBAL_B)
module.init({"struct_token": (init_seq[:8], init_st[:8])})

state = module.state
losses = []
for step in range(N_STEPS):
    seq_ids = tiny_ids(24, 100 + step, batch=GLOBAL_B)
    st_ids = tiny_ids(54, 200 + step, batch=GLOBAL_B)
    # loader-sharding convention: this process holds rows pid::nproc
    state, loss = module.train_step(state, "struct_token",
                                    seq_ids[pid::nproc], st_ids[pid::nproc])
    losses.append(float(loss))

from oneprot_tpu.train import optim as optim_lib  # noqa: E402

trainable, _ = optim_lib.partition_params(state.params, module.mask)
flat = {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(trainable)[0]}

# -- phase 2: cached train steps (frozen hub) -------------------------------
# pooled hub features are computed PROCESS-LOCALLY (the production feature
# cache holds host numpy arrays), then the cached train step assembles the
# global batch via make_array_from_process_local_data.
module_c = build_tiny_module(mesh, frozen_hub=True)
module_c.init({"struct_token": (init_seq[:8], init_st[:8])})
local_c = build_tiny_module(None, frozen_hub=True)
local_c.init({"struct_token": (init_seq[:8], init_st[:8])})
assert module_c.hub_is_cacheable()

state_c = module_c.state
losses_c = []
for step in range(N_STEPS):
    seq_ids = tiny_ids(24, 100 + step, batch=GLOBAL_B)
    st_ids = tiny_ids(54, 200 + step, batch=GLOBAL_B)
    pooled = local_c.encode_pooled(local_c.state.params, "sequence",
                                   seq_ids[pid::nproc])
    state_c, loss = module_c.train_step_cached(
        state_c, "struct_token", np.asarray(pooled), st_ids[pid::nproc])
    losses_c.append(float(loss))

trainable_c, _ = optim_lib.partition_params(state_c.params, module_c.mask)
flat_c = {"c:" + "/".join(str(getattr(k, "key", k)) for k in path):
          np.asarray(v)
          for path, v in jax.tree_util.tree_flatten_with_path(trainable_c)[0]}

# -- phase 3: multi-host checkpoint save/restore into a SHARED dir ----------
# every process calls save (ocp coordinates shard writes); only process 0
# clears the dir and writes the metrics sidecar (train/checkpoint.py _save
# guards + sync_global_devices barrier — unguarded, the rmtree raced the
# other process's concurrent write on the shared filesystem).
from oneprot_tpu.train.checkpoint import CheckpointManager  # noqa: E402

ckpt_dir = os.path.join(os.path.dirname(out_npz), "shared_ckpt")
mgr = CheckpointManager(ckpt_dir)
saved = mgr.on_validation_end(state_c, {"val/loss_best": 1.0,
                                        "trainer/epoch": 0.0})
assert "last" in saved and "best" in saved, saved
restored = mgr.restore(state_c, "last")
r_flat = jax.tree_util.tree_leaves(restored.params)
s_flat = jax.tree_util.tree_leaves(state_c.params)
for r, sv in zip(r_flat, s_flat):
    np.testing.assert_allclose(np.asarray(r), np.asarray(sv), rtol=0,
                               atol=0)
assert os.path.exists(os.path.join(ckpt_dir, "last.metrics.json"))

# -- phase 4: PEFT adapter save with MODEL-SHARDED lora_B -------------------
# lora_B shards along the model axis (core/partitioning.py:58); on a pod the
# shards span hosts, so the export must replicate collectively (hf_convert
# _np) before np conversion, and only process 0 may write the shared npz.
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from oneprot_tpu.train.checkpoint import PeftCheckpoint  # noqa: E402

pm = make_mesh(data=1, model=nproc * 4)
a_host = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
b_host = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
lora_a = jax.device_put(a_host, NamedSharding(pm, P()))
lora_b = jax.device_put(b_host, NamedSharding(pm, P(None, "model")))
assert not lora_b.is_fully_addressable, "lora_B must span processes"
peft_params = {"encoders_sequence": {"transformer": {"layer_0": {"attn": {
    "q": {"lora_A": lora_a, "lora_B": lora_b}}}}}}
peft_dir = os.path.join(os.path.dirname(out_npz), "shared_peft")
peft = PeftCheckpoint(peft_dir, num_layers=1)
peft_out = peft.on_validation_end(peft_params, {"val/loss": 0.5})
assert peft_out is not None
if pid == 0:
    saved_npz = np.load(peft_out)
    key = "base_model.model.encoder.layer.0.attention.self.query"
    np.testing.assert_array_equal(saved_npz[f"{key}.lora_A.weight"], a_host.T)
    np.testing.assert_array_equal(saved_npz[f"{key}.lora_B.weight"], b_host.T)

# -- phase 5: run-dir stamp agreement + snapshot write guard ----------------
# per-process datetime.now() can straddle a second boundary on a pod,
# splitting ONE run across two output dirs (checkpoints diverge, the Orbax
# coordinated save hangs); _sync_stamp broadcasts process 0's stamp.
from oneprot_tpu.core.config import _sync_stamp, snapshot_config  # noqa: E402
from oneprot_tpu.core.config import to_config  # noqa: E402

divergent = f"2026-08-18_00-00-0{pid}"  # each process proposes its own
agreed = _sync_stamp(divergent)
assert agreed == "2026-08-18_00-00-00", (pid, agreed)
snap_dir = os.path.join(os.path.dirname(out_npz), "shared_run")
os.makedirs(snap_dir, exist_ok=True)
snapshot_config(to_config({"seed": 1, "task_name": "mp"}), snap_dir)
if pid == 0:
    import yaml
    with open(os.path.join(snap_dir, "resolved_config.yaml")) as f:
        assert yaml.safe_load(f) == {"seed": 1, "task_name": "mp"}

np.savez(out_npz, losses=np.array(losses), losses_c=np.array(losses_c),
         **flat, **flat_c)
print(f"proc {pid}: OK losses={losses} losses_c={losses_c} ckpt=OK peft=OK "
      "rundir=OK")
