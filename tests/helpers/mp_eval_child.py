"""Child process for the multi-process eval test.

Usage: python mp_eval_child.py <process_id> <num_processes> <port> <out_json>

Each process owns 4 virtual CPU devices (global mesh = nproc*4 devices),
holds its own slice of the eval batch (loader-sharding convention:
rank::nproc), runs the jitted eval step over the global mesh, gathers
features with gather_features, and writes the retrieval metrics to a JSON
file. The parent asserts both processes produce metrics identical to a
single-process run of the same global batch.
"""

import json
import os
import sys

pid, nproc, port, out_json = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

repo = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

from helpers.tiny_models import build_tiny_module, tiny_ids  # noqa: E402

from oneprot_tpu.core.mesh import make_mesh  # noqa: E402
from oneprot_tpu.train.metrics import gather_features, retrieval_metrics  # noqa: E402

assert len(jax.devices()) == nproc * 4, jax.devices()
mesh = make_mesh(data=nproc * 4, model=1)
module = build_tiny_module(mesh)

GLOBAL_B = 16
seq_ids = tiny_ids(24, 0, batch=GLOBAL_B)
st_ids = tiny_ids(54, 1, batch=GLOBAL_B)
module.init({"struct_token": (seq_ids[:8], st_ids[:8])})

# loader-sharding convention: this process holds rows pid::nproc
local_seq = seq_ids[pid::nproc]
local_st = st_ids[pid::nproc]
seq_f, mod_f, loss = module.eval_step(
    module.state.params, "struct_token", local_seq, local_st)

seq_np = gather_features(seq_f)
mod_np = gather_features(mod_f)
assert seq_np.shape[0] == GLOBAL_B, seq_np.shape
metrics = retrieval_metrics(seq_np, mod_np)
metrics["loss"] = float(loss)

with open(out_json, "w") as f:
    json.dump(metrics, f)
print(f"proc {pid}: OK {metrics}")
