"""True multi-process eval test (VERDICT r1 #4).

Launches 2 subprocesses x 4 virtual CPU devices with
jax.distributed.initialize (the reference's ddp_sim analogue at the process
level, reference configs/trainer/ddp_sim.yaml:4-7) and asserts both
processes compute retrieval metrics identical to a single-process run over
the same global batch — proving the cross-process feature gather
(reference retrieval_metric.py:68-69 cat-reduce) is correct.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_eval_matches_single(tmp_path):
    port = _free_port()
    child = os.path.join(HERE, "helpers", "mp_eval_child.py")
    procs = []
    outs = []
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    for pid in range(2):
        out = str(tmp_path / f"metrics_{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, child, str(pid), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    with open(outs[0]) as f:
        m0 = json.load(f)
    with open(outs[1]) as f:
        m1 = json.load(f)
    assert m0.keys() == m1.keys()
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5,
                                   err_msg=f"procs disagree on {k}")

    # single-process oracle over the same global batch (loader-sharding
    # row order: rank::nproc interleave — metrics are invariant to the
    # joint permutation of (seq, mod) rows)
    from tests.helpers.tiny_models import build_tiny_module, tiny_ids

    from oneprot_tpu.train.metrics import retrieval_metrics

    module = build_tiny_module(mesh=None)
    seq_ids = tiny_ids(24, 0, batch=16)
    st_ids = tiny_ids(54, 1, batch=16)
    module.init({"struct_token": (seq_ids[:8], st_ids[:8])})
    seq_f, mod_f, loss = module.eval_step(
        module.state.params, "struct_token", seq_ids, st_ids)
    oracle = retrieval_metrics(np.asarray(seq_f), np.asarray(mod_f))
    for k, v in oracle.items():
        np.testing.assert_allclose(
            m0[k], v, rtol=1e-4,
            err_msg=f"2-process metrics != single-process for {k}")
    np.testing.assert_allclose(m0["loss"], float(loss), rtol=1e-4)
