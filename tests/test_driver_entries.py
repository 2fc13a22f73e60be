"""Smoke tests for the driver-facing entry points.

The build driver compile-checks `__graft_entry__.entry()` single-chip, runs
`__graft_entry__.dryrun_multichip(N)` on a virtual CPU mesh, and runs
`bench.py` for the headline metric every round — bitrot in any of them is a
silent red light, so the hermetic suite exercises all three on tiny shapes.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code=None, argv=None, env_extra=None, timeout=600):
    env = dict(os.environ)
    env.pop("_ONEPROT_DRYRUN_CHILD", None)
    env.update(env_extra or {})
    cmd = [sys.executable] + (["-c", code] if code else argv)
    return subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)


def test_dryrun_multichip_two_devices():
    proc = _run(code="import __graft_entry__ as g; g.dryrun_multichip(2)")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout


def test_entry_compiles_on_cpu():
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "loss = float(jax.jit(fn)(*args))\n"
        "assert loss == loss, 'nan loss'\n"
        "print('ENTRY_OK', loss)\n"
    )
    proc = _run(code=code, env_extra={"JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ENTRY_OK" in proc.stdout


def test_bench_cli_smoke():
    """bench.py end-to-end on tiny models/shapes, CPU platform; the final
    stdout line must be the driver's JSON contract."""
    proc = _run(
        argv=["bench.py"],
        env_extra={
            "BENCH_PLATFORM": "cpu",
            "BENCH_MODE": "fixed",
            "BENCH_HUB": "facebook/esm2_t6_8M_UR50D",
            "BENCH_TOWER": "facebook/esm2_t6_8M_UR50D",
            "BENCH_SEQ_LEN": "128",
            "BENCH_BATCH": "2",
            "BENCH_STEPS": "2",
            "BENCH_CACHED": "1",
        },
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in out, out
    assert out["value"] > 0
