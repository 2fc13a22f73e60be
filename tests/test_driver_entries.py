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

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code=None, argv=None, env_extra=None, timeout=600):
    env = dict(os.environ)
    env.pop("_ONEPROT_DRYRUN_CHILD", None)
    env.update(env_extra or {})
    cmd = [sys.executable] + (["-c", code] if code else argv)
    return subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)


def test_dryrun_multichip_two_devices(capsys):
    # runs INLINE on the suite's 8-device CPU backend (the driver's child
    # -process path is exercised by the driver itself every round; a child
    # here costs ~60s of jax import + cache loads on the 1-vCPU host)
    import __graft_entry__ as g

    g.dryrun_multichip(2)
    assert "OK" in capsys.readouterr().out


@pytest.mark.tier0  # quick tier: the driver entry must always compile
def test_entry_compiles_on_cpu():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    loss = float(jax.jit(fn)(*args))
    assert loss == loss, "nan loss"


def test_bench_cli_smoke_default_mode():
    """The DRIVER's actual code path: DEFAULT BENCH_MODE (packed) + cached
    extras on tiny models/shapes, CPU platform. Round 2's driver bench
    timed out precisely because only BENCH_MODE=fixed was smoke-tested
    (VERDICT r2 weak #1); this pins the default path end-to-end and the
    JSON-on-stdout contract (the headline must be emitted even if later
    extras were cut)."""
    import time

    t0 = time.time()
    proc = _run(
        argv=["bench.py"],
        env_extra={
            "BENCH_PLATFORM": "cpu",
            "BENCH_HUB": "esm2_tiny",
            "BENCH_TOWER": "esm2_tiny",
            "BENCH_TOKENS": "512",
            "BENCH_PACK_ROWS": "256,512",
            "BENCH_STEPS": "2",
            "BENCH_QUANT": "none",
            "BENCH_TIMED_REPS": "1",
            # 2 emulated devices: still multi-device (catches AOT-vs-init
            # sharding mismatches — one bit us here) but 1-vCPU-affordable;
            # the suite's default 8 makes each tiny step cost ~7s
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        },
        timeout=600,
    )
    wall = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-3000:]
    # stdout contract: EVERY line is a valid headline JSON object (the
    # provisional line prints first, the final aggregate last — first-line
    # and last-line parsers must both see an honest number)
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) >= 2, proc.stdout
    for line in lines:
        out = json.loads(line)
        for key in ("metric", "value", "unit", "vs_baseline"):
            assert key in out, out
        assert out["value"] > 0
        assert "packed" in out["metric"]
    assert json.loads(lines[0]).get("provisional") is True, lines[0]
    assert "provisional" not in json.loads(lines[-1]), lines[-1]
    # the headline must be emitted BEFORE the cached extras in the stderr
    # timeline so a driver timeout there still leaves the number
    assert "headline JSON emitted" in proc.stderr
    idx_json = proc.stderr.index("headline JSON emitted")
    idx_cached = proc.stderr.find("cached steady-state")
    assert idx_cached == -1 or idx_json < idx_cached, proc.stderr[-2000:]
    assert wall < 540, f"default bench path took {wall:.0f}s on tiny shapes"


@pytest.mark.slow
def test_bench_cli_smoke():
    """bench.py end-to-end in FIXED mode on the real HF 8M towers, CPU
    platform; the final stdout line must be the driver's JSON contract.
    Slow-marked (487s on the 1-vCPU host: 8M-tower compiles across
    buckets x step variants on an 8-device emulated mesh): the driver's
    actual code path — DEFAULT packed mode — is pinned by the fast
    test_bench_cli_smoke_default_mode above; this covers the non-default
    fixed path in CI / `make test`."""
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


def test_bench_cli_int8_primary_with_bf16_secondary():
    """The PRODUCTION bench config's output contract (VERDICT r4 weak #3 +
    next-step 1): with the default BENCH_QUANT=int8, the primary headline
    must say so honestly ("int8 hub GEMMs", never plain "bf16"), the
    bf16-only SECONDARY line must print via the early Bf16Prep pipeline,
    and the primary must be re-printed LAST for last-line parsers."""
    proc = _run(
        argv=["bench.py"],
        env_extra={
            "BENCH_PLATFORM": "cpu",
            "BENCH_HUB": "esm2_tiny",
            "BENCH_TOWER": "esm2_tiny",
            "BENCH_TOKENS": "512",
            "BENCH_PACK_ROWS": "256,512",
            "BENCH_STEPS": "2",
            "BENCH_QUANT": "int8",
            "BENCH_TIMED_REPS": "1",
            "BENCH_CACHED": "0",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        },
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines()
             if l.strip()]
    assert len(lines) >= 3, proc.stdout  # provisional, final, secondary, re-print
    primaries = [l for l in lines if "SECONDARY" not in l["metric"]]
    secondaries = [l for l in lines if "SECONDARY" in l["metric"]]
    for p in primaries:
        assert "int8 hub GEMMs" in p["metric"], p["metric"]
        assert "bf16 elsewhere" in p["metric"], p["metric"]
    assert secondaries, proc.stdout
    assert all("bf16-only" in s["metric"] for s in secondaries)
    # the anchor-only default leaves the longer group filled in conservatively
    assert "conservative fill-in" in secondaries[0]["metric"]
    # primary re-printed last
    assert "SECONDARY" not in lines[-1]["metric"]
    assert lines[-1] == [p for p in primaries if "provisional" not in p][-1]
    assert "bf16-early: anchor" in proc.stderr, proc.stderr[-2000:]


@pytest.mark.tier0
def test_bench_secondary_aggregation_math(capsys):
    """_print_secondary is the single home of the SECONDARY headline's
    aggregation (share-weighted harmonic mean) and conservative fill-in
    (anchor rate scaled linearly in row length x 0.75). Pin both so a
    refactor cannot silently inflate the artifact-of-record's number."""
    import json as _json

    import bench

    groups = [(512, 0.7), (1024, 0.3)]
    # all groups measured: plain share-weighted harmonic mean, no suffix
    assert bench._print_secondary({512: 200.0, 1024: 100.0}, groups,
                                  base=10.0, n_chips=1)
    line1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    expect = (0.7 + 0.3) / (0.7 / 200.0 + 0.3 / 100.0)
    assert abs(line1["value"] - round(expect, 2)) < 1e-9
    assert "conservative fill-in" not in line1["metric"]
    assert line1["vs_baseline"] == round(expect / 10.0, 2)

    # anchor-only: the unmeasured L=1024 group fills in at
    # anchor * (512/1024) * 0.75 and the metric string says so
    assert bench._print_secondary({512: 200.0}, groups,
                                  base=10.0, n_chips=1)
    line2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    fill = 200.0 * (512 / 1024) * 0.75
    expect2 = (0.7 + 0.3) / (0.7 / 200.0 + 0.3 / fill)
    assert abs(line2["value"] - round(expect2, 2)) < 1e-9
    assert "conservative fill-in" in line2["metric"]
    assert line2["value"] < line1["value"]  # fill-in must be conservative

    # nothing measured: no line printed
    assert not bench._print_secondary({}, groups, base=10.0, n_chips=1)
    assert capsys.readouterr().out.strip() == ""
