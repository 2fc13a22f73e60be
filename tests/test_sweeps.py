"""Multirun sweep expansion (reference tests/test_sweeps.py equivalent)."""

import pytest

from train import expand_multirun


def test_expand_multirun_grid():
    combos = expand_multirun(["seed=1,2", "model.optimizer.lr=0.1,0.01",
                              "trainer.max_epochs=1"])
    assert len(combos) == 4
    assert ["seed=1", "model.optimizer.lr=0.1", "trainer.max_epochs=1"] in combos
    assert ["seed=2", "model.optimizer.lr=0.01", "trainer.max_epochs=1"] in combos


def test_expand_multirun_lists_not_split():
    combos = expand_multirun(["data.buckets=[64,128]", "seed=1"])
    assert combos == [["data.buckets=[64,128]", "seed=1"]]


# ---------------------------------------------------------------------------
# Search sweepers (reference optuna surface, tests/test_sweeps.py:59-70)
# ---------------------------------------------------------------------------


def test_parse_space_syntax():
    from oneprot_tpu.core.sweep import parse_space

    sp = parse_space("interval(0.001, 0.1)")
    assert sp.kind == "float" and not sp.log and sp.low == 0.001
    sp = parse_space("tag(log, interval(0.0001, 0.1))")
    assert sp.log
    sp = parse_space("int(interval(2, 8))")
    assert sp.kind == "int"
    sp = parse_space("choice(relu, gelu)")
    assert sp.choices == ["relu", "gelu"]
    sp = parse_space("range(1, 7, 2)")
    assert sp.choices == [1, 3, 5]
    sp = parse_space("16,32,64")
    assert sp.choices == [16, 32, 64]


def test_random_sweeper_respects_bounds_and_trials():
    from oneprot_tpu.core.sweep import RandomSweeper

    sw = RandomSweeper({"lr": "tag(log, interval(0.0001, 0.1))",
                        "depth": "int(interval(2, 8))"}, n_trials=6, seed=0)
    trials = []
    while True:
        t = sw.ask()
        if t is None:
            break
        trials.append(t)
        sw.tell(t, 1.0)
    assert len(trials) == 6
    for t in trials:
        assert 0.0001 <= t["lr"] <= 0.1
        assert 2 <= t["depth"] <= 8 and isinstance(t["depth"], int)


def test_tpe_sweeper_beats_random_on_quadratic():
    """TPE concentrates near the optimum of a known objective."""
    from oneprot_tpu.core.sweep import TPESweeper

    def objective(p):
        return (p["x"] - 0.3) ** 2 + (p["y"] - 7) ** 2 / 100.0

    sw = TPESweeper({"x": "interval(0, 1)", "y": "int(interval(0, 20))"},
                    n_trials=40, seed=1, n_startup_trials=8)
    best = float("inf")
    while True:
        t = sw.ask()
        if t is None:
            break
        v = objective(t)
        sw.tell(t, v)
        best = min(best, v)
    assert best < 0.02, f"TPE failed to approach optimum: best={best}"


def test_grid_sweeper_product():
    from oneprot_tpu.core.sweep import GridSweeper

    sw = GridSweeper({"a": "1,2", "b": "choice(x, y, z)"})
    trials = []
    while True:
        t = sw.ask()
        if t is None:
            break
        trials.append(t)
    assert len(trials) == 6


def test_extract_sweeper_overrides():
    from train import extract_sweeper

    name, options, params, rest = extract_sweeper([
        "experiment=debug_struct_token",
        "hydra/sweeper=optuna",
        "hydra.sweeper.n_trials=4",
        "hydra.sweeper.params.model.optimizer.lr=tag(log, interval(0.0001, 0.01))",
        "trainer.max_epochs=1",
    ])
    assert name == "optuna"
    assert options == {"n_trials": "4"}
    assert list(params) == ["model.optimizer.lr"]
    assert rest == ["experiment=debug_struct_token", "trainer.max_epochs=1"]


@pytest.mark.slow
def test_search_sweep_end_to_end(tmp_path):
    """4-trial TPE search through the real train() on the debug slice
    (reference tests/test_sweeps.py:59-70 launches the optuna sweeper)."""
    import train as train_mod

    metrics = train_mod.main([
        "-m",
        "experiment=debug_struct_token",
        "hydra/sweeper=optuna",
        "hydra.sweeper.n_trials=3",
        "hydra.sweeper.n_startup_trials=2",
        "hydra.sweeper.params.model.optimizer.lr=tag(log, interval(0.0001, 0.01))",
        "trainer.max_epochs=1",
        f"paths.log_dir={tmp_path}",
    ])
    assert len(metrics) == 3
    for m in metrics:
        assert "val/loss" in m and "search/model.optimizer.lr" in m
