"""Multirun sweep expansion (reference tests/test_sweeps.py equivalent)."""

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
