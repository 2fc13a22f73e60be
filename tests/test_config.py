"""Config system tests: composition, interpolation, overrides, instantiation.

Mirrors the reference's config-composition tests (reference
tests/test_configs.py:6-29) against the first-party hydra-compatible engine.
"""

import os

import pytest

from oneprot_tpu.core.config import (
    ConfigStore,
    apply_override,
    instantiate,
    load_config,
    merge,
    resolve,
    to_config,
)


# whole-file tier0: part of the ~2-minute smoke subset for the inner dev
# loop (`make test-quick`, VERDICT r4 next-step 7)
pytestmark = pytest.mark.tier0


CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_merge_deep():
    a = to_config({"x": {"y": 1, "z": 2}, "k": 3})
    b = {"x": {"y": 10}, "new": 4}
    out = merge(a, b)
    assert out.x.y == 10 and out.x.z == 2 and out.k == 3 and out.new == 4


def test_interpolation_absolute_and_relative():
    cfg = to_config({
        "model": {
            "sequence": {"output_dim": 1024},
            "text": {"output_dim": "${..sequence.output_dim}"},
        },
        "paths": {"root": "/tmp/x", "log": "${paths.root}/logs"},
    })
    r = resolve(cfg)
    assert r.model.text.output_dim == 1024
    assert r.paths.log == "/tmp/x/logs"


def test_interpolation_env(monkeypatch):
    monkeypatch.setenv("ONEPROT_TEST_VAR", "hello")
    cfg = to_config({"a": "${oc.env:ONEPROT_TEST_VAR}", "b": "${oc.env:MISSING_VAR,fallback}"})
    r = resolve(cfg)
    assert r.a == "hello" and r.b == "fallback"


def test_apply_override():
    cfg = to_config({"a": {"b": 1}})
    apply_override(cfg, "a.b=5")
    assert cfg.a.b == 5
    apply_override(cfg, "+a.c=hi")
    assert cfg.a.c == "hi"
    with pytest.raises(KeyError):
        apply_override(cfg, "a.missing=1")
    apply_override(cfg, "~a.c")
    assert "c" not in cfg.a


def test_compose_train_config():
    cfg = load_config(CONFIG_DIR, "train")
    # reference group surface (configs/train.yaml:3-12)
    for group in ("data", "model", "trainer", "callbacks", "paths", "extras"):
        assert group in cfg, f"missing group {group}"
    assert cfg.task_name == "train"
    assert cfg.seed == 1881  # reference configs/train.yaml:32
    assert "sequence" in cfg.model.components


def test_compose_group_override_and_value_override():
    cfg = load_config(CONFIG_DIR, "train", overrides=["trainer=cpu", "seed=7"])
    assert cfg.seed == 7
    assert cfg.trainer.accelerator == "cpu"


def test_output_dim_interpolation_ties_to_hub():
    cfg = load_config(CONFIG_DIR, "train", overrides=["model.components.sequence.output_dim=128"])
    r = resolve(cfg, resolvers={"hydra": lambda a: "/tmp/out"})
    for comp in ("struct_token", "text"):
        if comp in r.model.components:
            assert r.model.components[comp]["output_dim"] == 128


def test_experiment_overlay():
    cfg = load_config(CONFIG_DIR, "train", overrides=["experiment=debug_struct_token"])
    # the debug experiment trims to the minimum end-to-end slice
    assert "struct_token" in cfg.data.modalities
    assert cfg.model.components.sequence.model_name_or_path.endswith("esm2_t6_8M_UR50D")


def test_instantiate_with_target():
    out = instantiate({"_target_": "collections.OrderedDict", "a": 1})
    assert dict(out) == {"a": 1}
    p = instantiate({"_target_": "operator.add", "_partial_": True})
    assert p(2, 3) == 5


def test_reference_target_alias():
    import oneprot_tpu.models.encoders  # registers aliases  # noqa: F401

    enc = instantiate({
        "_target_": "src.models.components.struct_token_encoder.StructTokenEncoder",
        "model_name_or_path": "facebook/esm2_t6_8M_UR50D",
        "output_dim": 32,
    })
    assert enc.output_dim == 32
