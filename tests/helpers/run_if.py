"""Capability-gated test markers (reference tests/helpers/run_if.py shape).

Usage:
    @requires_native
    def test_fast_path(): ...
"""

import pytest


def _native_available() -> bool:
    try:
        from oneprot_tpu import native

        return native.available()
    except Exception:
        return False


def _tpu_available() -> bool:
    try:
        import jax

        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


def _has(module: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(module) is not None


requires_native = pytest.mark.skipif(
    not _native_available(), reason="native host library unavailable")
requires_tpu = pytest.mark.skipif(
    not _tpu_available(), reason="no TPU device")
requires_lmdb = pytest.mark.skipif(not _has("lmdb"), reason="lmdb not installed")
requires_xgboost = pytest.mark.skipif(
    not _has("xgboost"), reason="xgboost not installed")
requires_wandb = pytest.mark.skipif(not _has("wandb"), reason="wandb not installed")
requires_transformers = pytest.mark.skipif(
    not _has("transformers"), reason="transformers not installed")
