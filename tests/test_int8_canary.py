"""int8 runtime quality canary (VERDICT r3 #8).

The int8 hub's offline quality evidence comes from random (Gaussian)
towers; REAL trained weights have heavy tails and outlier channels that
can quantize much worse. The canary compares bf16-vs-int8 pooled
embeddings on every pretrained int8 load and warns below a cosine
threshold. These tests build synthetic "trained-like" checkpoints —
non-Gaussian, with intra-channel outliers — and assert the canary runs,
passes on a benign checkpoint, and WARNS on one engineered to quantize
badly (per-channel absmax scales collapse the small entries of an
outlier-bearing channel to zero)."""

import logging
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from oneprot_tpu.models import esm2 as esm2_lib  # noqa: E402
from oneprot_tpu.models.encoders import create_sequence_encoder  # noqa: E402
from oneprot_tpu.train.module import OneProtModule  # noqa: E402
from oneprot_tpu.train.optim import adam  # noqa: E402


def _make_hf_dir(tmp_path, name, outliers: bool):
    cfg = transformers.EsmConfig(
        vocab_size=33, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, pad_token_id=1,
        mask_token_id=32, position_embedding_type="rotary",
        token_dropout=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, emb_layer_norm_before=False,
        layer_norm_eps=1e-5)
    torch.manual_seed(0)
    model = transformers.EsmModel(cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        for pname, p in model.named_parameters():
            if p.ndim != 2 or "embed" in pname:
                continue
            # trained-like: heavy-tailed (Laplace-ish) rather than Gaussian
            lap = torch.distributions.Laplace(0.0, 0.02).sample(p.shape)
            p.copy_(lap)
            if outliers:
                # intra-channel outliers: a handful of entries ~10^4x the
                # channel's typical magnitude force the per-channel absmax
                # scale so high that the entire bulk quantizes to 0 — the
                # canary must catch a checkpoint this pathological
                p.mul_(1e-3 / 0.02)
                flat = p.view(-1)
                idx = torch.randperm(flat.numel())[:max(4, flat.numel() // 256)]
                flat[idx] = 10.0 * torch.sign(torch.randn(len(idx)))
    d = tmp_path / name
    model.save_pretrained(str(d))
    link = tmp_path / f"esm2_t6_8M_{name}"
    if not link.exists():
        os.symlink(str(d), str(link))
    return str(link)


@pytest.fixture()
def tiny_size(monkeypatch):
    monkeypatch.setitem(
        esm2_lib.ESM2_SIZES, "esm2_t6_8M",
        esm2_lib.Esm2Config(hidden_size=32, num_layers=2, num_heads=2,
                            intermediate_size=64))


def _init_int8_module(hf_dir):
    comps = {"sequence": create_sequence_encoder(
        model_name_or_path=hf_dir, output_dim=16, proj_type="linear",
        frozen=True, quantize="int8", dtype="float32")}
    module = OneProtModule(components=comps, optimizer=lambda: adam(1e-3))
    ids = np.full((2, 16), 1, np.int32)
    ids[:, 0] = 0
    module.init({"sequence": (ids, ids)})
    return module


def test_canary_runs_and_passes_on_benign_weights(tmp_path, tiny_size,
                                                  caplog):
    hf = _make_hf_dir(tmp_path, "benign", outliers=False)
    with caplog.at_level(logging.INFO, logger="int8_canary"):
        _init_int8_module(hf)
    msgs = [r for r in caplog.records if "int8 canary" in r.getMessage()]
    assert msgs, "canary did not run on a pretrained int8 load"
    assert not any(r.levelno >= logging.WARNING for r in msgs), (
        "canary warned on a benign checkpoint: "
        + msgs[0].getMessage())
    assert "cosine" in msgs[0].getMessage()


def test_canary_warns_on_outlier_channels(tmp_path, tiny_size, caplog):
    hf = _make_hf_dir(tmp_path, "outlier", outliers=True)
    with caplog.at_level(logging.INFO, logger="int8_canary"):
        _init_int8_module(hf)
    warns = [r for r in caplog.records
             if "int8 canary" in r.getMessage()
             and r.levelno >= logging.WARNING]
    assert warns, "canary did not warn on outlier-channel weights"
    assert "quantize=null" in warns[0].getMessage()


def test_canary_disabled_by_env(tmp_path, tiny_size, caplog, monkeypatch):
    monkeypatch.setenv("ONEPROT_INT8_CANARY", "0")
    hf = _make_hf_dir(tmp_path, "off", outliers=False)
    with caplog.at_level(logging.INFO, logger="int8_canary"):
        _init_int8_module(hf)
    assert not [r for r in caplog.records
                if "int8 canary" in r.getMessage()]


def _make_hf_dir_act_outlier(tmp_path, scale=20.0):
    """Checkpoint whose WEIGHTS quantize fine per-channel but which
    injects a large constant into ONE hidden channel of the residual
    stream (layer-0 output-dense bias): every later layer's per-token
    activation abs-max quantization then crushes the other channels —
    the classic emergent-outlier-channel failure (length- and
    distribution-sensitive, VERDICT r4 #6)."""
    cfg = transformers.EsmConfig(
        vocab_size=33, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, pad_token_id=1,
        mask_token_id=32, position_embedding_type="rotary",
        token_dropout=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, emb_layer_norm_before=False,
        layer_norm_eps=1e-5)
    torch.manual_seed(0)
    model = transformers.EsmModel(cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        for pname, p in model.named_parameters():
            if p.ndim != 2 or "embed" in pname:
                continue
            p.copy_(torch.distributions.Laplace(0.0, 0.02).sample(p.shape))
        model.encoder.layer[0].output.dense.bias[7] = scale
    d = tmp_path / "act_outlier"
    model.save_pretrained(str(d))
    link = tmp_path / "esm2_t6_8M_act_outlier"
    os.symlink(str(d), str(link))
    return str(link)


def test_canary_resolves_activation_outlier_channel(tmp_path, tiny_size,
                                                    caplog):
    """Evidence for VERDICT r4 #6's activation-outlier concern, measured
    rather than assumed: a 20x residual-stream outlier channel reads RAW
    cosine 1.0000 (the shared component dominates both embedding sets and
    masks everything else), so the canary compares CENTERED embeddings.
    Measured on this checkpoint: centered cosine min 0.9983, cross-R@1
    1.0 — i.e. the w8a8 path genuinely tolerates this pattern (per-token
    activation scales absorb the outlier), and the canary now reports the
    metric that would catch it if it didn't. The canary must run its
    retrieval leg and NOT warn here; the wt-outlier test above pins the
    warning path."""
    hf = _make_hf_dir_act_outlier(tmp_path)
    with caplog.at_level(logging.INFO, logger="int8_canary"):
        _init_int8_module(hf)
    msgs = [r for r in caplog.records if "int8 canary" in r.getMessage()]
    assert msgs, "canary did not run"
    assert "R@1" in msgs[0].getMessage()  # retrieval leg present
    assert "centered cosine" in msgs[0].getMessage()
    assert not [r for r in msgs if r.levelno >= logging.WARNING], (
        "int8 path regressed on activation-outlier channels: "
        + msgs[0].getMessage())
