"""Tiny model builders shared by parallel / multi-process tests."""

from __future__ import annotations

import numpy as np


def patch_tiny_esm2():
    """Shrink the esm2_t6_8M config so tests are fast (idempotent)."""
    from oneprot_tpu.models import esm2

    esm2.ESM2_SIZES["esm2_t6_8M"] = esm2.Esm2Config(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)


def build_tiny_module(mesh, loss_fn: str = "CLIP", frozen_hub: bool = False):
    patch_tiny_esm2()
    from oneprot_tpu.models.encoders import (
        create_sequence_encoder,
        create_struct_token_encoder,
    )
    from oneprot_tpu.train.module import OneProtModule
    from oneprot_tpu.train.optim import adam

    seq = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=32,
        proj_type="mlp", frozen=frozen_hub, dtype="float32")
    st = create_struct_token_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=32,
        dtype="float32")
    return OneProtModule(
        components={"sequence": seq, "struct_token": st},
        optimizer=lambda: adam(1e-3), loss_fn=loss_fn,
        mesh=mesh, seed=0, frozen_param_dtype=None)


def tiny_ids(vhi: int, seed: int, batch: int = 8, length: int = 16):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, vhi, size=(batch, length)).astype(np.int32)
    ids[:, 0] = 0
    ids[:, -1] = 2
    return ids
