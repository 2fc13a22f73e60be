"""Sharded SigLIP (pairwise sigmoid) loss with a ppermute negative ring.

TPU-native replacement for the reference SigLipLoss
(reference src/models/components/loss.py:204-311): the NCCL
`batch_isend_irecv` neighbour ring with custom autograd Functions
(loss.py:116-201) becomes `jax.lax.ppermute` inside the jitted loss —
differentiable by construction (ppermute's transpose is the reverse
permutation), riding the ICI ring.

Semantics preserved exactly: positive+negative block on the local pair,
then world_size-1 negative-only blocks, one per remote shard's sequence
features (each remote shard's features are seen exactly once, matching both
the reference's `bidir` and sequential schedules — the loss value is
identical, only the comm schedule differs). `bidir=True` runs two
counter-rotating ppermute chains to use both ICI directions
(loss.py:264-295); `bidir=False` is a single rotating chain (loss.py:296-309).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _pair_loss(
    modality_features: jax.Array,
    sequence_features: jax.Array,
    logit_scale,
    logit_bias,
    negative_only: bool = False,
) -> jax.Array:
    """-sum(logsigmoid(labels * logits)) / B (reference loss.py:246-255)."""
    from oneprot_tpu.losses.clip import _f32_logits

    b = modality_features.shape[0]
    logits = logit_scale * _f32_logits(modality_features, sequence_features)
    if logit_bias is not None:
        logits = logits + logit_bias
    labels = -jnp.ones((b, sequence_features.shape[0]), jnp.float32)
    if not negative_only:
        labels = labels + 2.0 * jnp.eye(b, sequence_features.shape[0], dtype=jnp.float32)
    return -jnp.sum(jax.nn.log_sigmoid(labels * logits)) / b


def siglip_loss(
    modality_features: jax.Array,  # [B_local, D]
    sequence_features: jax.Array,  # [B_local, D]
    logit_scale: float | jax.Array = 1.0,
    logit_bias: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    bidir: bool = True,
    axis_size: Optional[int] = None,
) -> jax.Array:
    """SigLIP loss; with axis_name set, negatives ring over the data axis."""
    loss = _pair_loss(modality_features, sequence_features, logit_scale,
                      logit_bias, negative_only=False)
    if axis_name is None:
        return loss

    world = axis_size if axis_size is not None else jax.lax.axis_size(axis_name)
    if world == 1:
        return loss

    def shift(x: jax.Array, offset: int) -> jax.Array:
        perm = [(i, (i + offset) % world) for i in range(world)]
        return jax.lax.ppermute(x, axis_name, perm)

    if bidir:
        to_left = to_right = sequence_features
        num_bidir, remainder = divmod(world - 1, 2)
        for _ in range(num_bidir):
            recv_from_right = shift(to_left, -1)   # left-moving chain
            recv_from_left = shift(to_right, +1)   # right-moving chain
            for f in (recv_from_right, recv_from_left):
                loss = loss + _pair_loss(
                    modality_features, f, logit_scale, logit_bias,
                    negative_only=True)
            to_left, to_right = recv_from_right, recv_from_left
        if remainder:
            recv = shift(to_right, +1)
            loss = loss + _pair_loss(
                modality_features, recv, logit_scale, logit_bias,
                negative_only=True)
    else:
        feats = sequence_features
        for _ in range(world - 1):
            feats = shift(feats, +1)
            loss = loss + _pair_loss(
                modality_features, feats, logit_scale, logit_bias,
                negative_only=True)
    return jax.lax.pmean(loss, axis_name)


def _pair_loss_masked(
    modality_features: jax.Array,   # [N, D] incl. invalid pack slots
    sequence_features: jax.Array,   # [M, D]
    valid_rows: jax.Array,          # [N] 1 = real pair, 0 = empty slot
    valid_cols: jax.Array,          # [M]
    logit_scale,
    logit_bias,
    negative_only: bool = False,
) -> jax.Array:
    """_pair_loss over a PACKED block: empty pack slots contribute neither
    rows nor columns; normalized by the VALID row count (the reference's
    /b with b = real local pairs). All-valid == _pair_loss exactly."""
    from oneprot_tpu.losses.clip import _f32_logits

    valid_rows = valid_rows.astype(jnp.float32)
    valid_cols = valid_cols.astype(jnp.float32)
    n = modality_features.shape[0]
    logits = logit_scale * _f32_logits(modality_features, sequence_features)
    if logit_bias is not None:
        logits = logits + logit_bias
    labels = -jnp.ones((n, sequence_features.shape[0]), jnp.float32)
    if not negative_only:
        labels = labels + 2.0 * jnp.eye(n, sequence_features.shape[0],
                                        dtype=jnp.float32)
    w = valid_rows[:, None] * valid_cols[None, :]
    return (-jnp.sum(w * jax.nn.log_sigmoid(labels * logits))
            / jnp.maximum(valid_rows.sum(), 1.0))


def siglip_loss_masked(
    modality_features: jax.Array,  # [N_local, D] incl. empty pack slots
    sequence_features: jax.Array,  # [N_local, D]
    valid: jax.Array,              # [N_local] 1 = real pair
    logit_scale: float | jax.Array = 1.0,
    logit_bias: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    bidir: bool = True,
    axis_size: Optional[int] = None,
) -> jax.Array:
    """SigLIP over a PACKED batch (VERDICT r2 #3: masked SigLIP variant).

    Same ring schedule as siglip_loss; each hop ppermutes the remote
    shard's (sequence_features, valid) pair together so remote empty pack
    slots are excluded from the negative blocks too. With all slots valid
    this equals siglip_loss exactly."""
    loss = _pair_loss_masked(modality_features, sequence_features,
                             valid, valid, logit_scale, logit_bias,
                             negative_only=False)
    if axis_name is None:
        return loss

    world = axis_size if axis_size is not None else jax.lax.axis_size(axis_name)
    if world == 1:
        return loss

    def shift(pair, offset: int):
        perm = [(i, (i + offset) % world) for i in range(world)]
        return tuple(jax.lax.ppermute(x, axis_name, perm) for x in pair)

    def neg(pair):
        f, v = pair
        return _pair_loss_masked(modality_features, f, valid, v,
                                 logit_scale, logit_bias,
                                 negative_only=True)

    if bidir:
        to_left = to_right = (sequence_features, valid)
        num_bidir, remainder = divmod(world - 1, 2)
        for _ in range(num_bidir):
            recv_from_right = shift(to_left, -1)
            recv_from_left = shift(to_right, +1)
            loss = loss + neg(recv_from_right) + neg(recv_from_left)
            to_left, to_right = recv_from_right, recv_from_left
        if remainder:
            loss = loss + neg(shift(to_right, +1))
    else:
        pair = (sequence_features, valid)
        for _ in range(world - 1):
            pair = shift(pair, +1)
            loss = loss + neg(pair)
    return jax.lax.pmean(loss, axis_name)
