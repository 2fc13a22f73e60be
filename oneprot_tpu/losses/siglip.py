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
    b = modality_features.shape[0]
    logits = logit_scale * (
        modality_features @ sequence_features.T
    ).astype(jnp.float32)
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
