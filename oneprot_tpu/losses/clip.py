"""Sharded InfoNCE (CLIP) loss with global-batch negatives.

TPU-native replacement for the reference ClipLoss
(reference src/models/components/loss.py:49-114):

  - `torch.distributed.nn.all_gather` (differentiable gather,
    loss.py:31-33) becomes `jax.lax.all_gather` over the mesh's "data" axis —
    gradients flow through XLA collectives by construction, so the reference's
    `gather_with_grad`/local-grad-reinjection split (loss.py:35-44) collapses
    into one code path.
  - `local_loss` (loss.py:76-77, 91-93) is preserved exactly: each shard
    computes logits for its LOCAL rows against the GLOBAL column set, with
    rank-offset labels — this is also the memory-optimal layout on TPU
    (the [local_B, global_B] logits block never materializes globally).
  - runs inside the jitted train step under shard_map; with axis_name=None it
    degrades to the single-device path (loss.py:97-99).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _f32_logits(rows: jax.Array, cols: jax.Array) -> jax.Array:
    """rows @ cols.T with f32 MXU accumulation. One home for the logits
    matmul so EVERY path (single-device, sharded local/global, masked)
    scales identical f32 values: scaling a bf16-rounded product in bf16
    made single-device and sharded losses/grads of the same batch diverge
    by up to ~0.4% per logit at CLIP temperatures."""
    return jnp.matmul(rows, cols.T, preferred_element_type=jnp.float32)


def _cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross entropy with integer labels (fp32)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - picked)


def clip_loss(
    modality_features: jax.Array,  # [B_local, D] (L2-normalized, maybe scaled)
    sequence_features: jax.Array,  # [B_local, D]
    logit_scale: float | jax.Array = 1.0,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
    gather_with_grad: bool = True,  # kept for config parity; always True on TPU
) -> jax.Array:
    """Symmetric InfoNCE. Matches reference ClipLoss.forward numerics."""
    del gather_with_grad
    if axis_name is None:
        logits_per_mod = logit_scale * _f32_logits(
            modality_features, sequence_features)
        logits_per_seq = logit_scale * _f32_logits(
            sequence_features, modality_features)
        labels = jnp.arange(modality_features.shape[0])
        return 0.5 * (
            _cross_entropy(logits_per_mod, labels)
            + _cross_entropy(logits_per_seq, labels)
        )

    # --- sharded path: global-batch negatives over the data axis ---------
    rank = jax.lax.axis_index(axis_name)
    b_local = modality_features.shape[0]
    all_mod = jax.lax.all_gather(modality_features, axis_name, axis=0, tiled=True)
    all_seq = jax.lax.all_gather(sequence_features, axis_name, axis=0, tiled=True)

    if local_loss:
        # local rows x global cols; labels offset by rank*B (loss.py:76-77)
        logits_per_mod = logit_scale * _f32_logits(modality_features, all_seq)
        logits_per_seq = logit_scale * _f32_logits(sequence_features, all_mod)
        labels = jnp.arange(b_local) + b_local * rank
        # each shard's mean CE covers its own rows; psum-mean equals the
        # global-batch mean the reference's DDP grad-allreduce realizes
        loss = 0.5 * (
            _cross_entropy(logits_per_mod, labels)
            + _cross_entropy(logits_per_seq, labels)
        )
        return jax.lax.pmean(loss, axis_name)

    # full global logits on every shard (reference non-local path, loss.py:95-96)
    logits_per_mod = logit_scale * _f32_logits(all_mod, all_seq)
    logits_per_seq = logits_per_mod.T
    labels = jnp.arange(all_mod.shape[0])
    loss = 0.5 * (
        _cross_entropy(logits_per_mod, labels)
        + _cross_entropy(logits_per_seq, labels)
    )
    # identical on every shard; pmean makes the replication explicit so
    # shard_map can type the output as replicated
    return jax.lax.pmean(loss, axis_name)


def clip_loss_masked(
    modality_features: jax.Array,   # [N, D] incl. invalid pack slots
    sequence_features: jax.Array,   # [N, D]
    valid: jax.Array,               # [N] 1 = real pair, 0 = empty slot
    logit_scale: float | jax.Array = 1.0,
) -> jax.Array:
    """Symmetric InfoNCE over a PACKED batch: rows from empty pack slots
    are excluded from both the positives (zero row weight) and the
    negatives (their logit columns are masked to -inf). With all-valid
    rows this equals clip_loss exactly."""
    valid = valid.astype(jnp.float32)
    neg_mask = (1.0 - valid) * -1e9                      # [N]

    def masked_ce(logits):
        logits = logits.astype(jnp.float32) + neg_mask[None, :]
        logz = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.diagonal(logits)
        per_row = (logz - picked) * valid
        return per_row.sum() / jnp.maximum(valid.sum(), 1.0)

    logits_per_mod = logit_scale * _f32_logits(
        modality_features, sequence_features)
    logits_per_seq = logit_scale * _f32_logits(
        sequence_features, modality_features)
    return 0.5 * (masked_ce(logits_per_mod) + masked_ce(logits_per_seq))
