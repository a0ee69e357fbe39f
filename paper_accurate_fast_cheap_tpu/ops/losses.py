"""Sequence losses: label-smoothing KL (attention decoder) + helpers.

Parity target: `wenet/transformer/label_smoothing_loss.py` — KLDiv against a
(1 - eps, eps/(V-1)) smoothed distribution, ignore_id=-1 positions dropped,
normalized by batch (default) or by token count (length_normalized_loss).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.utils.common import IGNORE_ID


def label_smoothing_loss(
    logits: jax.Array,
    targets: jax.Array,
    smoothing: float = 0.1,
    ignore_id: int = IGNORE_ID,
    normalize_length: bool = False,
) -> jax.Array:
    """logits (B, U, V), targets (B, U) with ignore_id padding."""
    B, U, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = targets != ignore_id
    tgt = jnp.where(valid, targets, 0)
    confidence = 1.0 - smoothing
    low = smoothing / (V - 1)
    # KL(true || pred) with the constant entropy term of the smoothed
    # distribution included (matches torch.nn.KLDivLoss reduction='none'
    # summed over vocab as used by the reference).
    true_dist = jnp.full((V,), low, jnp.float32)
    kl_const = jnp.sum(
        jnp.where(true_dist > 0, true_dist * jnp.log(true_dist), 0.0)
    ) + (confidence * jnp.log(confidence) - low * jnp.log(low)
         if confidence > 0 else 0.0)
    tgt_logp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    sum_logp = jnp.sum(logp, axis=-1)
    cross = -(confidence * tgt_logp + low * (sum_logp - tgt_logp))
    kl = cross + kl_const
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.where(
        normalize_length, jnp.maximum(jnp.sum(valid), 1), B
    ).astype(jnp.float32)
    return jnp.sum(kl) / denom
