"""CTC head: projection + log-softmax + loss.

Parity target: `wenet/transformer/ctc.py` — Dense(vocab) on encoder output,
log_softmax activation surface (`ctc_activation`), CTCLoss(sum)/batch with
optional focal-CTC reweighting `loss = alpha * (1 - p)^gamma * loss`
(`ctc.py:56-99`).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


class CTCHead(nn.Module):
    vocab_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, enc_out, *, deterministic: bool = True):
        y = nn.Dropout(self.dropout_rate)(enc_out,
                                          deterministic=deterministic)
        return nn.Dense(self.vocab_size, name="ctc_lo")(y)

    def log_probs(self, enc_out):
        """`ctc_activation` equivalent: log-softmax over vocab."""
        return jax.nn.log_softmax(self(enc_out), axis=-1)


def ctc_loss(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank_id: int = 0,
    use_focal_loss: bool = False,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> jax.Array:
    """Mean-over-batch CTC loss (reference: sum reduction / batch size).

    logits: (B, T, V) unnormalized; labels: (B, U) padded with anything
    beyond label_lengths.
    """
    B, T, _ = logits.shape
    U = labels.shape[1]
    logit_pad = (~mask_utils.make_pad_mask(logit_lengths, T)).astype(
        jnp.float32
    )
    label_pad = (~mask_utils.make_pad_mask(label_lengths, U)).astype(
        jnp.float32
    )
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32), logit_pad, labels, label_pad,
        blank_id=blank_id,
    )
    if use_focal_loss:
        p = jnp.exp(-per_seq)
        per_seq = focal_alpha * (1.0 - p) ** focal_gamma * per_seq
    return jnp.mean(per_seq)
