"""CTL: contrastive dual-encoder training.

Parity target: `wenet/ctl_model/` (~535 LoC): an ASR model trained with an
additional InfoNCE contrastive term between two encoder views (online +
augmented) of the same utterance, encouraging representation consistency.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models.asr_model import ASRModel
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


def info_nce(a: jax.Array, b: jax.Array, valid: jax.Array,
             temperature: float = 0.1):
    """Frame-level InfoNCE between two aligned encoder views (B, T, D)."""
    B, T, D = a.shape
    an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    # per utterance: frames of a vs frames of b
    sim = jnp.einsum("btd,bsd->bts", an, bn) / temperature
    sim = jnp.where(valid[:, None, :], sim, -1e9)
    logp = jax.nn.log_softmax(sim, axis=-1)
    diag = jnp.diagonal(logp, axis1=1, axis2=2)     # (B, T)
    loss = -jnp.where(valid, diag, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


class CTLModel(nn.Module):
    """ASRModel + frame-contrastive loss between two feature views."""

    asr_conf: Any                 # kwargs for ASRModel
    ctl_weight: float = 1.0
    temperature: float = 0.1

    def setup(self):
        self.asr = ASRModel(**dict(self.asr_conf), name="asr")

    def __call__(self, feats, feat_lens, feats_aug, labels, label_lens,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        out = self.asr(feats, feat_lens, labels, label_lens,
                       deterministic=deterministic)
        enc_a, lens_a = self.asr.encoder(feats, feat_lens,
                                         deterministic=deterministic)
        enc_b, _ = self.asr.encoder(feats_aug, feat_lens,
                                    deterministic=deterministic)
        valid = mask_utils.make_pad_mask(lens_a, enc_a.shape[1])
        loss_ctl = info_nce(enc_a, enc_b, valid, self.temperature)
        loss = out["loss"] + self.ctl_weight * loss_ctl
        return dict(out, loss=loss, loss_ctl=loss_ctl)
