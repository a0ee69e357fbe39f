"""CTL: dual-view (full-context + chunk-masked) contrastive training.

Parity target: `wenet/ctl_model/asr_model_ctl.py` (~535 LoC with the dual
encoders): the SAME utterance runs through the shared encoder twice — once
full-context, once with streaming chunk masking — each view pays the full
CTC/AED loss, and an InfoNCE term (in-utterance sampled negatives, cosine
similarity / logit_temp, `:220-300`) pulls the chunked representation
toward the full-context one:

    loss = loss_full + loss_chunk + ctl_weight * CTL(chunk, full, negs)

Deviation (shape-static for jit): the reference draws `n_negatives`
uniform random frame indices per anchor with a +1 skip trick
(`sample_negatives`, `:220-256`); we draw modular random offsets, same
distribution up to the self-exclusion detail, with neg==pos positions
masked to -inf in the logits exactly as `compute_preds` (`:258-275`).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models.asr_model import ASRModel
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


class CTLModel(nn.Module):
    """ASRModel trained on two views + frame-contrastive consistency."""

    asr_conf: Any                 # kwargs for ASRModel
    ctl_weight: float = 1.0
    n_negatives: int = 50
    logit_temp: float = 0.1
    chunk_size: int = 16          # streaming-view chunk (encoder frames)
    temperature: float = 0.1      # alias kept for config compat

    def setup(self):
        self.asr = ASRModel(**dict(self.asr_conf), name="asr")

    def _view_loss(self, enc, enc_lens, labels, label_lens, deterministic):
        """CTC + AED loss for one encoder view (ASRModel `:131-211`)."""
        from paper_accurate_fast_cheap_tpu.models import (
            ctc_head as ctc_mod,
        )

        m = self.asr
        loss_ctc = jnp.asarray(0.0)
        if m.ctc_weight > 0.0:
            logits = m.ctc(enc, deterministic=deterministic)
            loss_ctc = ctc_mod.ctc_loss(logits, enc_lens, labels,
                                        label_lens)
        loss_att = jnp.asarray(0.0)
        acc = jnp.asarray(0.0)
        if m.decoder is not None and m.ctc_weight < 1.0:
            loss_att, acc = m._att_loss(enc, enc_lens, labels, label_lens,
                                        deterministic)
        return m.ctc_weight * loss_ctc + (1.0 - m.ctc_weight) * loss_att, \
            acc

    def _ctl(self, x, y, valid, rng):
        """InfoNCE with in-utterance sampled negatives
        (`asr_model_ctl.py:220-300`)."""
        B, T, D = x.shape
        offs = jax.random.randint(rng, (B, T, self.n_negatives), 1,
                                  jnp.maximum(T - 1, 2))
        idx = (jnp.arange(T)[None, :, None] + offs) % jnp.maximum(T, 1)
        negs = y[jnp.arange(B)[:, None, None], idx]      # (B, T, K, D)

        def cos(a, b):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
            return jnp.sum(a * b, axis=-1)

        pos = cos(x, y) / self.logit_temp                # (B, T)
        neg = cos(x[:, :, None], negs) / self.logit_temp  # (B, T, K)
        # neg == pos positions get -inf (`compute_preds`, `:258-267`)
        same = jnp.all(jnp.abs(negs - y[:, :, None]) < 1e-12, axis=-1)
        neg = jnp.where(same, -jnp.inf, neg)
        logits = jnp.concatenate([pos[..., None], neg], axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(valid), 1)
        return -jnp.sum(jnp.where(valid, logp, 0.0)) / denom

    def __call__(self, feats, feat_lens, labels, label_lens,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        # full-context view
        enc_full, lens_full = self.asr.encoder(
            feats, feat_lens, deterministic=deterministic)
        loss_full, acc_full = self._view_loss(
            enc_full, lens_full, labels, label_lens, deterministic)
        # chunk-masked (streaming) view of the SAME features
        enc_chunk, lens_chunk = self.asr.encoder(
            feats, feat_lens, self.chunk_size,
            deterministic=deterministic)
        loss_chunk, acc_chunk = self._view_loss(
            enc_chunk, lens_chunk, labels, label_lens, deterministic)

        loss_ctl = jnp.asarray(0.0)
        if self.ctl_weight > 0 and self.n_negatives > 0:
            valid = mask_utils.make_pad_mask(lens_chunk,
                                             enc_chunk.shape[1])
            rng = (self.make_rng("dropout") if not deterministic
                   else jax.random.PRNGKey(0))
            loss_ctl = self._ctl(enc_chunk,
                                 jax.lax.stop_gradient(enc_full),
                                 valid, rng)
        loss = loss_full + loss_chunk + self.ctl_weight * loss_ctl
        return {
            "loss": loss, "loss_full": loss_full,
            "loss_chunk": loss_chunk, "loss_ctl": loss_ctl,
            "th_accuracy": acc_full, "chunk_th_accuracy": acc_chunk,
        }
