"""BestRQ self-supervised pretraining.

Parity target: `wenet/ssl/bestrq/` (part of `wenet/ssl/`, 1192 LoC total):
a frozen random projection + random codebook quantizes the clean features
into targets; the encoder consumes masked features and is trained to
classify each masked frame's codebook index (cross-entropy on masked
positions only).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models.encoder_registry import (
    build_encoder,
)
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


class BestRQModel(nn.Module):
    encoder_conf: Any
    encoder_type: str = "conformer"
    input_size: int = 80
    num_codebooks: int = 1
    codebook_size: int = 8192
    codebook_dim: int = 16
    mask_prob: float = 0.01        # per-frame mask-start probability
    mask_length: int = 10
    stack_frames: int = 4          # quantize stacked frames (ds4 alignment)

    def setup(self):
        self.encoder = build_encoder(self.encoder_type,
                                     dict(self.encoder_conf))
        d = dict(self.encoder_conf).get("output_size", 256)
        self.heads = [
            nn.Dense(self.codebook_size, name=f"head_{i}")
            for i in range(self.num_codebooks)
        ]

    def _quantize(self, feats):
        """Frozen random projection + codebook via fixed-PRNG constants."""
        B, T, D = feats.shape
        s = self.stack_frames
        pad = (-T) % s
        f = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        stacked = f.reshape(B, -1, s * D)
        # deterministic constants (not trained, not stored): same seeds
        # every call == frozen buffers
        proj = jax.random.normal(
            jax.random.PRNGKey(0), (s * D, self.codebook_dim)
        )
        targets = []
        z = stacked @ proj
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        for i in range(self.num_codebooks):
            book = jax.random.normal(
                jax.random.PRNGKey(100 + i),
                (self.codebook_size, self.codebook_dim),
            )
            book = book / (jnp.linalg.norm(book, axis=-1,
                                           keepdims=True) + 1e-8)
            sim = z @ book.T
            targets.append(jnp.argmax(sim, axis=-1))  # (B, T//s)
        return targets

    def _span_mask(self, rng, B, T):
        starts = jax.random.bernoulli(rng, self.mask_prob, (B, T))
        m = starts
        for i in range(1, self.mask_length):
            m = m | jnp.pad(starts, ((0, 0), (i, 0)))[:, :T]
        return m

    def __call__(self, feats, feat_lens, mask_rng,
                 deterministic: bool = False):
        B, T, D = feats.shape
        targets = self._quantize(feats)
        mask = self._span_mask(mask_rng, B, T)
        valid_t = mask_utils.make_pad_mask(feat_lens, T)
        mask = mask & valid_t
        noise = jax.random.normal(
            jax.random.fold_in(mask_rng, 1), feats.shape) * 0.1
        masked_feats = jnp.where(mask[..., None], noise, feats)
        enc, enc_lens = self.encoder(masked_feats, feat_lens,
                                     deterministic=deterministic)
        # align frame mask to encoder rate (ds4 ~ stack_frames)
        s = self.stack_frames
        pad = (-T) % s
        m = jnp.pad(mask, ((0, 0), (0, pad)))
        m_enc = m.reshape(B, -1, s).any(axis=-1)
        Te = min(enc.shape[1], m_enc.shape[1])
        losses, accs = [], []
        for i, head in enumerate(self.heads):
            logits = head(enc)[:, :Te]
            tgt = targets[i][:, :Te]
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, tgt[..., None],
                                       axis=-1)[..., 0]
            sel = m_enc[:, :Te]
            denom = jnp.maximum(jnp.sum(sel), 1)
            losses.append(jnp.sum(jnp.where(sel, nll, 0.0)) / denom)
            pred = jnp.argmax(logits, axis=-1)
            accs.append(jnp.sum(jnp.where(sel, pred == tgt, False))
                        / denom)
        loss = jnp.mean(jnp.stack(losses))
        return {"loss": loss,
                "acc": jnp.mean(jnp.stack(accs)),
                "num_masked": jnp.sum(m_enc)}
