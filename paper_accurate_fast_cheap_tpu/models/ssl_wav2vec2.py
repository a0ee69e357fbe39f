"""wav2vec2-style contrastive self-supervised pretraining.

Parity target: `wenet/ssl/wav2vec2/` (part of `wenet/ssl/`): masked frames
are predicted contrastively against their (quantized) targets with
distractors sampled from the same utterance (InfoNCE over masked
positions), plus a codebook-diversity regularizer.

TPU-first: distractor sampling uses a fixed number of negatives gathered
with jittable modular offsets (static shapes) instead of rejection
sampling; the Gumbel-softmax product quantizer is a pure function of the
PRNG key.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models.encoder_registry import (
    build_encoder,
)
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


class ProductQuantizer(nn.Module):
    """Gumbel-softmax product quantizer (2 groups x V entries)."""

    groups: int = 2
    entries: int = 320
    dim: int = 256

    @nn.compact
    def __call__(self, x, rng, temperature: float = 2.0,
                 hard: bool = True, return_ids: bool = False):
        B, T, D = x.shape
        logits = nn.Dense(self.groups * self.entries, name="proj")(x)
        logits = logits.reshape(B, T, self.groups, self.entries)
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logits.shape, minval=1e-6,
                               maxval=1.0 - 1e-6)))
        y_soft = jax.nn.softmax((logits + g) / temperature, axis=-1)
        if hard:
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, self.entries)
            y = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            y = y_soft
        codebook = self.param(
            "codebook", nn.initializers.normal(0.02),
            (self.groups, self.entries, self.dim // self.groups),
        )
        q = jnp.einsum("btge,ged->btgd", y, codebook)
        q = q.reshape(B, T, self.dim)
        # diversity: mean softmax usage entropy per group
        probs = jax.nn.softmax(logits, axis=-1).mean(axis=(0, 1))
        entropy = -jnp.sum(probs * jnp.log(probs + 1e-8), axis=-1)
        diversity = 1.0 - entropy.mean() / jnp.log(self.entries)
        if return_ids:
            # codebook ids (B, T, groups) — W2V-BERT's MLM targets
            return q, diversity, jnp.argmax(logits, axis=-1)
        return q, diversity


class Wav2Vec2Model(nn.Module):
    encoder_conf: Any
    encoder_type: str = "conformer"
    proj_dim: int = 256
    num_negatives: int = 50
    mask_prob: float = 0.065
    mask_length: int = 10
    temperature: float = 0.1
    diversity_weight: float = 0.1

    def setup(self):
        self.encoder = build_encoder(self.encoder_type,
                                     dict(self.encoder_conf))
        d = dict(self.encoder_conf).get("output_size", 256)
        self.ctx_proj = nn.Dense(self.proj_dim, name="ctx_proj")
        self.tgt_proj = nn.Dense(self.proj_dim, name="tgt_proj")
        self.quantizer = ProductQuantizer(dim=self.proj_dim,
                                          name="quantizer")
        self.mask_emb = self.param("mask_emb",
                                   nn.initializers.normal(0.1), (d,))

    def _span_mask(self, rng, B, T):
        starts = jax.random.bernoulli(rng, self.mask_prob, (B, T))
        m = starts
        for i in range(1, self.mask_length):
            m = m | jnp.pad(starts, ((0, 0), (i, 0)))[:, :T]
        return m

    def __call__(self, feats, feat_lens, rng,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        B, T, D = feats.shape
        k_mask, k_gumbel, k_neg = jax.random.split(rng, 3)
        # targets come from the UNMASKED features, quantized
        # (features act as the frozen feature-encoder output)
        enc_clean, enc_lens = self.encoder(feats, feat_lens,
                                           deterministic=True)
        Te = enc_clean.shape[1]
        q, diversity = self.quantizer(
            jax.lax.stop_gradient(enc_clean), k_gumbel)
        targets = self.tgt_proj(q)                        # (B, Te, P)

        mask_e = self._span_mask(k_mask, B, Te)
        valid = mask_utils.make_pad_mask(enc_lens, Te)
        mask_e = mask_e & valid
        # re-encode with masked positions replaced by the mask embedding
        # (mask applied at the encoder-frame rate via a learned embedding
        # added to the clean encoding — feature-level masking would need
        # the subsampling receptive field; this follows the "context
        # network sees masked latents" structure)
        ctx_in = jnp.where(mask_e[..., None],
                           self.mask_emb[None, None, :], enc_clean)
        context = self.ctx_proj(ctx_in)                   # (B, Te, P)

        # InfoNCE: positive = target at same position; negatives sampled
        # from other positions of the same utterance by modular offsets
        offs = jax.random.randint(
            k_neg, (self.num_negatives,), 1, jnp.maximum(Te - 1, 2))
        idx = (jnp.arange(Te)[None, :, None]
               + offs[None, None, :]) % jnp.maximum(Te, 1)
        negs = targets[jnp.arange(B)[:, None, None], idx]  # (B, Te, K, P)

        def cos(a, b):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
            return jnp.sum(a * b, axis=-1)

        pos = cos(context, targets) / self.temperature          # (B, Te)
        neg = cos(context[:, :, None], negs) / self.temperature  # (B,Te,K)
        logits = jnp.concatenate([pos[..., None], neg], axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(mask_e), 1)
        loss_c = -jnp.sum(jnp.where(mask_e, logp, 0.0)) / denom
        loss = loss_c + self.diversity_weight * diversity
        acc = jnp.sum(
            jnp.where(mask_e, jnp.argmax(logits, -1) == 0, False)
        ) / denom
        return {"loss": loss, "loss_contrastive": loss_c,
                "loss_diversity": diversity, "acc": acc,
                "num_masked": jnp.sum(mask_e)}
