"""W2V-BERT self-supervised pretraining (contrastive + masked LM).

Parity target: `wenet/ssl/w2vbert/w2vbert_model.py` (319 LoC,
arXiv:2108.06209): the encoder is split into `contrastive_blocks` +
`masked_blocks`; masked inputs run through all blocks; the mid-stack
output is trained contrastively against Gumbel-quantized targets of the
clean features (wav2vec2-style), and the top output is trained to
classify each masked frame's codebook id (MLM cross-entropy, weight
ramped over `warmup_steps`, `w2vbert_model.py:228-231`).

TPU-first: one jitted loss; the block split reuses the encoder's
`return_layers` tap (the deep-biasing surface, `encoder.py:151-206`)
instead of re-slicing module lists.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models.encoder_registry import (
    build_encoder,
)
from paper_accurate_fast_cheap_tpu.models.ssl_wav2vec2 import (
    ProductQuantizer,
)
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


class W2VBertModel(nn.Module):
    encoder_conf: Any
    encoder_type: str = "conformer"
    proj_dim: int = 256
    num_codebooks: int = 2          # quantizer groups == MLM codebooks
    codebook_entries: int = 320
    num_negatives: int = 50
    mask_prob: float = 0.065
    mask_length: int = 10
    temperature: float = 0.1
    diversity_weight: float = 0.0
    features_regularization_weight: float = 0.01
    contrastive_blocks: int = 0     # 0 -> num_blocks // 2
    contrastive_weight: float = 1.0
    mlm_weight: float = 1.0
    warmup_steps: int = 25000

    def setup(self):
        conf = dict(self.encoder_conf)
        self.encoder = build_encoder(self.encoder_type, conf)
        self.n_blocks = conf.get("num_blocks", 6)
        d = conf.get("output_size", 256)
        self.ctx_proj = nn.Dense(self.proj_dim, name="ctx_proj")
        self.tgt_proj = nn.Dense(self.proj_dim, name="tgt_proj")
        self.quantizer = ProductQuantizer(
            groups=self.num_codebooks, entries=self.codebook_entries,
            dim=self.proj_dim, name="quantizer")
        self.mlm_heads = [
            nn.Dense(self.codebook_entries, name=f"mlm_head_{i}")
            for i in range(self.num_codebooks)
        ]
        self.mask_emb = self.param("mask_emb",
                                   nn.initializers.normal(0.1), (d,))

    def _span_mask(self, rng, B, T):
        starts = jax.random.bernoulli(rng, self.mask_prob, (B, T))
        m = starts
        for i in range(1, self.mask_length):
            m = m | jnp.pad(starts, ((0, 0), (i, 0)))[:, :T]
        return m

    def __call__(self, feats, feat_lens, rng, steps: int = 0,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        B = feats.shape[0]
        k_mask, k_gumbel, k_neg = jax.random.split(rng, 3)
        cblocks = self.contrastive_blocks or self.n_blocks // 2

        # clean pass -> quantized targets + codebook ids
        enc_clean, enc_lens = self.encoder(feats, feat_lens,
                                           deterministic=True)
        Te = enc_clean.shape[1]
        q, diversity, target_ids = self.quantizer(
            jax.lax.stop_gradient(enc_clean), k_gumbel, return_ids=True)
        targets = self.tgt_proj(q)                       # (B, Te, P)

        mask_e = self._span_mask(k_mask, B, Te)
        valid = mask_utils.make_pad_mask(enc_lens, Te)
        mask_e = mask_e & valid

        # masked pass through ALL blocks, tapping the mid-stack output
        ctx_in = jnp.where(mask_e[..., None],
                           self.mask_emb[None, None, :], enc_clean)
        _, _, layer_outs = self.encoder(
            ctx_in, enc_lens, deterministic=deterministic,
            return_layers=True, pre_embedded=True)
        contrastive_vec = layer_outs[cblocks - 1]
        mlm_vec = layer_outs[-1]

        # ---- contrastive (wav2vec2 loss on the mid-stack output)
        context = self.ctx_proj(contrastive_vec)
        offs = jax.random.randint(
            k_neg, (self.num_negatives,), 1, jnp.maximum(Te - 1, 2))
        idx = (jnp.arange(Te)[None, :, None]
               + offs[None, None, :]) % jnp.maximum(Te, 1)
        negs = targets[jnp.arange(B)[:, None, None], idx]

        def cos(a, b):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
            return jnp.sum(a * b, axis=-1)

        pos = cos(context, targets) / self.temperature
        neg = cos(context[:, :, None], negs) / self.temperature
        logits = jnp.concatenate([pos[..., None], neg], axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(mask_e), 1)
        loss_c = -jnp.sum(jnp.where(mask_e, logp, 0.0)) / denom

        # ---- MLM on the top output: classify each codebook id
        loss_mlm = jnp.asarray(0.0)
        accs = []
        for g, head in enumerate(self.mlm_heads):
            lg = jax.nn.log_softmax(head(mlm_vec), axis=-1)  # (B, Te, E)
            tgt = target_ids[..., g]
            nll = -jnp.take_along_axis(lg, tgt[..., None], axis=-1)[..., 0]
            loss_mlm = loss_mlm + jnp.sum(
                jnp.where(mask_e, nll, 0.0)) / denom
            accs.append(jnp.sum(jnp.where(
                mask_e, jnp.argmax(lg, -1) == tgt, False)) / denom)
        loss_mlm = loss_mlm / self.num_codebooks
        codes_acc = jnp.mean(jnp.stack(accs))

        # warmup ramp of the MLM weight (`w2vbert_model.py:228-231`)
        ramp = jnp.minimum(1.0, 0.1 + 0.9 * steps / self.warmup_steps)
        mlm_w = self.mlm_weight * jnp.where(
            steps >= self.warmup_steps, 1.0, ramp)

        feats_pen = jnp.mean(enc_clean ** 2)
        loss = (self.contrastive_weight * loss_c
                + mlm_w * loss_mlm
                + self.diversity_weight * diversity
                + self.features_regularization_weight * feats_pen)
        return {
            "loss": loss, "loss_contrastive": loss_c,
            "loss_mlm": loss_mlm, "loss_diversity": diversity,
            "codes_acc": codes_acc, "features_l2": feats_pen,
            "num_masked": jnp.sum(mask_e),
        }
