"""Paraformer: non-autoregressive ASR with a CIF predictor.

Parity target: `wenet/paraformer/` (~2041 LoC): a CIF
(continuous-integrate-and-fire) predictor accumulates per-frame firing
weights alpha until they cross 1.0, emitting one "acoustic embedding" per
token; a non-autoregressive decoder attends encoder output with the CIF
embeddings as queries; training scales alpha so the total mass equals the
label count (the quantity loss) and uses sampler-free CE on the decoder.

TPU-first: the CIF integrate-and-fire is a `lax.scan` over frames with a
static token budget (max label count) instead of dynamic emission lists.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models import ctc_head as ctc_mod
from paper_accurate_fast_cheap_tpu.models.decoder import DecoderLayer
from paper_accurate_fast_cheap_tpu.models.encoder_registry import (
    build_encoder,
)
from paper_accurate_fast_cheap_tpu.ops.losses import label_smoothing_loss
from paper_accurate_fast_cheap_tpu.utils import common, masks as mask_utils


def cif(enc: jax.Array, alpha: jax.Array, max_tokens: int,
        threshold: float = 1.0):
    """Continuous integrate-and-fire.

    enc: (B, T, D); alpha: (B, T) non-negative firing weights.
    Returns (embeddings (B, max_tokens, D), fired_counts (B,)).
    """
    B, T, D = enc.shape

    def step(carry, inp):
        acc, frac_emb, out, n = carry
        a_t, h_t = inp                      # (B,), (B, D)
        new_acc = acc + a_t
        fire = new_acc >= threshold
        # weight used to complete the current token
        w_complete = jnp.where(fire, threshold - acc, a_t)
        emb = frac_emb + w_complete[:, None] * h_t
        # leftover starts the next token
        leftover = jnp.where(fire, new_acc - threshold, 0.0)
        frac_next = jnp.where(
            fire[:, None], leftover[:, None] * h_t,
            frac_emb + a_t[:, None] * h_t,
        )
        out_next = jnp.where(
            (fire[:, None] & (n[:, None] == jnp.arange(max_tokens)[None]))
            [..., None],
            emb[:, None, :], out,
        )
        n_next = jnp.where(fire, jnp.minimum(n + 1, max_tokens), n)
        acc_next = jnp.where(fire, leftover, new_acc)
        return (acc_next, frac_next, out_next, n_next), None

    init = (
        jnp.zeros((B,)), jnp.zeros((B, D)),
        jnp.zeros((B, max_tokens, D)), jnp.zeros((B,), jnp.int32),
    )
    (acc, frac, out, n), _ = jax.lax.scan(
        step, init,
        (jnp.moveaxis(alpha, 1, 0), jnp.moveaxis(enc, 1, 0)),
    )
    return out, n


class Paraformer(nn.Module):
    vocab_size: int
    encoder_conf: Any
    encoder_type: str = "conformer"
    decoder_blocks: int = 4
    decoder_heads: int = 4
    decoder_linear_units: int = 1024
    ctc_weight: float = 0.3
    quantity_weight: float = 1.0
    lsm_weight: float = 0.1
    max_tokens: int = 128
    ignore_id: int = common.IGNORE_ID

    def setup(self):
        self.encoder = build_encoder(self.encoder_type,
                                     dict(self.encoder_conf))
        d = dict(self.encoder_conf).get("output_size", 256)
        self.d_model = d
        self.alpha_proj = nn.Dense(1, name="predictor_alpha")
        self.ctc = ctc_mod.CTCHead(vocab_size=self.vocab_size, name="ctc")
        self.dec_layers = [
            DecoderLayer(d_model=d, heads=self.decoder_heads,
                         linear_units=self.decoder_linear_units,
                         name=f"dec_{i}")
            for i in range(self.decoder_blocks)
        ]
        self.out_proj = nn.Dense(self.vocab_size, name="output_layer")

    def _alphas(self, enc, enc_lens):
        alpha = nn.sigmoid(self.alpha_proj(enc))[..., 0]
        valid = mask_utils.make_pad_mask(enc_lens, enc.shape[1])
        return jnp.where(valid, alpha, 0.0)

    def _decode_embs(self, enc, enc_lens, embs, n_tokens,
                     deterministic=True):
        tok_mask = mask_utils.make_pad_mask(n_tokens, self.max_tokens)
        self_mask = tok_mask[:, None, :] & tok_mask[:, :, None]
        mem_mask = mask_utils.make_pad_mask(enc_lens, enc.shape[1])[
            :, None, :]
        x = embs
        for layer in self.dec_layers:
            x = layer(x, self_mask, enc, mem_mask,
                      deterministic=deterministic)
        return self.out_proj(x)

    def __call__(self, feats, feat_lens, labels, label_lens,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        enc, enc_lens = self.encoder(feats, feat_lens,
                                     deterministic=deterministic)
        alpha = self._alphas(enc, enc_lens)
        total = jnp.sum(alpha, axis=1)
        # quantity loss + teacher-forced scaling so mass == label count
        loss_quantity = jnp.mean(
            jnp.abs(total - label_lens.astype(jnp.float32)))
        scale = label_lens.astype(jnp.float32) / jnp.maximum(total, 1e-6)
        alpha_scaled = alpha * scale[:, None]
        embs, n_fired = cif(enc, alpha_scaled, self.max_tokens)
        logits = self._decode_embs(enc, enc_lens, embs, label_lens,
                                   deterministic)
        U = labels.shape[1]
        tgt = jnp.full((labels.shape[0], self.max_tokens), self.ignore_id,
                       labels.dtype)
        tgt = tgt.at[:, :U].set(
            jnp.where(
                jnp.arange(U)[None] < label_lens[:, None], labels,
                self.ignore_id,
            )
        )
        loss_dec = label_smoothing_loss(logits, tgt, self.lsm_weight,
                                        self.ignore_id)
        loss_ctc = jnp.asarray(0.0)
        if self.ctc_weight > 0:
            loss_ctc = ctc_mod.ctc_loss(
                self.ctc(enc, deterministic=deterministic), enc_lens,
                labels, label_lens)
        loss = (loss_dec + self.quantity_weight * loss_quantity
                + self.ctc_weight * loss_ctc)
        acc = common.accuracy(logits, tgt, self.ignore_id)
        return {"loss": loss, "loss_decoder": loss_dec,
                "loss_quantity": loss_quantity, "loss_ctc": loss_ctc,
                "th_accuracy": acc}

    def recognize(self, feats, feat_lens):
        """Non-autoregressive decode: CIF fires determine the length."""
        enc, enc_lens = self.encoder(feats, feat_lens, deterministic=True)
        alpha = self._alphas(enc, enc_lens)
        embs, n_fired = cif(enc, alpha, self.max_tokens)
        logits = self._decode_embs(enc, enc_lens, embs, n_fired, True)
        return jnp.argmax(logits, axis=-1), n_fired
