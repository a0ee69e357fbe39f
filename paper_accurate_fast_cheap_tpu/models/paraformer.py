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


class SANMAttention(nn.Module):
    """SAN-M self-attention (`wenet/paraformer/attention.py:8-115`):
    fused q/k/v projection + an FSMN depthwise-conv memory branch over v,
    added to the attention output."""

    heads: int
    d_model: int
    kernel_size: int = 11
    sanm_shift: int = 0
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, pad_mask=None, *,
                 deterministic: bool = True):
        B, T, _ = x.shape
        H = self.heads
        Dk = self.d_model // H
        qkv = nn.Dense(3 * self.d_model, name="linear_q_k_v")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # FSMN memory over v (`:64-86`): zero pads, depthwise conv
        # (left/right split by sanm_shift), residual, re-mask
        vm = v
        if pad_mask is not None:
            vm = jnp.where(pad_mask[..., None], vm, 0.0)
        left = (self.kernel_size - 1) // 2 + self.sanm_shift
        right = self.kernel_size - 1 - left
        mem = nn.Conv(self.d_model, (self.kernel_size,),
                      padding=((left, right),),
                      feature_group_count=self.d_model, use_bias=False,
                      name="fsmn_block")(vm)
        mem = mem + vm
        mem = nn.Dropout(self.dropout_rate)(mem,
                                            deterministic=deterministic)
        if pad_mask is not None:
            mem = jnp.where(pad_mask[..., None], mem, 0.0)

        q = q.reshape(B, T, H, Dk)
        k = k.reshape(B, T, H, Dk)
        vh = v.reshape(B, T, H, Dk)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(
            jnp.asarray(Dk, x.dtype))
        if mask is not None:
            m = mask[:, None] if mask.ndim == 3 else mask
            scores = jnp.where(m, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            m = mask[:, None] if mask.ndim == 3 else mask
            probs = jnp.where(m, probs, 0.0)
        att = jnp.einsum("bhts,bshd->bthd", probs, vh).reshape(B, T, -1)
        att = nn.Dense(self.d_model, name="linear_out")(att)
        return att + mem


def cif_peaks(alphas: jax.Array, token_nums: jax.Array,
              threshold: float = 1.0) -> jax.Array:
    """Timestamp branch (`paraformer.py:319-327` forward_cif_peaks +
    `cif.py cif_without_hidden`): rescale alphas so their mass equals the
    decoded token count, then accumulate and mark fire positions."""
    total = jnp.sum(alphas, axis=-1, keepdims=True)
    scaled = alphas / jnp.maximum(
        total / jnp.maximum(token_nums.astype(alphas.dtype)[:, None],
                            1e-6), 1e-6)

    def step(acc, a):
        acc = acc + a
        fired = acc >= threshold - 1e-4
        acc = jnp.where(fired, acc - (threshold - 1e-4), acc)
        return acc, fired

    _, fired = jax.lax.scan(step, jnp.zeros(alphas.shape[0]),
                            jnp.moveaxis(scaled, 1, 0))
    return jnp.moveaxis(fired, 0, 1)  # (B, T) bool fire marks


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
    # glancing-LM sampler (`paraformer.py:122,238-277`): second decoder
    # pass with a fraction of wrong positions teacher-forced
    sampler: bool = True
    sampling_ratio: float = 0.75

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
        if self.sampler:
            self.sampler_embed = nn.Embed(self.vocab_size, self.d_model,
                                          name="sampler_embed")

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
        U = labels.shape[1]
        tgt = jnp.full((labels.shape[0], self.max_tokens), self.ignore_id,
                       labels.dtype)
        tgt = tgt.at[:, :U].set(
            jnp.where(
                jnp.arange(U)[None] < label_lens[:, None], labels,
                self.ignore_id,
            )
        )
        if self.sampler and not deterministic:
            embs = self._sampler(enc, enc_lens, embs, tgt, label_lens,
                                 self.make_rng("dropout"))
        logits = self._decode_embs(enc, enc_lens, embs, label_lens,
                                   deterministic)
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

    def _sampler(self, enc, enc_lens, acoustic_embs, tgt, label_lens,
                 rng):
        """Glancing sampler (`paraformer.py:238-277`): first NAR pass with
        acoustic embeddings; positions the model got wrong are replaced by
        target embeddings with probability ~ sampling_ratio * error_rate.
        Deviation: the reference scatters exactly `target_num` random
        positions per row (randperm); we use per-position Bernoulli with
        the same expectation (shape-static for jit)."""
        tok_valid = tgt != self.ignore_id
        tgt_ids = jnp.where(tok_valid, tgt, 0)
        tgt_embs = self.sampler_embed(tgt_ids)
        first = jax.lax.stop_gradient(
            self._decode_embs(enc, enc_lens, acoustic_embs,
                              label_lens, True))
        pred = jnp.argmax(first, axis=-1)
        wrong = (pred != tgt_ids) & tok_valid
        n_tok = jnp.maximum(jnp.sum(tok_valid, axis=1), 1)
        p_replace = (self.sampling_ratio
                     * jnp.sum(wrong, axis=1) / n_tok)[:, None]
        replace = (jax.random.uniform(rng, tgt_ids.shape) < p_replace) \
            & tok_valid
        mixed = jnp.where(replace[..., None], tgt_embs, acoustic_embs)
        return jnp.where(tok_valid[..., None], mixed, 0.0)

    def forward_cif_peaks(self, feats, feat_lens, token_nums):
        """Accurate-timestamp branch (`paraformer.py:319-327`): CIF fire
        positions at the encoder frame rate, rescaled to token_nums."""
        enc, enc_lens = self.encoder(feats, feat_lens, deterministic=True)
        alpha = self._alphas(enc, enc_lens)
        return cif_peaks(alpha, token_nums)

    def recognize(self, feats, feat_lens):
        """Non-autoregressive decode: CIF fires determine the length."""
        enc, enc_lens = self.encoder(feats, feat_lens, deterministic=True)
        alpha = self._alphas(enc, enc_lens)
        embs, n_fired = cif(enc, alpha, self.max_tokens)
        logits = self._decode_embs(enc, enc_lens, embs, n_fired, True)
        return jnp.argmax(logits, axis=-1), n_fired
