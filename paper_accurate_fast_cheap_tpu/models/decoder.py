"""Attention (bi)transformer decoders.

The reference release is missing `wenet/transformer/decoder.py`; behavior is
reconstructed from upstream WeNet semantics against the call sites the
survey catalogues (SURVEY.md §2.3): `decoder(enc, enc_mask, ys_in, ys_lens,
r_ys_in, reverse_weight) -> (l_logits, r_logits, olens)`
(`wenet/transformer/asr_model.py:269-275`), `forward_one_step` for AR search
(`wenet/transformer/search.py:304-306`), attrs `left_decoder/right_decoder`
(`asr_model.py:857`), weight tying (`wenet/utils/init_model.py:274-275`).

Architecture: token embedding * sqrt(d) + sinusoid PE -> N pre-norm blocks of
[causal self-attn, cross-attn over encoder, FFN] -> LayerNorm -> vocab Dense.
BiTransformerDecoder adds a right-to-left decoder over reversed labels.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models.attention import (
    MultiHeadedAttention,
)
from paper_accurate_fast_cheap_tpu.models.convolution import (
    PositionwiseFeedForward,
)
from paper_accurate_fast_cheap_tpu.models.embedding import PositionalEncoding
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


class DecoderLayer(nn.Module):
    d_model: int
    heads: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True

    @nn.compact
    def __call__(self, x, self_mask, memory, memory_mask,
                 deterministic: bool = True):
        drop = lambda v: nn.Dropout(self.dropout_rate)(
            v, deterministic=deterministic
        )
        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = MultiHeadedAttention(
            heads=self.heads, d_model=self.d_model,
            dropout_rate=self.self_attention_dropout_rate, name="self_attn",
        )(y, y, self_mask, deterministic=deterministic)
        x = res + drop(y)

        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = MultiHeadedAttention(
            heads=self.heads, d_model=self.d_model,
            dropout_rate=self.src_attention_dropout_rate, name="src_attn",
        )(y, memory, memory_mask, deterministic=deterministic)
        x = res + drop(y)

        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        y = PositionwiseFeedForward(
            self.d_model, self.linear_units, self.dropout_rate,
            activation="relu", name="feed_forward",
        )(y, deterministic=deterministic)
        return res + drop(y)


class TransformerDecoder(nn.Module):
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 3
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    use_output_layer: bool = True

    @nn.compact
    def __call__(self, memory, memory_lens, ys_in, ys_lens,
                 deterministic: bool = True):
        """memory: (B, T, D); ys_in: (B, U) with <sos>.  Returns (B, U, V)."""
        d = self.encoder_output_size
        x = nn.Embed(self.vocab_size, d, name="embed")(ys_in)
        x, _ = PositionalEncoding(
            d_model=d, dropout_rate=self.positional_dropout_rate,
            name="pos_enc",
        )(x, deterministic=deterministic)

        U = ys_in.shape[1]
        tgt_pad = mask_utils.make_pad_mask(ys_lens, U)
        self_mask = (
            tgt_pad[:, None, :] & mask_utils.subsequent_mask(U)[None]
        )
        mem_mask = mask_utils.make_pad_mask(memory_lens, memory.shape[1])[
            :, None, :
        ]
        for i in range(self.num_blocks):
            x = DecoderLayer(
                d_model=d, heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                self_attention_dropout_rate=self.self_attention_dropout_rate,
                src_attention_dropout_rate=self.src_attention_dropout_rate,
                name=f"layer_{i}",
            )(x, self_mask, memory, mem_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)
        if self.use_output_layer:
            x = nn.Dense(self.vocab_size, name="output_layer")(x)
        return x

    def forward_one_step(self, memory, memory_lens, ys, ys_lens,
                         deterministic: bool = True):
        """AR step: run the full prefix, return log-probs of the last valid
        position (simple version; KV-cached incremental step is a later
        optimization)."""
        logits = self(memory, memory_lens, ys, ys_lens,
                      deterministic=deterministic)
        last = jnp.take_along_axis(
            logits, (ys_lens - 1)[:, None, None], axis=1
        )[:, 0]
        return jax.nn.log_softmax(last, axis=-1)


class BiTransformerDecoder(nn.Module):
    """Left (L2R) + right (R2L) decoders (`decoder: bitransformer`)."""

    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 3
    r_num_blocks: int = 3
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0

    def setup(self):
        kw = dict(
            vocab_size=self.vocab_size,
            encoder_output_size=self.encoder_output_size,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            dropout_rate=self.dropout_rate,
            positional_dropout_rate=self.positional_dropout_rate,
            self_attention_dropout_rate=self.self_attention_dropout_rate,
            src_attention_dropout_rate=self.src_attention_dropout_rate,
        )
        self.left_decoder = TransformerDecoder(
            num_blocks=self.num_blocks, **kw
        )
        self.right_decoder = TransformerDecoder(
            num_blocks=self.r_num_blocks, **kw
        )

    def __call__(self, memory, memory_lens, ys_in, ys_lens, r_ys_in=None,
                 reverse_weight: float = 0.0, deterministic: bool = True):
        l_x = self.left_decoder(memory, memory_lens, ys_in, ys_lens,
                                deterministic=deterministic)
        r_x = jnp.zeros_like(l_x)
        if reverse_weight > 0.0 and r_ys_in is not None:
            r_x = self.right_decoder(memory, memory_lens, r_ys_in, ys_lens,
                                     deterministic=deterministic)
        return l_x, r_x

    def forward_one_step(self, memory, memory_lens, ys, ys_lens,
                         deterministic: bool = True):
        return self.left_decoder.forward_one_step(
            memory, memory_lens, ys, ys_lens, deterministic=deterministic
        )
