"""Context adaptor for deep biasing (custom-vocabulary boosting).

Parity target: `wenet/transformer/context_adaptor.py` (146 LoC): a BLSTM
encodes each biasing phrase's token sequence into one vector (``encode_cv``);
cross-attention from combined encoder layer outputs onto the phrase vectors
injects bias information back into the acoustic representation
(``forward`` / ``combine_layers``), consumed via the encoder's
``return_layers`` taps (`encoder.py:151-206` forward_return_layers).
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models.attention import (
    MultiHeadedAttention,
)
from paper_accurate_fast_cheap_tpu.models.predictor import LSTMLayer


class ContextAdaptor(nn.Module):
    vocab_size: int
    d_model: int = 512
    embed_size: int = 256
    heads: int = 4
    num_combine_layers: int = 3

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.embed_size)
        self.fwd_lstm = LSTMLayer(hidden_size=self.embed_size,
                                  name="cv_lstm_fwd")
        self.bwd_lstm = LSTMLayer(hidden_size=self.embed_size,
                                  name="cv_lstm_bwd")
        self.cv_proj = nn.Dense(self.d_model, name="cv_proj")
        self.attn = MultiHeadedAttention(
            heads=self.heads, d_model=self.d_model, name="bias_attn")
        self.combine_weights = self.param(
            "combine_weights", nn.initializers.ones,
            (self.num_combine_layers,),
        )
        self.out_proj = nn.Dense(self.d_model, name="out_proj")

    def encode_cv(self, cv_tokens, cv_lens):
        """cv_tokens: (N, U) padded biasing phrases -> (N, d_model)."""
        N, U = cv_tokens.shape
        emb = self.embed(cv_tokens)
        h0 = jnp.zeros((N, self.embed_size))
        fwd, _ = self.fwd_lstm(emb, h0, h0)
        bwd, _ = self.bwd_lstm(emb[:, ::-1], h0, h0)
        # last valid forward state + first-token backward state
        idx = jnp.clip(cv_lens - 1, 0, U - 1)
        f_last = jnp.take_along_axis(fwd, idx[:, None, None], axis=1)[:, 0]
        b_last = bwd[:, -1]
        return self.cv_proj(jnp.concatenate([f_last, b_last], axis=-1))

    def combine_layers(self, layer_outs: Sequence[jax.Array]):
        """Weighted sum of the last num_combine_layers encoder taps."""
        taps = layer_outs[-self.num_combine_layers:]
        w = jax.nn.softmax(self.combine_weights[: len(taps)])
        return sum(wi * t for wi, t in zip(w, taps))

    def __call__(self, layer_outs: Sequence[jax.Array], cv_tokens,
                 cv_lens, deterministic: bool = True):
        """Returns a bias vector sequence (B, T, d_model) to add onto the
        encoder output."""
        combined = self.combine_layers(layer_outs)
        cv = self.encode_cv(cv_tokens, cv_lens)      # (N, D)
        cv_b = jnp.broadcast_to(
            cv[None], (combined.shape[0],) + cv.shape
        )
        att = self.attn(combined, cv_b, deterministic=deterministic)
        return self.out_proj(att)
