"""Transducer predictors.

Parity target: `wenet/transducer/predictor.py` — RNNPredictor (LSTM, `:60-`),
EmbeddingPredictor (n-gram-style embedding history), ConvPredictor, with the
init_state / forward_step cache protocol (`:17-58`).

TPU-first: the training-time LSTM unrolls as `lax.scan` inside jit (optax-
friendly, static shapes); `forward_step` is a single-step jitted function
whose state is an explicit pytree (no hidden module state).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LSTMLayer(nn.Module):
    """Single LSTM layer, TPU-style: the input projection for ALL timesteps
    is one big matmul outside the recurrence; the `lax.scan` carries only the
    h/c state and does the (H, 4H) recurrent matmul (no param creation inside
    the scan, which flax forbids)."""

    hidden_size: int

    def setup(self):
        self.ih = nn.Dense(4 * self.hidden_size, name="ih")
        self.W_hh = self.param(
            "hh", nn.initializers.orthogonal(),
            (self.hidden_size, 4 * self.hidden_size),
        )

    def _gate(self, xp, h, c):
        gates = xp + h @ self.W_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h = nn.sigmoid(o) * jnp.tanh(c)
        return h, c

    def __call__(self, xs, h0, c0):
        """xs: (B, U, E) -> (outputs (B, U, H), (h, c))."""
        x_proj = self.ih(xs)

        def step(carry, xp_t):
            h, c = self._gate(xp_t, *carry)
            return (h, c), h

        (h, c), outs = jax.lax.scan(
            step, (h0, c0), jnp.moveaxis(x_proj, 1, 0)
        )
        return jnp.moveaxis(outs, 0, 1), (h, c)

    def one_step(self, x_t, h, c):
        """Single AR step sharing the same parameters."""
        h, c = self._gate(self.ih(x_t), h, c)
        return h, (h, c)


class RNNPredictor(nn.Module):
    """LSTM predictor: embed -> dropout -> LSTM stack -> projection."""

    vocab_size: int
    embed_size: int = 640
    hidden_size: int = 640
    output_size: int = 640
    num_layers: int = 2
    embed_dropout: float = 0.1
    dropout: float = 0.1

    def init_state(self, batch_size: int):
        return (
            jnp.zeros((self.num_layers, batch_size, self.hidden_size)),
            jnp.zeros((self.num_layers, batch_size, self.hidden_size)),
        )

    @nn.compact
    def __call__(self, ys, state=None, deterministic: bool = True):
        """ys: (B, U) token ids (blank-prepended for training).
        Returns (B, U, output_size)."""
        B, U = ys.shape
        x = nn.Embed(self.vocab_size, self.embed_size, name="embed")(ys)
        x = nn.Dropout(self.embed_dropout)(x, deterministic=deterministic)
        if state is None:
            state = self.init_state(B)
        hs, cs = state
        for i in range(self.num_layers):
            x, _ = LSTMLayer(
                hidden_size=self.hidden_size, name=f"lstm_{i}"
            )(x, hs[i], cs[i])
            if i < self.num_layers - 1:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.output_size, name="projection")(x)

    @nn.compact
    def forward_step(self, ys_last, state):
        """One AR step: ys_last (B,), state -> (out (B, D), new_state)."""
        x = nn.Embed(self.vocab_size, self.embed_size, name="embed")(
            ys_last[:, None]
        )[:, 0]
        hs, cs = state
        new_h, new_c = [], []
        for i in range(self.num_layers):
            x, (h, c) = LSTMLayer(
                hidden_size=self.hidden_size, name=f"lstm_{i}"
            ).one_step(x, hs[i], cs[i])
            new_h.append(h)
            new_c.append(c)
        out = nn.Dense(self.output_size, name="projection")(x)
        return out, (jnp.stack(new_h), jnp.stack(new_c))


class EmbeddingPredictor(nn.Module):
    """Stateless n-gram predictor: weighted sum of the last `history_size`
    token embeddings (`predictor.py` EmbeddingPredictor semantics)."""

    vocab_size: int
    embed_size: int = 640
    output_size: int = 640
    history_size: int = 2
    embed_dropout: float = 0.1

    @nn.compact
    def __call__(self, ys, state=None, deterministic: bool = True):
        B, U = ys.shape
        n = self.history_size + 1
        emb = nn.Embed(self.vocab_size, self.embed_size, name="embed")(ys)
        emb = nn.Dropout(self.embed_dropout)(emb, deterministic=deterministic)
        pos = self.param("pos_weight", nn.initializers.normal(1.0),
                         (n, self.embed_size))
        # windows of the last n tokens (left-padded with zeros)
        padded = jnp.pad(emb, ((0, 0), (n - 1, 0), (0, 0)))
        idx = jnp.arange(U)[:, None] + jnp.arange(n)[None, :]
        win = padded[:, idx]                     # (B, U, n, E)
        out = jnp.einsum("bune,ne->bue", win, pos)
        out = nn.LayerNorm(epsilon=1e-5)(out)
        return nn.Dense(self.output_size, name="projection")(out)


class ConvPredictor(nn.Module):
    """Causal-conv predictor over token embeddings."""

    vocab_size: int
    embed_size: int = 640
    output_size: int = 640
    kernel_size: int = 3
    embed_dropout: float = 0.1

    @nn.compact
    def __call__(self, ys, state=None, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_size, name="embed")(ys)
        emb = nn.Dropout(self.embed_dropout)(emb, deterministic=deterministic)
        y = nn.Conv(
            self.output_size, (self.kernel_size,),
            padding=((self.kernel_size - 1, 0),), name="conv",
        )(emb)
        y = nn.LayerNorm(epsilon=1e-5)(y)
        return nn.relu(y)
