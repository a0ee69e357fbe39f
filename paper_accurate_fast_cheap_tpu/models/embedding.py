"""Positional encodings.

Parity targets: `wenet/transformer/embedding.py` — PositionalEncoding
(`:25-118`, offset-aware, x * sqrt(d)), RelPositionalEncoding (`:120-147`,
returns the sinusoid table alongside the scaled input), NoPositionalEncoding
(`:279-299`).  Sinusoid rows are computed on device (`sinusoid_positions`)
— embedding the 100k-row table as an HLO constant added ~205 MB to every
encoder program and tripped the remote compile service's size limit.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """Standard transformer sinusoid table (max_len, d_model), fp32."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64)
        * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


def sinusoid_positions(offset, T: int, d_model: int) -> jax.Array:
    """Rows [offset, offset+T) of the sinusoid table, computed ON DEVICE.

    Embedding the full (max_len=100000, d) numpy table as an HLO
    constant put ~205 MB into every encoder program — the remote compile
    service rejects such programs (HTTP 413) at long-form window sizes.
    f32 compute matches the torch reference, which builds its table in
    f32 (`wenet/transformer/embedding.py`); ``offset`` may be traced
    (the streaming chunk path) or a static int.
    """
    pos = (jnp.asarray(offset, jnp.float32)
           + jnp.arange(T, dtype=jnp.float32))[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * -(np.log(10000.0) / d_model))
    ang = pos * div[None, :]
    pe = jnp.zeros((T, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal encoding: returns (x * sqrt(d) + PE, PE).

    ``offset`` may be a python int or a traced scalar (streaming chunks)."""

    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, offset=0, deterministic: bool = True):
        T = x.shape[1]
        pos = sinusoid_positions(offset, T, self.d_model)[None]
        y = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype)) + pos
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        pos = nn.Dropout(self.dropout_rate)(pos, deterministic=deterministic)
        return y, pos


class RelPositionalEncoding(nn.Module):
    """Transformer-XL style: scales x, returns the PE table separately."""

    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 100000  # reference uses 100k for long-form

    @nn.compact
    def __call__(self, x, offset=0, deterministic: bool = True):
        T = x.shape[1]
        pos = sinusoid_positions(offset, T, self.d_model)[None]
        y = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        pos = nn.Dropout(self.dropout_rate)(pos, deterministic=deterministic)
        return y, pos


class NoPositionalEncoding(nn.Module):
    """Scale-only (recurrent attention needs no positions)."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, offset: int = 0, deterministic: bool = True):
        y = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        pos = jnp.zeros((1, x.shape[1], self.d_model), x.dtype)
        return y, pos


class WhisperPositionalEncoding(nn.Module):
    """Whisper-style: sinusoid table without the sqrt(d) input scaling
    (`embedding.py` WhisperPositionalEncoding)."""

    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 1500

    @nn.compact
    def __call__(self, x, offset: int = 0, deterministic: bool = True):
        T = x.shape[1]
        pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model))
        pos = pe[None, offset : offset + T]
        y = nn.Dropout(self.dropout_rate)(x + pos,
                                          deterministic=deterministic)
        return y, pos


class LearnablePositionalEncoding(nn.Module):
    """Trained absolute positions (`embedding.py` LearnablePositionalEncoding)."""

    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, offset: int = 0, deterministic: bool = True):
        T = x.shape[1]
        table = self.param(
            "pos_embedding", nn.initializers.normal(0.02),
            (self.max_len, self.d_model),
        )
        pos = table[None, offset : offset + T]
        y = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype)) + pos
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return y, pos
