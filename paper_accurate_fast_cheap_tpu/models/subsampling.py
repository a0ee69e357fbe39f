"""Feature subsampling front blocks.

Parity targets: `wenet/transformer/subsampling.py` — LinearNoSubsampling,
Conv1dSubsampling2, Conv2dSubsampling4 (`:172-227`, the paper's "ds4":
two stride-2 3x3 convs + linear, right_context=6, rate=4),
Conv2dSubsampling6/8.  Convs run in NHWC (TPU-native layout).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class LinearNoSubsampling(nn.Module):
    """Linear + LayerNorm, rate 1 (`subsampling.py:38-76`)."""

    idim: int
    odim: int
    dropout_rate: float = 0.1
    subsampling_rate: int = 1
    right_context: int = 0

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        y = nn.Dense(self.odim)(x)
        y = nn.LayerNorm(epsilon=1e-5)(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return y, lengths


class Conv2dSubsampling4(nn.Module):
    """Two stride-2 3x3 ReLU convs over (time, freq), then Dense.

    Output time length: ((T - 1) // 2 - 1) // 2; frequency axis collapses
    into channels for the final Dense (odim * (((idim-1)//2-1)//2)).
    """

    idim: int
    odim: int
    dropout_rate: float = 0.1
    subsampling_rate: int = 4
    right_context: int = 6

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        # x: (B, T, idim) -> NHWC (B, T, idim, 1)
        y = x[..., None]
        y = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(y)
        y = nn.relu(y)
        y = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(y)
        y = nn.relu(y)
        b, t, f, c = y.shape
        y = nn.Dense(self.odim)(y.reshape(b, t, f * c))
        new_lengths = ((lengths - 1) // 2 - 1) // 2
        return y, jnp.maximum(new_lengths, 0)


class Conv2dSubsampling6(nn.Module):
    """Conv stride 2 then stride 3 (rate 6, `subsampling.py:230-267`)."""

    idim: int
    odim: int
    dropout_rate: float = 0.1
    subsampling_rate: int = 6
    right_context: int = 10

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        y = x[..., None]
        y = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(y)
        y = nn.relu(y)
        y = nn.Conv(self.odim, (5, 5), strides=(3, 3), padding="VALID")(y)
        y = nn.relu(y)
        b, t, f, c = y.shape
        y = nn.Dense(self.odim)(y.reshape(b, t, f * c))
        new_lengths = ((lengths - 1) // 2 - 2) // 3
        return y, jnp.maximum(new_lengths, 0)


class Conv2dSubsampling8(nn.Module):
    """Three stride-2 convs (rate 8, `subsampling.py:270-311`)."""

    idim: int
    odim: int
    dropout_rate: float = 0.1
    subsampling_rate: int = 8
    right_context: int = 14

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        y = x[..., None]
        for _ in range(3):
            y = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(y)
            y = nn.relu(y)
        b, t, f, c = y.shape
        y = nn.Dense(self.odim)(y.reshape(b, t, f * c))
        new_lengths = (((lengths - 1) // 2 - 1) // 2 - 1) // 2
        return y, jnp.maximum(new_lengths, 0)


class Conv1dSubsampling2(nn.Module):
    """1-D conv rate 2 (`subsampling.py:120-169`, used by squeezeformer)."""

    idim: int
    odim: int
    dropout_rate: float = 0.1
    subsampling_rate: int = 2
    right_context: int = 4

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        y = nn.Conv(self.odim, (3,), strides=(2,), padding="VALID")(x)
        y = nn.relu(y)
        new_lengths = (lengths - 1) // 2
        return y, jnp.maximum(new_lengths, 0)
