"""Feature subsampling front blocks.

Parity targets: `wenet/transformer/subsampling.py` — LinearNoSubsampling,
Conv1dSubsampling2, Conv2dSubsampling4 (`:172-227`, the paper's "ds4":
two stride-2 3x3 convs + linear, right_context=6, rate=4),
Conv2dSubsampling6/8.  Convs run in NHWC (TPU-native layout).
"""
from __future__ import annotations

from typing import Optional, Tuple

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

    ``spmd_axis`` (inside an enclosing `shard_map` with T sharded over
    that mesh axis) computes the ds4 boundary with a 6-frame right halo
    (`right_context`): global output j reads inputs [4j, 4j+6], and with
    T_loc % 4 == 0 the halo'd VALID convs yield exactly T_loc/4 outputs
    per shard, bit-matching the unsharded op on every frame that exists
    globally (the final shard's tail frames past the global output
    length read zero-halo and are masked by the returned lengths).
    """

    idim: int
    odim: int
    dropout_rate: float = 0.1
    subsampling_rate: int = 4
    right_context: int = 6
    spmd_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        if self.spmd_axis:
            from paper_accurate_fast_cheap_tpu.parallel.sequence import (
                halo_exchange,
            )

            if x.shape[1] % 4:
                raise ValueError(
                    f"sequence-parallel ds4 needs the local window "
                    f"({x.shape[1]}) divisible by 4")
            t_out = x.shape[1] // 4
            x = halo_exchange(x, self.spmd_axis, 0, self.right_context)
        y = x[..., None]
        y = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(y)
        y = nn.relu(y)
        y = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(y)
        y = nn.relu(y)
        b, t, f, c = y.shape
        y = nn.Dense(self.odim)(y.reshape(b, t, f * c))
        if self.spmd_axis:
            y = y[:, :t_out]
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
