"""Mamba-2 block and its attention-signature wrappers.

Parity targets: `wenet/transformer/mamba_att_wrapper.py` (MambaAttWrapper:
impl select by rnn_att_version/rnn_att_direction `:23-33`, GPT-2-style
residual rescale init `:55-84`) and `wenet/transformer/
mamba2_bidirectional.py:130-146` (two Mamba2 blocks + flip + average); the
Mamba2 block itself mirrors mamba_ssm's Mamba2 (in-proj -> [z, x, B, C, dt],
short causal conv + silu on (x, B, C), SSD scan, gated RMSNorm, out-proj)
re-expressed over the chunked `ops/ssd.py` kernel.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.ops import ssd as ssd_ops
from paper_accurate_fast_cheap_tpu.models.rwkv import flip_padded


class GatedRMSNorm(nn.Module):
    """RMSNorm(x * silu(z)) as in mamba_ssm's gated norm."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, z):
        x = x * nn.silu(z)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return (x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
                ) * scale.astype(x.dtype)


class Mamba2Block(nn.Module):
    d_model: int
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 64
    ssd_impl: str = "chunked"
    # sequence-parallel mode: T sharded over this mesh axis inside an
    # enclosing shard_map (causal conv takes a left halo; the SSD scan
    # uses the sp collective body)
    spmd_axis: "str | None" = None
    dt_min: float = 0.001
    dt_max: float = 0.1
    A_init_range: tuple = (1.0, 16.0)

    @nn.compact
    def __call__(self, x, state=None, return_state: bool = False):
        """state (streaming continuation): {"conv": (B, d_conv-1, Din)
        pre-activation conv inputs, "ssd": (B, H, N, P) SSD state}.
        With ``state=None, return_state=True`` the zero state is used
        (== the causal left pad), so chunked output equals the full
        forward (`tests/test_streaming.py` contract)."""
        D = self.d_model
        d_inner = self.expand * D
        H = d_inner // self.headdim
        N = self.d_state
        G = self.ngroups
        Bt, T, _ = x.shape
        dt = x.dtype

        d_in_proj = 2 * d_inner + 2 * G * N + H
        zxbcdt = nn.Dense(d_in_proj, use_bias=False, name="in_proj")(x)
        z, xs, Bc, Cc, dtr = jnp.split(
            zxbcdt,
            [d_inner, 2 * d_inner, 2 * d_inner + G * N,
             2 * d_inner + 2 * G * N],
            axis=-1,
        )

        # short causal depthwise conv on (x, B, C) jointly
        conv_in = jnp.concatenate([xs, Bc, Cc], axis=-1)
        streaming = return_state or state is not None
        new_state = {}
        if streaming and self.spmd_axis:
            raise ValueError("streaming state is per-chunk sequential — "
                             "incompatible with sequence parallelism")
        if self.spmd_axis:
            from paper_accurate_fast_cheap_tpu.parallel.sequence import (
                halo_exchange,
            )

            conv_in = halo_exchange(conv_in, self.spmd_axis,
                                    self.d_conv - 1, 0)
            conv = nn.Conv(
                conv_in.shape[-1], (self.d_conv,), padding="VALID",
                feature_group_count=conv_in.shape[-1], name="conv1d",
            )(conv_in)
        elif streaming:
            K = self.d_conv - 1
            cache = (state["conv"] if state is not None else
                     jnp.zeros((Bt, K, conv_in.shape[-1]), conv_in.dtype))
            full = jnp.concatenate([cache, conv_in], axis=1)
            conv = nn.Conv(
                full.shape[-1], (self.d_conv,), padding="VALID",
                feature_group_count=full.shape[-1], name="conv1d",
            )(full)
            new_state["conv"] = full[:, full.shape[1] - K:]
        else:
            conv = nn.Conv(
                conv_in.shape[-1], (self.d_conv,),
                padding=((self.d_conv - 1, 0),),
                feature_group_count=conv_in.shape[-1], name="conv1d",
            )(conv_in)
        conv = nn.silu(conv)
        xs, Bc, Cc = jnp.split(conv, [d_inner, d_inner + G * N], axis=-1)

        # dt bias init so softplus(dt_bias) spans [dt_min, dt_max]
        def dt_bias_init(key, shape, dtype=jnp.float32):
            u = jax.random.uniform(key, shape, jnp.float32)
            v = jnp.exp(
                u * (math.log(self.dt_max) - math.log(self.dt_min))
                + math.log(self.dt_min)
            )
            v = jnp.clip(v, 1e-4, None)
            return (v + jnp.log(-jnp.expm1(-v))).astype(dtype)

        dt_bias = self.param("dt_bias", dt_bias_init, (H,))
        dtv = jax.nn.softplus(dtr.astype(jnp.float32)
                              + dt_bias[None, None, :])

        def A_log_init(key, shape, dtype=jnp.float32):
            lo, hi = self.A_init_range
            u = jax.random.uniform(key, shape, jnp.float32, lo, hi)
            return jnp.log(u).astype(dtype)

        A_log = self.param("A_log", A_log_init, (H,))
        A = -jnp.exp(A_log.astype(jnp.float32))
        D_skip = self.param("D", nn.initializers.ones, (H,))

        if self.spmd_axis:
            from paper_accurate_fast_cheap_tpu.parallel.sequence import (
                ssd_sp_body,
            )

            y = ssd_sp_body(
                xs.reshape(Bt, T, H, self.headdim),
                dtv.astype(dt), A.astype(dt),
                Bc.reshape(Bt, T, G, N), Cc.reshape(Bt, T, G, N),
                D_skip.astype(dt), self.spmd_axis,
                chunk_size=self.chunk_size,
            ).reshape(Bt, T, d_inner)
        elif streaming:
            y, new_state["ssd"] = ssd_ops.ssd(
                xs.reshape(Bt, T, H, self.headdim),
                dtv.astype(dt), A.astype(dt),
                Bc.reshape(Bt, T, G, N), Cc.reshape(Bt, T, G, N),
                D_skip.astype(dt),
                state=None if state is None else state["ssd"],
                chunk_size=self.chunk_size, return_state=True,
                impl=self.ssd_impl,
            )
            y = y.reshape(Bt, T, d_inner)
        else:
            y = ssd_ops.ssd(
                xs.reshape(Bt, T, H, self.headdim),
                dtv.astype(dt),
                A.astype(dt),
                Bc.reshape(Bt, T, G, N),
                Cc.reshape(Bt, T, G, N),
                D_skip.astype(dt),
                chunk_size=self.chunk_size,
                impl=self.ssd_impl,
            ).reshape(Bt, T, d_inner)

        y = GatedRMSNorm(name="norm")(y, z)
        out = nn.Dense(D, use_bias=False, name="out_proj")(y)
        if return_state:
            return out, new_state
        return out


class MambaAttention(nn.Module):
    """Attention-signature wrapper: uni or bidirectional Mamba2."""

    head_size: int
    d_model: int
    n_layers: int
    direction: str = "bi"
    layer_id: int = 0
    d_state: int = 128
    chunk_size: int = 64
    ssd_impl: str = "chunked"
    spmd_axis: "str | None" = None   # T-sharded (sequence-parallel) mode

    @nn.compact
    def __call__(self, x_q, x_kv=None, mask=None, pos_emb=None, *,
                 lengths=None, deterministic: bool = True,
                 state=None, return_state: bool = False):
        x = x_q
        fwd_block = Mamba2Block(
            d_model=self.d_model, headdim=self.head_size,
            d_state=self.d_state, chunk_size=self.chunk_size,
            ssd_impl=self.ssd_impl, spmd_axis=self.spmd_axis,
            name="mamba_fwd",
        )
        if return_state or state is not None:
            if self.direction != "uni":
                raise ValueError("streaming state requires a causal "
                                 "(uni) mamba direction")
            return fwd_block(x, state=state, return_state=True)
        if self.direction == "uni":
            return fwd_block(x)
        if self.direction != "bi":
            raise ValueError(f"unknown mamba direction {self.direction!r}")
        bwd_block = Mamba2Block(
            d_model=self.d_model, headdim=self.head_size,
            d_state=self.d_state, chunk_size=self.chunk_size,
            ssd_impl=self.ssd_impl, spmd_axis=self.spmd_axis,
            name="mamba_bwd",
        )
        if self.spmd_axis:
            if lengths is not None:
                raise ValueError(
                    "spmd_axis (sequence parallelism) requires "
                    "full-length sequences (lengths=None)")
            from paper_accurate_fast_cheap_tpu.parallel.sequence import (
                flip_sharded,
            )

            xr = flip_sharded(x, self.spmd_axis)
            return (fwd_block(x)
                    + flip_sharded(bwd_block(xr), self.spmd_axis)) / 2
        xr = flip_padded(x, lengths)
        y = (fwd_block(x) + flip_padded(bwd_block(xr), lengths)) / 2
        return y
