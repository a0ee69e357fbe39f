"""Conformer convolution module.

Parity target: `wenet/transformer/convolution.py` — pointwise(2C) -> GLU ->
depthwise(kernel 31; causal left-pad k-1 vs symmetric pad, `:49-60`) ->
norm(batch_norm | layer_norm) -> SiLU -> pointwise -> out, with the padding
mask zeroed before the depthwise conv so pad frames cannot leak through the
receptive field (`:89-144`).
"""
from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 31
    norm: str = "layer_norm"  # paper configs use layer_norm
    causal: bool = False
    bias: bool = True
    # sequence-parallel mode: when set (inside a shard_map with T sharded
    # over this axis), the depthwise conv takes its (k-1)/2-frame
    # boundary context from neighbour shards via halo exchange
    spmd_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask_pad=None, *, deterministic: bool = True,
                 cache=None, return_cache: bool = False):
        """x: (B, T, C); mask_pad: bool (B, T) True=valid.  For causal
        streaming, ``cache`` holds the previous chunk's last (kernel-1)
        post-GLU frames (`convolution.py:89-144` cnn_cache role)."""
        if self.spmd_axis and (mask_pad is not None or self.causal
                               or return_cache):
            raise ValueError("spmd_axis conv requires full-length "
                             "non-causal sequences without caches")
        if mask_pad is not None:
            x = jnp.where(mask_pad[..., None], x, 0.0)
        y = nn.Dense(2 * self.channels, use_bias=self.bias)(x)  # pointwise 1
        a, b = jnp.split(y, 2, axis=-1)
        y = a * nn.sigmoid(b)  # GLU

        if self.spmd_axis:
            from paper_accurate_fast_cheap_tpu.parallel.sequence import (
                halo_exchange,
            )

            h = (self.kernel_size - 1) // 2
            y = halo_exchange(y, self.spmd_axis, h, h)
            y = nn.Conv(
                self.channels, (self.kernel_size,), padding="VALID",
                feature_group_count=self.channels, use_bias=self.bias,
            )(y)
            if self.norm == "layer_norm":
                y = nn.LayerNorm(epsilon=1e-5)(y)
            else:
                y = nn.BatchNorm(use_running_average=deterministic,
                                 epsilon=1e-5)(y)
            y = nn.silu(y)
            return nn.Dense(self.channels, use_bias=self.bias)(y)

        new_cache = None
        if self.causal:
            lorder = self.kernel_size - 1
            if return_cache:
                if cache is None:
                    cache = jnp.zeros(
                        (y.shape[0], lorder, self.channels), y.dtype
                    )
                y_in = jnp.concatenate([cache.astype(y.dtype), y], axis=1)
                pad = (0, 0)
                new_cache = y_in[:, -lorder:]
                y = y_in
            else:
                pad = (lorder, 0)
        else:
            assert (self.kernel_size - 1) % 2 == 0
            if return_cache:
                raise ValueError("streaming conv cache requires causal=True")
            h = (self.kernel_size - 1) // 2
            pad = (h, h)
        y = nn.Conv(
            self.channels,
            (self.kernel_size,),
            padding=(pad,),
            feature_group_count=self.channels,
            use_bias=self.bias,
        )(y)

        if self.norm == "layer_norm":
            y = nn.LayerNorm(epsilon=1e-5)(y)
        else:
            y = nn.BatchNorm(use_running_average=deterministic, epsilon=1e-5)(y)
        y = nn.silu(y)
        y = nn.Dense(self.channels, use_bias=self.bias)(y)  # pointwise 2
        if mask_pad is not None:
            y = jnp.where(mask_pad[..., None], y, 0.0)
        if return_cache:
            return y, new_cache
        return y


class _DenseParams(nn.Module):
    """Param holder with `nn.Dense`'s exact tree layout/init.

    Lets `PositionwiseFeedForward` hand raw (kernel, bias) arrays to the
    fused Pallas FFN kernel while existing checkpoints / converted
    reference weights (Dense_0/Dense_1 scopes) keep loading unchanged.
    """

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,))
        return k, b


class PositionwiseFeedForward(nn.Module):
    """FFN: Dense -> activation -> dropout -> Dense
    (`wenet/transformer/positionwise_feed_forward.py:20-56`).

    ``impl``: 'xla' (default) or 'pallas' (the fused kernel in
    `ops/ffn_pallas.py`).  MEASURED 2026-08-20 on the v5e (18000x512
    rows, H=2048, bf16, serial-carry loop): XLA 1.18 ms/call vs pallas
    1.35-2.37 across row blocks — XLA already keeps the (R, H) hidden
    activation in the v5e's 128 MB VMEM, so the kernel's
    traffic-elimination premise does not pay on this part; encoder-level
    A/B agreed (7607x -> 7409x at b8/c9000).  The kernel stays as a
    tested fallback for narrow-VMEM parts ('auto' resolves to the
    PAFC_FFN_IMPL env var, else 'xla').  Both paths share the same
    parameters; numerics differ only by f32-vs-bf16 rounding of the
    bias/activation stage (exact in f32).
    """

    d_model: int
    hidden: int
    dropout_rate: float = 0.1
    activation: str = "swish"
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from paper_accurate_fast_cheap_tpu.ops import ffn_pallas

        act = {"swish": nn.silu, "relu": nn.relu, "gelu": nn.gelu,
               "hardtanh": lambda v: jnp.clip(v, -1.0, 1.0)}[self.activation]
        k1, b1 = _DenseParams(self.hidden, name="Dense_0")(x.shape[-1])
        k2, b2 = _DenseParams(self.d_model, name="Dense_1")(self.hidden)
        drop_active = (not deterministic) and self.dropout_rate > 0.0
        impl = self.impl
        if impl == "auto":  # bench A/B escape hatch, no config plumbing
            impl = os.environ.get("PAFC_FFN_IMPL", "xla")
        use_pallas = impl == "pallas" and not drop_active and (
            ffn_pallas.supported(x.shape, x.shape[-1], self.hidden,
                                 x.dtype))
        if use_pallas:
            return ffn_pallas.fused_ffn(x, k1, b1, k2, b2, self.activation)
        y = act(jnp.dot(x, k1) + b1)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return jnp.dot(y, k2) + b2


class MoEFFNLayer(nn.Module):
    """Token-choice top-k mixture-of-experts FFN
    (`positionwise_feed_forward.py:58-115`; unused by the paper configs but
    part of the framework surface).  TPU-style: dense dispatch via one-hot
    combine weights (static shapes) instead of gather/scatter."""

    d_model: int
    hidden: int
    n_experts: int = 4
    n_expert_per_token: int = 2
    activation: str = "swish"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        act = {"swish": nn.silu, "relu": nn.relu,
               "gelu": nn.gelu}[self.activation]
        B, T, D = x.shape
        gate_logits = nn.Dense(self.n_experts, use_bias=False,
                               name="gate")(x)          # (B, T, E)
        topv, topi = jax.lax.top_k(gate_logits, self.n_expert_per_token)
        weights = jax.nn.softmax(topv, axis=-1)          # (B, T, K)
        # combine weights as dense (B, T, E)
        comb = jnp.zeros_like(gate_logits)
        for k in range(self.n_expert_per_token):
            comb = comb + weights[..., k : k + 1] * jax.nn.one_hot(
                topi[..., k], self.n_experts
            )
        # all experts on all tokens (dense MoE; efficient for small E)
        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (self.n_experts, D, self.hidden))
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (self.n_experts, self.hidden, D))
        h = act(jnp.einsum("btd,edh->bteh", x, w1))
        out = jnp.einsum("bteh,ehd->bted", h, w2)
        return jnp.einsum("bted,bte->btd", out, comb)
