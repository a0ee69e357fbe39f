"""Efficient Conformer encoder.

Parity target: `wenet/efficient_conformer/` (~1210 LoC): grouped relative
rel-pos attention (attend over frame groups to cut the T^2 term) and
progressive downsampling — stride-2 convolution modules at chosen layers
with average-pooled residuals, so deep layers run at 1/2 or 1/4 frame rate.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models import attention as att_mod
from paper_accurate_fast_cheap_tpu.models.conformer import (
    EMB_CLASSES,
    SUBSAMPLE_CLASSES,
)
from paper_accurate_fast_cheap_tpu.models.convolution import (
    PositionwiseFeedForward,
)
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


class GroupedRelPositionAttention(att_mod.MultiHeadedAttention):
    """Attention over concatenated frame groups: (B, T, D) -> groups of
    ``group_size`` frames attend as single units (head dim grows by the
    group factor), cutting the score matrix to (T/g)^2."""

    group_size: int = 3

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.d_model, use_bias=False)
        g = self.group_size
        self.pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(),
            (self.heads, self.d_k * g),
        )
        self.pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(),
            (self.heads, self.d_k * g),
        )

    def __call__(self, x_q, x_kv, mask=None, pos_emb=None, *,
                 deterministic: bool = True):
        g = self.group_size
        B, T, _ = x_q.shape
        q, k, v = self._qkv(x_q, x_kv)            # (B, T, H, Dk)
        p = (
            self.linear_pos(pos_emb).reshape(-1, pos_emb.shape[1],
                                             self.heads, self.d_k)
            if pos_emb is not None else jnp.zeros_like(k)
        )
        p = jnp.broadcast_to(p, k.shape)
        pad = (-T) % g
        Tg = (T + pad) // g

        def group(a):  # (B, T, H, Dk) -> (B, Tg, H, Dk*g)
            a = jnp.pad(a, ((0, 0), (0, pad), (0, 0), (0, 0)))
            a = a.reshape(B, Tg, g, self.heads, self.d_k)
            return a.transpose(0, 1, 3, 2, 4).reshape(
                B, Tg, self.heads, self.d_k * g)

        qg, kg, vg, pg = map(group, (q, k, v, p))
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.d_k * g, jnp.float32)
                               ).astype(q.dtype)
        scores = (
            jnp.einsum("bthd,bshd->bhts", qg + self.pos_bias_u[None, None],
                       kg)
            + jnp.einsum("bthd,bshd->bhts",
                         qg + self.pos_bias_v[None, None], pg)
        ) * scale
        if mask is not None:
            m = mask[:, 0] if mask.ndim == 3 else mask
            mg = jnp.pad(m, ((0, 0), (0, pad)))
            mg = mg.reshape(B, Tg, g).any(axis=-1)
            scores = jnp.where(mg[:, None, None, :], scores,
                               att_mod.NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", probs, vg)
        out = out.reshape(B, Tg, self.heads, g, self.d_k)
        out = out.transpose(0, 1, 3, 2, 4).reshape(
            B, Tg * g, self.heads * self.d_k)[:, :T]
        return self.linear_out(out)


class EfficientConformerLayer(nn.Module):
    d_model: int
    heads: int
    linear_units: int
    cnn_kernel: int = 15
    stride: int = 1            # >1: downsampling layer
    group_size: int = 3
    use_grouped_attn: bool = True   # `encoder.py:159`: per-layer choice
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, att_mask=None, pos_emb=None, pad_mask=None,
                 deterministic: bool = True):
        drop = lambda v: nn.Dropout(self.dropout_rate)(
            v, deterministic=deterministic
        )
        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm_ff_macaron")(x)
        y = PositionwiseFeedForward(self.d_model, self.linear_units,
                                    self.dropout_rate,
                                    name="feed_forward_macaron")(
            y, deterministic=deterministic)
        x = res + 0.5 * drop(y)

        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm_mha")(x)
        if self.use_grouped_attn:
            y = GroupedRelPositionAttention(
                heads=self.heads, d_model=self.d_model,
                dropout_rate=self.attention_dropout_rate,
                group_size=self.group_size, name="attn",
            )(y, y, att_mask, pos_emb, deterministic=deterministic)
        else:
            y = att_mod.RelPositionMultiHeadedAttention(
                heads=self.heads, d_model=self.d_model,
                dropout_rate=self.attention_dropout_rate, name="attn",
            )(y, y, att_mask, pos_emb, deterministic=deterministic)
        x = res + drop(y)

        # conv module, optionally strided (downsampling)
        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm_conv")(x)
        if pad_mask is not None:
            y = jnp.where(pad_mask[..., None], y, 0.0)
        y2 = nn.Dense(2 * self.d_model, name="pw1")(y)
        a, b = jnp.split(y2, 2, axis=-1)
        y2 = a * nn.sigmoid(b)
        h = (self.cnn_kernel - 1) // 2
        y2 = nn.Conv(self.d_model, (self.cnn_kernel,),
                     strides=(self.stride,), padding=((h, h),),
                     feature_group_count=self.d_model, name="dw")(y2)
        y2 = nn.LayerNorm(epsilon=1e-5, name="conv_ln")(y2)
        y2 = nn.silu(y2)
        y2 = nn.Dense(self.d_model, name="pw2")(y2)
        if self.stride > 1:
            # average-pool the residual to the new rate
            pad = (-res.shape[1]) % self.stride
            r = jnp.pad(res, ((0, 0), (0, pad), (0, 0)))
            r = r.reshape(r.shape[0], -1, self.stride,
                          self.d_model).mean(axis=2)
            res = r[:, : y2.shape[1]]
        x = res + drop(y2)

        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm_ff")(x)
        y = PositionwiseFeedForward(self.d_model, self.linear_units,
                                    self.dropout_rate,
                                    name="feed_forward")(
            y, deterministic=deterministic)
        x = res + 0.5 * drop(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)


class EfficientConformerEncoder(nn.Module):
    input_size: int = 80
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 12
    stride_layers: Sequence[int] = (3, 7)   # downsample at these layers
    strides: Optional[Sequence[int]] = None  # per-stride factors (def 2)
    group_layers: Optional[Sequence[int]] = None  # grouped-attn layers
                                                  # (None: all layers)
    group_size: int = 3
    cnn_module_kernel: int = 15
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    pos_enc_layer_type: str = "rel_pos"

    @nn.compact
    def __call__(self, xs, xs_lens, *, deterministic: bool = True):
        sub = SUBSAMPLE_CLASSES[self.input_layer](
            idim=self.input_size, odim=self.output_size,
            dropout_rate=self.dropout_rate, name="embed",
        )
        xs, lens = sub(xs, xs_lens, deterministic=deterministic)
        lens = jnp.minimum(lens, xs.shape[1])
        xs, pos_emb = EMB_CLASSES[self.pos_enc_layer_type](
            d_model=self.output_size, dropout_rate=self.dropout_rate,
            name="pos_enc",
        )(xs, deterministic=deterministic)
        stride_layers = tuple(self.stride_layers)
        strides = tuple(self.strides) if self.strides is not None \
            else (2,) * len(stride_layers)
        assert len(strides) == len(stride_layers)
        for i in range(self.num_blocks):
            stride = 1
            if i in stride_layers:
                stride = strides[stride_layers.index(i)]
            grouped = (self.group_layers is None
                       or i in tuple(self.group_layers))
            pad_mask = mask_utils.make_pad_mask(lens, xs.shape[1])
            xs = EfficientConformerLayer(
                d_model=self.output_size, heads=self.attention_heads,
                linear_units=self.linear_units,
                cnn_kernel=self.cnn_module_kernel, stride=stride,
                group_size=self.group_size, use_grouped_attn=grouped,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                name=f"layer_{i}",
            )(xs, pad_mask[:, None, :], pos_emb[:, : xs.shape[1]],
              pad_mask, deterministic=deterministic)
            if stride > 1:
                lens = (lens + stride - 1) // stride
        return xs, lens
