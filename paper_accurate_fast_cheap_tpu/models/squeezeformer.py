"""Squeezeformer encoder.

Parity target: `wenet/squeezeformer/` (~1460 LoC): post-norm conformer-style
blocks (MHA -> FFN -> conv -> FFN, each with scale/bias "adaptive scale"
residuals), a temporal U-Net — time reduction (stride-2 depthwise conv) in
the middle of the stack and time recovery (upsample + residual from the
pre-reduction activations) near the end — and a conv2d subsampling variant.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models import attention as att_mod
from paper_accurate_fast_cheap_tpu.models.conformer import (
    EMB_CLASSES,
    SUBSAMPLE_CLASSES,
)
from paper_accurate_fast_cheap_tpu.models.convolution import (
    ConvolutionModule,
    PositionwiseFeedForward,
)
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


class ScaledResidual(nn.Module):
    """Adaptive scale+bias applied to the sublayer input (squeezeformer's
    'adaptive scale' trick)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.d_model,))
        bias = self.param("bias", nn.initializers.zeros, (self.d_model,))
        return x * scale + bias


class SqueezeformerBlock(nn.Module):
    """Post-norm: x -> MHA -> LN -> FFN -> LN -> conv -> LN -> FFN -> LN."""

    d_model: int
    heads: int
    linear_units: int
    cnn_kernel: int = 31
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, att_mask=None, pos_emb=None, pad_mask=None,
                 deterministic: bool = True):
        drop = lambda v: nn.Dropout(self.dropout_rate)(
            v, deterministic=deterministic
        )
        y = ScaledResidual(self.d_model, name="scale_mha")(x)
        y = att_mod.RelPositionMultiHeadedAttention(
            heads=self.heads, d_model=self.d_model,
            dropout_rate=self.attention_dropout_rate, name="attn",
        )(y, y, att_mask, pos_emb, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_mha")(x + drop(y))

        y = ScaledResidual(self.d_model, name="scale_ffn1")(x)
        y = PositionwiseFeedForward(
            self.d_model, self.linear_units, self.dropout_rate,
            name="ffn1")(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_ffn1")(x + drop(y))

        y = ScaledResidual(self.d_model, name="scale_conv")(x)
        y = ConvolutionModule(
            self.d_model, self.cnn_kernel, norm="layer_norm",
            name="conv")(y, pad_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_conv")(x + drop(y))

        y = ScaledResidual(self.d_model, name="scale_ffn2")(x)
        y = PositionwiseFeedForward(
            self.d_model, self.linear_units, self.dropout_rate,
            name="ffn2")(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="ln_ffn2")(x + drop(y))


class SqueezeformerEncoder(nn.Module):
    input_size: int = 80
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 12
    # int or ascending list (`squeezeformer/encoder.py:43-44,96-108`):
    # nested multi-level temporal U-Net
    reduce_idx: Any = 5          # time reduction before these block idxs
    recover_idx: Any = 11        # time recovery before these block idxs
    cnn_module_kernel: int = 31
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
        xs, out_lens = sub(xs, xs_lens, deterministic=deterministic)
        out_lens = jnp.minimum(out_lens, xs.shape[1])
        xs, pos_emb = EMB_CLASSES[self.pos_enc_layer_type](
            d_model=self.output_size, dropout_rate=self.dropout_rate,
            name="pos_enc",
        )(xs, deterministic=deterministic)

        def block(i, x, mask_t, pe, lens):
            pad_mask = mask_utils.make_pad_mask(lens, x.shape[1])
            return SqueezeformerBlock(
                d_model=self.output_size, heads=self.attention_heads,
                linear_units=self.linear_units,
                cnn_kernel=self.cnn_module_kernel,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                name=f"block_{i}",
            )(x, pad_mask[:, None, :], pe, pad_mask,
              deterministic=deterministic)

        reduce_idx = ([self.reduce_idx] if isinstance(self.reduce_idx, int)
                      else list(self.reduce_idx or []))
        recover_idx = ([self.recover_idx]
                       if isinstance(self.recover_idx, int)
                       else list(self.recover_idx or []))
        assert len(reduce_idx) == len(recover_idx)

        xs = nn.LayerNorm(epsilon=1e-5, name="preln")(xs)
        lens = out_lens
        pe = pos_emb
        # nested multi-level U-Net: a stack of saved (xs, lens, pe)
        # (`encoder.py:208-236` recover_activations)
        saved = []
        for i in range(self.num_blocks):
            if i in reduce_idx:
                level = len(saved)
                saved.append((xs, lens, pe))
                xs = nn.Conv(
                    self.output_size, (5,), strides=(2,),
                    padding=((2, 2),),
                    feature_group_count=self.output_size,
                    name=f"time_reduce_{level}",
                )(xs)
                lens = (lens + 1) // 2
                pe = pe[:, : xs.shape[1]]
            if i in recover_idx and saved:
                level = len(saved) - 1
                rec_xs, rec_lens, rec_pe = saved.pop()
                # upsample (repeat) + projection + residual, then zero the
                # padded tail (`encoder.py:228-236`)
                up = jnp.repeat(xs, 2, axis=1)[:, : rec_xs.shape[1]]
                up = nn.Dense(self.output_size,
                              name=f"time_recover_{level}")(up)
                xs = rec_xs + up
                lens, pe = rec_lens, rec_pe
                valid = mask_utils.make_pad_mask(lens, xs.shape[1])
                xs = jnp.where(valid[..., None], xs, 0.0)
            xs = block(i, xs, None, pe[:, : xs.shape[1]], lens)
        xs = nn.LayerNorm(epsilon=1e-5, name="final_norm")(xs)
        return xs, lens
