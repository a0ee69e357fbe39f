"""Branchformer / E-Branchformer encoders.

Parity targets: `wenet/branchformer/` (encoder + cgMLP, 758 LoC) and
`wenet/e_branchformer/` (508 LoC): parallel attention + convolutional-gating
MLP branches merged per layer (concat + projection; e-branchformer adds
macaron FFNs and a depthwise-conv merge), selectable via
`WENET_ENCODER_CLASSES` (`wenet/utils/init_model.py:50-96`).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models import attention as att_mod
from paper_accurate_fast_cheap_tpu.models import embedding as emb_mod
from paper_accurate_fast_cheap_tpu.models.conformer import (
    EMB_CLASSES,
    SUBSAMPLE_CLASSES,
)
from paper_accurate_fast_cheap_tpu.models.convolution import (
    PositionwiseFeedForward,
)
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils


class ConvolutionalGatingMLP(nn.Module):
    """cgMLP: Dense(2h) -> split -> [LayerNorm + depthwise conv] gate ->
    elementwise product -> Dense(d)."""

    d_model: int
    hidden: int = 2048
    kernel_size: int = 31
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, pad_mask=None, *, deterministic: bool = True):
        y = nn.Dense(self.hidden * 2, name="channel_proj1")(x)
        y = nn.gelu(y)
        a, b = jnp.split(y, 2, axis=-1)
        b = nn.LayerNorm(epsilon=1e-5)(b)
        if pad_mask is not None:
            b = jnp.where(pad_mask[..., None], b, 0.0)
        h = (self.kernel_size - 1) // 2
        b = nn.Conv(self.hidden, (self.kernel_size,), padding=((h, h),),
                    feature_group_count=self.hidden, name="depthwise")(b)
        y = a * b
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return nn.Dense(self.d_model, name="channel_proj2")(y)


class BranchformerLayer(nn.Module):
    """One branchformer block (`branchformer/encoder_layer.py`):
    attention + cgMLP branches, merge by concat / learned_ave /
    fixed_ave (`:170-219`), optional attention-branch dropout
    (`:176-180`), stochastic depth (`:142-146`), optional single-branch
    operation (use_attn / use_cgmlp), e-branchformer extras."""

    d_model: int
    heads: int
    cgmlp_hidden: int
    kernel_size: int = 31
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    merge_conv_kernel: int = 0  # >0: e-branchformer depthwise merge
    use_ffn: bool = False       # e-branchformer macaron FFNs
    ffn_hidden: int = 2048
    use_attn: bool = True
    use_cgmlp: bool = True
    merge_method: str = "concat"    # concat | learned_ave | fixed_ave
    cgmlp_weight: float = 0.5       # fixed_ave only
    attn_branch_drop_rate: float = 0.0   # learned_ave only, training
    stochastic_depth_rate: float = 0.0

    @nn.compact
    def __call__(self, x, att_mask=None, pos_emb=None, pad_mask=None,
                 lengths=None, deterministic: bool = True):
        drop = lambda v: nn.Dropout(self.dropout_rate)(
            v, deterministic=deterministic
        )
        # stochastic depth (`encoder_layer.py:142-146`): skip the whole
        # layer with prob p during training, rescale residual by 1/(1-p)
        coeff = 1.0
        skip_layer = False
        if not deterministic and self.stochastic_depth_rate > 0:
            skip_layer = jax.random.bernoulli(
                self.make_rng("dropout"), self.stochastic_depth_rate)
            coeff = 1.0 / (1.0 - self.stochastic_depth_rate)
        x_in = x
        if self.use_ffn:
            res = x
            y = nn.LayerNorm(epsilon=1e-5, name="norm_ff_macaron")(x)
            y = PositionwiseFeedForward(
                self.d_model, self.ffn_hidden, self.dropout_rate,
                name="feed_forward_macaron")(y, deterministic=deterministic)
            x = res + coeff * 0.5 * drop(y)

        res = x
        y1 = y2 = None
        if self.use_attn:
            y1 = nn.LayerNorm(epsilon=1e-5, name="norm_mha")(x)
            y1 = att_mod.RelPositionMultiHeadedAttention(
                heads=self.heads, d_model=self.d_model,
                dropout_rate=self.attention_dropout_rate, name="attn",
            )(y1, y1, att_mask, pos_emb, deterministic=deterministic)
            y1 = drop(y1)
        if self.use_cgmlp:
            y2 = nn.LayerNorm(epsilon=1e-5, name="norm_mlp")(x)
            y2 = ConvolutionalGatingMLP(
                d_model=self.d_model, hidden=self.cgmlp_hidden,
                kernel_size=self.kernel_size,
                dropout_rate=self.dropout_rate, name="cgmlp",
            )(y2, pad_mask, deterministic=deterministic)
            y2 = drop(y2)

        if y1 is not None and y2 is not None:
            if self.merge_method == "concat":
                merged = jnp.concatenate([y1, y2], axis=-1)
                if self.merge_conv_kernel > 0:
                    h = (self.merge_conv_kernel - 1) // 2
                    merged = merged + nn.Conv(
                        2 * self.d_model, (self.merge_conv_kernel,),
                        padding=((h, h),),
                        feature_group_count=2 * self.d_model,
                        name="merge_conv",
                    )(merged)
                m = nn.Dense(self.d_model, name="merge_proj")(merged)
            elif self.merge_method == "learned_ave":
                # attention-pooled per-branch scalar weights
                # (`encoder_layer.py:180-213`)
                scale = self.d_model ** 0.5

                def pooled_weight(y, proj_name, wname):
                    score = nn.Dense(1, name=proj_name)(y)[..., 0] / scale
                    if pad_mask is not None:
                        score = jnp.where(pad_mask, score, -jnp.inf)
                    p = jax.nn.softmax(score, axis=-1)
                    if pad_mask is not None:
                        p = jnp.where(pad_mask, p, 0.0)
                    pooled = jnp.einsum("bt,btd->bd", p, y)
                    return nn.Dense(1, name=wname)(pooled)  # (B, 1)

                w1 = pooled_weight(y1, "pooling_proj1", "weight_proj1")
                w2 = pooled_weight(y2, "pooling_proj2", "weight_proj2")
                mw = jax.nn.softmax(
                    jnp.concatenate([w1, w2], axis=-1), axis=-1)
                w1, w2 = mw[:, 0:1, None], mw[:, 1:2, None]
                if not deterministic and self.attn_branch_drop_rate > 0:
                    drop_attn = jax.random.bernoulli(
                        self.make_rng("dropout"),
                        self.attn_branch_drop_rate)
                    w1 = jnp.where(drop_attn, 0.0, w1)
                    w2 = jnp.where(drop_attn, 1.0, w2)
                m = nn.Dense(self.d_model, name="merge_proj")(
                    w1 * y1 + w2 * y2)
            elif self.merge_method == "fixed_ave":
                m = nn.Dense(self.d_model, name="merge_proj")(
                    (1.0 - self.cgmlp_weight) * y1
                    + self.cgmlp_weight * y2)
            else:
                raise ValueError(
                    f"unknown merge method {self.merge_method!r}")
        else:
            m = nn.Dense(self.d_model, name="merge_proj")(
                y1 if y2 is None else y2)
        x = res + coeff * drop(m)

        if self.use_ffn:
            res = x
            y = nn.LayerNorm(epsilon=1e-5, name="norm_ff")(x)
            y = PositionwiseFeedForward(
                self.d_model, self.ffn_hidden, self.dropout_rate,
                name="feed_forward")(y, deterministic=deterministic)
            x = res + coeff * 0.5 * drop(y)
        out = nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)
        if not deterministic and self.stochastic_depth_rate > 0:
            out = jnp.where(skip_layer, x_in, out)
        return out


class BranchformerEncoder(nn.Module):
    input_size: int = 80
    output_size: int = 256
    attention_heads: int = 4
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    num_blocks: int = 12
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    pos_enc_layer_type: str = "rel_pos"
    # e-branchformer extras
    use_ffn: bool = False
    linear_units: int = 2048
    merge_conv_kernel: int = 0
    # branch controls (`branchformer/encoder.py:44-119`); floats broadcast
    # to all layers, lists are per-layer
    use_attn: bool = True
    use_cgmlp: bool = True
    merge_method: str = "concat"
    cgmlp_weight: Any = 0.5
    attn_branch_drop_rate: Any = 0.0
    stochastic_depth_rate: Any = 0.0

    @nn.compact
    def __call__(self, xs, xs_lens, *, deterministic: bool = True):
        sub = SUBSAMPLE_CLASSES[self.input_layer](
            idim=self.input_size, odim=self.output_size,
            dropout_rate=self.dropout_rate, name="embed",
        )
        xs, out_lens = sub(xs, xs_lens, deterministic=deterministic)
        out_lens = jnp.minimum(out_lens, xs.shape[1])
        xs, pos_emb = EMB_CLASSES[self.pos_enc_layer_type](
            d_model=self.output_size,
            dropout_rate=self.positional_dropout_rate, name="pos_enc",
        )(xs, deterministic=deterministic)
        T = xs.shape[1]
        pad_mask = mask_utils.make_pad_mask(out_lens, T)
        att_mask = pad_mask[:, None, :]
        def per_layer(v, i):
            return v[i] if isinstance(v, (list, tuple)) else v

        for i in range(self.num_blocks):
            xs = BranchformerLayer(
                d_model=self.output_size, heads=self.attention_heads,
                cgmlp_hidden=self.cgmlp_linear_units,
                kernel_size=self.cgmlp_conv_kernel,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                merge_conv_kernel=self.merge_conv_kernel,
                use_ffn=self.use_ffn, ffn_hidden=self.linear_units,
                use_attn=self.use_attn, use_cgmlp=self.use_cgmlp,
                merge_method=self.merge_method,
                cgmlp_weight=per_layer(self.cgmlp_weight, i),
                attn_branch_drop_rate=per_layer(
                    self.attn_branch_drop_rate, i),
                stochastic_depth_rate=per_layer(
                    self.stochastic_depth_rate, i),
                name=f"layer_{i}",
            )(xs, att_mask, pos_emb, pad_mask, out_lens,
              deterministic=deterministic)
        return xs, out_lens


def EBranchformerEncoder(**kw):
    """E-Branchformer = branchformer + macaron FFNs + conv merge."""
    kw.setdefault("use_ffn", True)
    kw.setdefault("merge_conv_kernel", 3)
    return BranchformerEncoder(**kw)
