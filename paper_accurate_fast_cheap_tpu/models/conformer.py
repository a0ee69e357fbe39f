"""Conformer / Transformer encoders with a swappable attention registry.

Parity targets: `wenet/transformer/encoder.py` (BaseEncoder.forward
`:117-149`, ConformerEncoder `:453-632` incl. the per-attention-type
constructor arg tuples `:525-569`) and `wenet/transformer/encoder_layer.py`
(ConformerEncoderLayer ordering `:114-260`: macaron-FFN*0.5 -> attention ->
conv -> FFN*0.5 -> final norm, pre-norm residuals, LayerNorm eps 1e-5).

Attention registry mirrors `WENET_ATTENTION_CLASSES`
(`wenet/utils/class_utils.py:77-89`): 'selfattn', 'rel_selfattn',
'rwkv_tmix60', 'rwkv_tmix60_bidirectional' (+'2' perf alias),
'rwkv_tmix60_dir_layer_drop', 'rwkv_tmix60_dir_layer_drop_both',
'mamba_att', 'limited_rel_selfattn'.

TPU-first notes: layers are plain flax modules unrolled at trace time (12-30
blocks compile into one XLA program); optional remat per layer trades FLOPs
for HBM on long sequences; everything takes (features, lengths) with static
shapes and boolean masks.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models import attention as att_mod
from paper_accurate_fast_cheap_tpu.models import embedding as emb_mod
from paper_accurate_fast_cheap_tpu.models import subsampling as sub_mod
from paper_accurate_fast_cheap_tpu.models.convolution import (
    ConvolutionModule,
    PositionwiseFeedForward,
)
from paper_accurate_fast_cheap_tpu.models.rwkv import RWKVAttention
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils

SUBSAMPLE_CLASSES = {
    "linear": sub_mod.LinearNoSubsampling,
    "conv1d2": sub_mod.Conv1dSubsampling2,
    "conv2d": sub_mod.Conv2dSubsampling4,
    "conv2d6": sub_mod.Conv2dSubsampling6,
    "conv2d8": sub_mod.Conv2dSubsampling8,
}

EMB_CLASSES = {
    "abs_pos": emb_mod.PositionalEncoding,
    "rel_pos": emb_mod.RelPositionalEncoding,
    "no_pos": emb_mod.NoPositionalEncoding,
}


def _make_attention(
    layer_type: str,
    heads: int,
    d_model: int,
    dropout_rate: float,
    key_bias: bool,
    num_blocks: int,
    layer_id: int,
    rwkv_conf: dict,
):
    if layer_type == "selfattn":
        return att_mod.MultiHeadedAttention(
            heads=heads, d_model=d_model, dropout_rate=dropout_rate,
            key_bias=key_bias,
        )
    if layer_type == "rel_selfattn":
        return att_mod.RelPositionMultiHeadedAttention(
            heads=heads, d_model=d_model, dropout_rate=dropout_rate,
            key_bias=key_bias,
        )
    if layer_type == "espnet_rel_selfattn":
        return att_mod.ESPnetRelPositionMultiHeadedAttention(
            heads=heads, d_model=d_model, dropout_rate=dropout_rate,
            key_bias=key_bias,
        )
    if layer_type == "limited_rel_selfattn":
        from paper_accurate_fast_cheap_tpu.models.lca import (
            LimitedRelPositionAttention,
        )

        return LimitedRelPositionAttention(
            heads=heads, d_model=d_model, dropout_rate=dropout_rate,
            key_bias=key_bias,
            context_size=rwkv_conf.get("att_context_size", (256, 256)),
            global_tokens=rwkv_conf.get("global_tokens", 0),
            global_tokens_spacing=rwkv_conf.get("global_tokens_spacing", 1),
        )
    if layer_type.startswith("rwkv_tmix60") or layer_type == "rwkv_tmix70":
        direction = {
            "rwkv_tmix60": "uni",
            "rwkv_tmix60_bidirectional": "bi",
            "rwkv_tmix60_bidirectional2": "bi",
            "rwkv_tmix60_dir_layer_drop": "dirdrop",
            "rwkv_tmix60_dir_layer_drop_both": "dirdrop_both",
        }.get(layer_type)
        if direction is None:
            raise NotImplementedError(f"attention type {layer_type}")
        return RWKVAttention(
            head_size=d_model // heads,
            dim_att=d_model,
            n_layers=num_blocks,
            direction=direction,
            layer_id=layer_id,
            do_bfloat16=rwkv_conf.get("rwkv_do_bfloat16", True),
            wkv_impl=rwkv_conf.get("wkv_impl", "chunked"),
            wkv_chunk_size=rwkv_conf.get("wkv_chunk_size", 256),
            wkv_version=rwkv_conf.get("wkv_version"),
            spmd_axis=rwkv_conf.get("spmd_axis"),
            bidirectional_layers=rwkv_conf.get("bidirectional_layers"),
            alt_decoding=rwkv_conf.get("alt_decoding", False),
        )
    if layer_type == "mamba_att":
        from paper_accurate_fast_cheap_tpu.models.mamba import MambaAttention

        return MambaAttention(
            head_size=d_model // heads,
            d_model=d_model,
            n_layers=num_blocks,
            direction=rwkv_conf.get("rnn_att_direction", "bi"),
            spmd_axis=rwkv_conf.get("spmd_axis"),
            layer_id=layer_id,
        )
    raise NotImplementedError(f"attention type {layer_type}")


class ConformerEncoderLayer(nn.Module):
    """One conformer block (pre-norm)."""

    d_model: int
    self_attn: nn.Module
    linear_units: int
    dropout_rate: float = 0.1
    activation: str = "swish"
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 31
    cnn_module_norm: str = "layer_norm"
    causal: bool = False
    normalize_before: bool = True
    # sequence-parallel mode (T sharded over this mesh axis inside an
    # enclosing shard_map); requires an spmd-aware self_attn (RWKV/mamba)
    # and full-length sequences
    spmd_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, att_mask=None, pos_emb=None, pad_mask=None,
                 lengths=None, deterministic: bool = True,
                 layer_state=None, return_state: bool = False):
        drop = lambda v: nn.Dropout(self.dropout_rate)(
            v, deterministic=deterministic
        )
        ff_scale = 0.5 if self.macaron_style else 1.0
        att_state = layer_state["attn"] if layer_state else None
        cnn_cache = layer_state["conv"] if layer_state else None
        new_state = {}

        if self.macaron_style:
            res = x
            y = nn.LayerNorm(epsilon=1e-5, name="norm_ff_macaron")(x)
            y = PositionwiseFeedForward(
                self.d_model, self.linear_units, self.dropout_rate,
                self.activation, name="feed_forward_macaron",
            )(y, deterministic=deterministic)
            x = res + ff_scale * drop(y)

        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm_mha")(x)
        from paper_accurate_fast_cheap_tpu.models.mamba import (
            MambaAttention,
        )

        if isinstance(self.self_attn, (RWKVAttention, MambaAttention)):
            if return_state:
                y, new_state["attn"] = self.self_attn(
                    y, y, att_mask, pos_emb, lengths=lengths,
                    deterministic=deterministic, state=att_state,
                    return_state=True,
                )
            else:
                y = self.self_attn(y, y, att_mask, pos_emb, lengths=lengths,
                                   deterministic=deterministic)
        else:
            if return_state:
                y, new_state["attn"] = self.self_attn(
                    y, y, att_mask, pos_emb,
                    deterministic=deterministic, cache=att_state,
                    return_cache=True,
                )
            else:
                y = self.self_attn(y, y, att_mask, pos_emb,
                                   deterministic=deterministic)
        x = res + drop(y)

        if self.use_cnn_module:
            res = x
            y = nn.LayerNorm(epsilon=1e-5, name="norm_conv")(x)
            conv = ConvolutionModule(
                self.d_model, self.cnn_module_kernel, self.cnn_module_norm,
                self.causal, spmd_axis=self.spmd_axis, name="conv_module",
            )
            if return_state:
                y, new_state["conv"] = conv(
                    y, pad_mask, deterministic=deterministic,
                    cache=cnn_cache, return_cache=True,
                )
            else:
                y = conv(y, pad_mask, deterministic=deterministic)
            x = res + drop(y)

        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm_ff")(x)
        y = PositionwiseFeedForward(
            self.d_model, self.linear_units, self.dropout_rate,
            self.activation, name="feed_forward",
        )(y, deterministic=deterministic)
        x = res + ff_scale * drop(y)

        if self.use_cnn_module:
            x = nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)
        if return_state:
            return x, new_state
        return x


class LanguageSpecificConformerEncoderLayer(nn.Module):
    """LSL layer: per-language parallel conformer blocks combined by the
    one-hot/soft ``cat_embs`` language vector
    (`encoder_layer.py` LanguageSpecificConformerEncoderLayer;
    `encoder.py:634-769` places these at both ends of the stack)."""

    num_langs: int
    layer_kwargs: Any  # dict of ConformerEncoderLayer kwargs (minus attn)
    attn_factory: Any  # callable () -> attention module

    @nn.compact
    def __call__(self, x, att_mask=None, pos_emb=None, pad_mask=None,
                 lengths=None, deterministic: bool = True, cat_embs=None):
        outs = []
        for k in range(self.num_langs):
            layer = ConformerEncoderLayer(
                self_attn=self.attn_factory(), **dict(self.layer_kwargs),
                name=f"lang_{k}",
            )
            outs.append(layer(x, att_mask, pos_emb, pad_mask, lengths,
                              deterministic))
        stacked = jnp.stack(outs, axis=1)           # (B, K, T, D)
        if cat_embs is None:
            w = jnp.full((x.shape[0], self.num_langs),
                         1.0 / self.num_langs)
        else:
            w = cat_embs[:, : self.num_langs]
        return jnp.einsum("bk,bktd->btd", w.astype(stacked.dtype), stacked)


class ConformerEncoder(nn.Module):
    """Conformer encoder: cmvn (caller) -> subsample -> pos-enc -> N blocks.

    num_langs > 0 turns the first and last blocks into language-specific
    layers conditioned on ``cat_embs`` (LSL, `encoder.py:634-769`).

    Returns (encoded (B, T', D), out_lengths (B,)).
    """

    input_size: int = 80
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 12
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    pos_enc_layer_type: str = "rel_pos"
    normalize_before: bool = True
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 31
    cnn_module_norm: str = "layer_norm"
    activation_type: str = "swish"
    causal: bool = False
    key_bias: bool = True
    selfattention_layer_type: str = "rel_selfattn"
    static_chunk_size: int = 0
    use_dynamic_chunk: bool = False
    use_dynamic_left_chunk: bool = False
    gradient_checkpointing: bool = False
    num_langs: int = 0
    rwkv_conf: Any = None  # dict: rwkv/mamba/lca extras

    @nn.compact
    def __call__(
        self,
        xs: jax.Array,
        xs_lens: jax.Array,
        decoding_chunk_size: int = 0,
        num_decoding_left_chunks: int = -1,
        *,
        deterministic: bool = True,
        return_layers: bool = False,
        streaming_state=None,
        return_state: bool = False,
        offset: int = 0,
        att_cache_size: int = 0,
        cat_embs=None,
        pre_embedded: bool = False,
    ):
        rwkv_conf = dict(self.rwkv_conf or {})
        if pre_embedded:
            # xs is already at the post-subsampling frame rate/width (the
            # SSL block-split tap: `w2vbert_model.py _forward_encoder_
            # blocks` masks AFTER `_forward_subsampling`)
            out_lens = jnp.minimum(jnp.asarray(xs_lens), xs.shape[1])
        else:
            sub_kw = dict(idim=self.input_size, odim=self.output_size,
                          dropout_rate=self.dropout_rate, name="embed")
            if rwkv_conf.get("spmd_axis"):
                # sequence-parallel from RAW FEATURES: the ds4 frontend
                # fetches its boundary via halo exchange so T can be
                # sharded before subsampling (extension; reference runs
                # full sequences on one device, `encoder.py:117-149`)
                if self.input_layer != "conv2d":
                    raise ValueError(
                        "spmd_axis from raw features requires the "
                        "conv2d (ds4) frontend; use pre_embedded=True "
                        f"for input_layer={self.input_layer!r}")
                sub_kw["spmd_axis"] = rwkv_conf["spmd_axis"]
            sub = SUBSAMPLE_CLASSES[self.input_layer](**sub_kw)
            xs, out_lens = sub(xs, xs_lens, deterministic=deterministic)
            out_lens = jnp.minimum(out_lens, xs.shape[1])
        pos_cls = EMB_CLASSES[self.pos_enc_layer_type]
        xs, pos_emb = pos_cls(
            d_model=self.output_size,
            dropout_rate=self.positional_dropout_rate, name="pos_enc",
        )(xs, offset=offset, deterministic=deterministic)

        if return_state:
            # streaming chunk path (`encoder.py:231-339` forward_chunk):
            # the chunk is fully valid; recurrent state or a fixed-size KV
            # cache replaces masks
            layer_states = (streaming_state or {}).get("layers")
            new_states = []
            is_mha = self.selfattention_layer_type in ("selfattn",
                                                       "rel_selfattn")
            if is_mha:
                Tc = int(att_cache_size)
                T_chunk = xs.shape[1]
                B = xs.shape[0]
                d = self.output_size
                if layer_states is None:
                    zero = {
                        "k": jnp.zeros((B, Tc, self.attention_heads,
                                        d // self.attention_heads)),
                        "v": jnp.zeros((B, Tc, self.attention_heads,
                                        d // self.attention_heads)),
                        "valid": jnp.zeros((B, Tc), bool),
                    }
                    layer_states = [{"attn": dict(zero), "conv": None}
                                    for _ in range(self.num_blocks)]
                # key positions offset-Tc .. offset+T (zeros for t < 0);
                # computed on device — an embedded 100k-row table
                # constant blows the remote compile size limit
                pos_ids = offset - Tc + jnp.arange(Tc + T_chunk)
                pe = emb_mod.sinusoid_positions(offset - Tc,
                                                Tc + T_chunk, d)
                pos_emb = jnp.where((pos_ids < 0)[:, None], 0.0,
                                    pe)[None]
            for i in range(self.num_blocks):
                attn = _make_attention(
                    self.selfattention_layer_type, self.attention_heads,
                    self.output_size, self.attention_dropout_rate,
                    self.key_bias, self.num_blocks, i, rwkv_conf,
                )
                xs, st = ConformerEncoderLayer(
                    d_model=self.output_size, self_attn=attn,
                    linear_units=self.linear_units,
                    dropout_rate=self.dropout_rate,
                    activation=self.activation_type,
                    macaron_style=self.macaron_style,
                    use_cnn_module=self.use_cnn_module,
                    cnn_module_kernel=self.cnn_module_kernel,
                    cnn_module_norm=self.cnn_module_norm,
                    causal=self.causal,
                    normalize_before=self.normalize_before,
                    name=f"layer_{i}",
                )(xs, None, pos_emb, None, out_lens, True,
                  layer_states[i] if layer_states else None, True)
                new_states.append(st)
            if self.normalize_before:
                xs = nn.LayerNorm(epsilon=1e-5, name="after_norm")(xs)
            return xs, out_lens, {"layers": new_states}

        T = xs.shape[1]
        spmd_axis = rwkv_conf.get("spmd_axis")
        if spmd_axis:
            # sequence-parallel mode (T sharded inside an enclosing
            # shard_map): full-length sequences only — no masks/lengths;
            # the sp-aware modules fetch boundary context from the mesh
            pad_mask = None
            att_mask = None
        elif self.use_dynamic_chunk and not deterministic:
            pad_mask = mask_utils.make_pad_mask(out_lens, T)
            att_mask = mask_utils.add_optional_chunk_mask(
                pad_mask, True, self.use_dynamic_left_chunk,
                decoding_chunk_size, self.static_chunk_size,
                num_decoding_left_chunks, rng=self.make_rng("chunk"),
            )
        elif self.static_chunk_size > 0 or decoding_chunk_size != 0:
            pad_mask = mask_utils.make_pad_mask(out_lens, T)
            att_mask = mask_utils.add_optional_chunk_mask(
                pad_mask, False, False,
                0 if decoding_chunk_size < 0 else decoding_chunk_size,
                self.static_chunk_size, num_decoding_left_chunks,
            )
        else:
            pad_mask = mask_utils.make_pad_mask(out_lens, T)
            att_mask = pad_mask[:, None, :]

        layer_outs = []
        layer_common = dict(
            d_model=self.output_size,
            linear_units=self.linear_units,
            dropout_rate=self.dropout_rate,
            activation=self.activation_type,
            macaron_style=self.macaron_style,
            use_cnn_module=self.use_cnn_module,
            cnn_module_kernel=self.cnn_module_kernel,
            cnn_module_norm=self.cnn_module_norm,
            causal=self.causal,
            normalize_before=self.normalize_before,
            spmd_axis=spmd_axis,
        )
        for i in range(self.num_blocks):
            def attn_factory(i=i):
                return _make_attention(
                    self.selfattention_layer_type, self.attention_heads,
                    self.output_size, self.attention_dropout_rate,
                    self.key_bias, self.num_blocks, i, rwkv_conf,
                )

            if self.num_langs > 0 and i in (0, self.num_blocks - 1):
                xs = LanguageSpecificConformerEncoderLayer(
                    num_langs=self.num_langs, layer_kwargs=layer_common,
                    attn_factory=attn_factory, name=f"layer_{i}",
                )(xs, att_mask, pos_emb, pad_mask, out_lens,
                  deterministic, cat_embs)
                if return_layers:
                    layer_outs.append(xs)
                continue
            layer = ConformerEncoderLayer(
                self_attn=attn_factory(), **layer_common,
                name=f"layer_{i}",
            )
            if self.gradient_checkpointing and not deterministic:
                # rematerialize each block's activations in the backward pass
                # (reference: torch checkpoint via gradient_checkpointing,
                # `encoder.py` / `train_utils.py:354-392`)
                xs = nn.remat(
                    ConformerEncoderLayer.__call__, static_argnums=(6,)
                )(layer, xs, att_mask, pos_emb, pad_mask,
                  None if spmd_axis else out_lens, deterministic)
            else:
                xs = layer(xs, att_mask, pos_emb, pad_mask,
                           None if spmd_axis else out_lens,
                           deterministic=deterministic)
            if return_layers:
                layer_outs.append(xs)

        if self.normalize_before:
            xs = nn.LayerNorm(epsilon=1e-5, name="after_norm")(xs)
        if return_layers:
            return xs, out_lens, layer_outs
        return xs, out_lens


class TransformerEncoderLayer(nn.Module):
    """Plain transformer block (`encoder_layer.py:25-111`)."""

    d_model: int
    self_attn: nn.Module
    linear_units: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True

    @nn.compact
    def __call__(self, x, att_mask=None, pos_emb=None, pad_mask=None,
                 lengths=None, *, deterministic: bool = True):
        drop = lambda v: nn.Dropout(self.dropout_rate)(
            v, deterministic=deterministic
        )
        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = self.self_attn(y, y, att_mask, pos_emb,
                           deterministic=deterministic)
        x = res + drop(y)
        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = PositionwiseFeedForward(
            self.d_model, self.linear_units, self.dropout_rate,
            self.activation, name="feed_forward",
        )(y, deterministic=deterministic)
        return res + drop(y)


class TransformerEncoder(nn.Module):
    """Vanilla transformer encoder (`encoder.py:405-450`)."""

    input_size: int = 80
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    pos_enc_layer_type: str = "abs_pos"
    normalize_before: bool = True
    key_bias: bool = True
    activation_type: str = "relu"

    @nn.compact
    def __call__(self, xs, xs_lens, *, deterministic: bool = True):
        sub = SUBSAMPLE_CLASSES[self.input_layer](
            idim=self.input_size, odim=self.output_size,
            dropout_rate=self.dropout_rate, name="embed",
        )
        xs, out_lens = sub(xs, xs_lens, deterministic=deterministic)
        xs, pos_emb = EMB_CLASSES[self.pos_enc_layer_type](
            d_model=self.output_size,
            dropout_rate=self.positional_dropout_rate, name="pos_enc",
        )(xs, deterministic=deterministic)
        T = xs.shape[1]
        pad_mask = mask_utils.make_pad_mask(out_lens, T)
        att_mask = pad_mask[:, None, :]
        for i in range(self.num_blocks):
            attn = att_mod.MultiHeadedAttention(
                heads=self.attention_heads, d_model=self.output_size,
                dropout_rate=self.attention_dropout_rate,
                key_bias=self.key_bias,
            )
            xs = TransformerEncoderLayer(
                d_model=self.output_size, self_attn=attn,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                activation=self.activation_type,
                normalize_before=self.normalize_before, name=f"layer_{i}",
            )(xs, att_mask, pos_emb, pad_mask, out_lens,
              deterministic=deterministic)
        if self.normalize_before:
            xs = nn.LayerNorm(epsilon=1e-5, name="after_norm")(xs)
        return xs, out_lens
