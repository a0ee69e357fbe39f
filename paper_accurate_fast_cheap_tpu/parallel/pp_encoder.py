"""Pipeline-parallel conformer encoder forward + trainer loss.

The reference has no pipeline parallelism (SURVEY.md §5: DP only); on TPU
the 12-block conformer stack stage-shards naturally over a mesh 'stage'
axis (`parallel/pipeline.py` GPipe engine).  This module productizes it:

- `split_encoder_params(params, num_blocks, n_stages)` — pull the
  per-block subtrees (`layer_i`) out of a trained/initialized param tree
  and stack them (S, L/S, ...) for the stage axis; the remainder
  (subsampling, pos-enc, after-norm, heads, predictor, joint, decoder)
  stays replicated.
- `pp_encoder_forward(...)` — subsample/embed (replicated), pipeline the
  blocks over 'stage' with masks flowing per microbatch, final norm.
- `make_pp_loss_fn(...)` — full-model loss: pp encoder +
  `model.loss_from_encoder` (the post-encoder half of `__call__`).

Because `ppermute`/`psum` have exact transposes, `jax.grad` of this loss
IS the GPipe backward schedule — no hand-written backward pass.  Grad
parity vs the sequential encoder is asserted in `tests/test_pp_train.py`.

Supported attention types: any whose FORWARD is layer-id independent
(the flagship `rwkv_tmix60_bidirectional`, `mamba_att`, `selfattn`,
`rel_selfattn`); the dirdrop eval controls branch on layer id and are
rejected.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from paper_accurate_fast_cheap_tpu.models.conformer import (
    ConformerEncoderLayer,
    EMB_CLASSES,
    SUBSAMPLE_CLASSES,
    _make_attention,
)
from paper_accurate_fast_cheap_tpu.parallel.pipeline import pipeline_apply
from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils

_LAYER_ID_DEPENDENT = ("rwkv_tmix60_dir_layer_drop",
                       "rwkv_tmix60_dir_layer_drop_both")


def _enc_conf_get(enc_conf: Dict, key, default=None):
    return enc_conf.get(key, default)


_NON_BLOCK_KEYS = ("embed", "pos_enc", "after_norm", "global_cmvn")


def _attn_keys(enc_params: Dict, num_blocks: int):
    """The attention modules are created in the ENCODER's compact scope
    (passed into each layer as `self_attn`), so their params sit beside
    `layer_i` as `<ClassName>_<i>` — collect them in block order."""
    cand = [k for k in enc_params
            if not k.startswith("layer_") and k not in _NON_BLOCK_KEYS
            and "_" in k and k.rsplit("_", 1)[1].isdigit()]
    cand.sort(key=lambda k: int(k.rsplit("_", 1)[1]))
    if len(cand) != num_blocks:
        raise ValueError(
            f"expected {num_blocks} attention subtrees, found {cand} — "
            "pp supports homogeneous (non-LSL) encoders only")
    return cand


def split_encoder_params(enc_params: Dict, num_blocks: int, n_stages: int):
    """(replicated_rest, stage_stacked_blocks) from an encoder subtree.

    Each block's pytree is ``{**layer_i, 'self_attn': attn_i}`` — the
    layout a standalone `ConformerEncoderLayer.apply` expects.
    """
    if num_blocks % n_stages:
        raise ValueError(f"{num_blocks} blocks not divisible by "
                         f"{n_stages} stages")
    per = num_blocks // n_stages
    akeys = _attn_keys(enc_params, num_blocks)
    blocks = [dict(enc_params[f"layer_{i}"],
                   self_attn=enc_params[akeys[i]])
              for i in range(num_blocks)]
    rest = {k: v for k, v in enc_params.items()
            if not k.startswith("layer_") and k not in akeys}
    # stack: leaves (S, per, ...)
    stages = []
    for s in range(n_stages):
        stages.append(jax.tree.map(
            lambda *xs: jnp.stack(xs), *blocks[s * per:(s + 1) * per]))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *stages)
    return rest, stacked


def merge_encoder_params(rest: Dict, stacked, num_blocks: int,
                         n_stages: int,
                         attn_base: str = "RWKVAttention") -> Dict:
    """Inverse of `split_encoder_params` (for checkpoint save/export)."""
    per = num_blocks // n_stages
    out = dict(rest)
    for s in range(n_stages):
        for j in range(per):
            i = s * per + j
            blk = jax.tree.map(lambda a: a[s, j], stacked)
            out[f"{attn_base}_{i}"] = blk.pop("self_attn")
            out[f"layer_{i}"] = blk
    return out


def _encoder_module(enc_conf: Dict):
    """Instantiate the real ConformerEncoder so every default (kernel
    size, norms, activation...) comes from the module class, never from
    re-guessed literals here."""
    from paper_accurate_fast_cheap_tpu.models.conformer import (
        ConformerEncoder,
    )

    return ConformerEncoder(**enc_conf)


def _build_layer_template(enc_conf: Dict):
    enc = _encoder_module(enc_conf)
    att_type = enc.selfattention_layer_type
    if att_type in _LAYER_ID_DEPENDENT:
        raise ValueError(
            f"{att_type} branches on layer id at eval time; pipeline "
            "stages share one layer program — use the bidirectional or "
            "uni variants for pp")
    rwkv_conf = dict(enc.rwkv_conf or {})
    attn = _make_attention(
        att_type, enc.attention_heads, enc.output_size,
        enc.attention_dropout_rate, enc.key_bias, enc.num_blocks, 0,
        rwkv_conf,
    )
    return ConformerEncoderLayer(
        d_model=enc.output_size,
        self_attn=attn,
        linear_units=enc.linear_units,
        dropout_rate=enc.dropout_rate,
        activation=enc.activation_type,
        macaron_style=enc.macaron_style,
        use_cnn_module=enc.use_cnn_module,
        cnn_module_kernel=enc.cnn_module_kernel,
        cnn_module_norm=enc.cnn_module_norm,
        causal=enc.causal,
        normalize_before=enc.normalize_before,
    )


def pp_encoder_forward(enc_conf: Dict, enc_params: Dict, feats, lens,
                       mesh: Mesh, axis: str = "stage",
                       n_microbatches: int | None = None,
                       deterministic: bool = True, rng=None):
    """Features -> encoder outputs with the block stack pipelined.

    ``enc_params`` is the UNSPLIT encoder subtree (params['encoder']);
    splitting/stacking happens here so callers keep the canonical
    checkpoint layout.  Matches `ConformerEncoder.__call__`'s
    full-context path (`models/conformer.py:380-460`) numerically.

    With ``deterministic=False`` (requires ``rng``) the subsampling and
    positional-encoding dropout are live; the pipelined BLOCKS always run
    deterministically — the GPipe tick loop would need per-stage,
    per-microbatch rng threading to reproduce sequential dropout masks.
    """
    frontend_rngs = (
        {"dropout": rng} if (rng is not None and not deterministic)
        else None)
    enc = _encoder_module(enc_conf)
    num_blocks = enc.num_blocks
    S = mesh.shape[axis]
    rest, stacked = split_encoder_params(enc_params, num_blocks, S)

    sub = SUBSAMPLE_CLASSES[enc.input_layer](
        idim=enc.input_size, odim=enc.output_size,
        dropout_rate=enc.dropout_rate, name="embed",
    )
    xs, out_lens = sub.apply({"params": rest["embed"]}, feats, lens,
                             deterministic=deterministic,
                             rngs=frontend_rngs)
    out_lens = jnp.minimum(out_lens, xs.shape[1])
    pos_mod = EMB_CLASSES[enc.pos_enc_layer_type](
        d_model=enc.output_size,
        dropout_rate=enc.positional_dropout_rate,
        name="pos_enc",
    )
    xs, pos_emb = pos_mod.apply({"params": rest.get("pos_enc", {})}, xs,
                                deterministic=deterministic,
                                rngs=frontend_rngs)

    T = xs.shape[1]
    pad_mask = mask_utils.make_pad_mask(out_lens, T)
    att_mask = pad_mask[:, None, :]

    layer = _build_layer_template(enc_conf)

    def stage_fn(stage_blocks, x, extra):
        # stage_blocks leaves: (per, ...); apply the per blocks in order
        per = jax.tree.leaves(stage_blocks)[0].shape[0]
        for j in range(per):
            blk = jax.tree.map(lambda a: a[j], stage_blocks)
            # blocks are always deterministic: no per-stage rng threading
            # through the GPipe ticks (see docstring)
            x = layer.apply(
                {"params": blk}, x, extra["att_mask"], pos_emb,
                extra["pad_mask"], extra["lens"],
                deterministic=True)
        return x

    extra = {"att_mask": att_mask, "pad_mask": pad_mask, "lens": out_lens}
    xs = pipeline_apply(stage_fn, stacked, xs, mesh, axis=axis,
                        n_microbatches=n_microbatches, extra=extra)

    if enc.normalize_before:
        import flax.linen as nn

        xs = nn.LayerNorm(epsilon=1e-5, name="after_norm").apply(
            {"params": rest["after_norm"]}, xs)
    return xs, out_lens


def make_pp_loss_fn(model, enc_conf: Dict, mesh: Mesh,
                    axis: str = "stage",
                    n_microbatches: int | None = None):
    """Full-model loss with the encoder blocks pipelined over ``axis``.

    Signature matches the sequential loss closure used by
    `train/train_step.make_train_step`: (params, batch, rng) -> (loss,
    metrics).  With an rng, dropout is LIVE in the subsampling frontend
    and the post-encoder half (CTC/attention heads, predictor, joint);
    it is disabled only inside the pipelined blocks (the GPipe tick loop
    would need per-stage, per-microbatch rng threading).  rng=None runs
    fully deterministic (eval / parity testing).
    """
    def loss_fn(params, batch, rng):
        feats, feat_lens, labels, label_lens = batch[:4]
        p = params["params"]
        det = rng is None
        r_enc = r_loss = None
        if not det:
            r_enc, r_loss = jax.random.split(rng)
        enc, enc_lens = pp_encoder_forward(
            enc_conf, p["encoder"], feats, feat_lens, mesh, axis=axis,
            n_microbatches=n_microbatches, deterministic=det, rng=r_enc)
        out = model.apply(
            {"params": p}, enc, enc_lens, labels, label_lens,
            deterministic=det, method=model.loss_from_encoder,
            rngs={"dropout": r_loss} if not det else None,
        )
        return out["loss"], out

    return loss_fn
