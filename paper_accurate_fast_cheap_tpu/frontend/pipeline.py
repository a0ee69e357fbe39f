"""Fused on-device feature pipeline: waveform batch -> model features.

This is the TPU-side half of the data pipeline (BASELINE.json: "the
Kaldi-style fbank front-end ... fuses into one XLA preprocessing graph"):
fbank -> global CMVN -> (train) SpecAugment / spec_sub, all inside one jit,
composable with the encoder so feature extraction overlaps model compute
instead of running on CPU workers like the reference
(`wenet/dataset/processor.py:343-371,562-625`).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.frontend import augment, features


def make_feature_fn(
    conf: Optional[Dict[str, Any]] = None,
    cmvn_stats: Optional[Tuple] = None,
):
    """Build featurize(wavs (B,S) float [-1,1], wav_lens, rng, train) ->
    (feats (B,F,M), feat_lens).  All config is closed over statically."""
    conf = conf or {}
    fb = conf.get("fbank_conf", {})
    num_mel = fb.get("num_mel_bins", 80)
    frame_len = fb.get("frame_length", 25) * 16  # ms -> samples at 16k
    frame_shift = fb.get("frame_shift", 10) * 16
    dither = float(fb.get("dither", 0.0))
    spec_aug_on = conf.get("spec_aug", False)
    sa = conf.get("spec_aug_conf", {})
    spec_sub_on = conf.get("spec_sub", False)
    ss = conf.get("spec_sub_conf", {})
    mean = istd = None
    if cmvn_stats is not None:
        mean = jnp.asarray(cmvn_stats[0])
        istd = jnp.asarray(cmvn_stats[1])

    @functools.partial(jax.jit, static_argnames=("train",))
    def featurize(wavs, wav_lens, rng=None, train: bool = False):
        wavs = wavs * 32768.0  # int16 scale (`processor.py:361`)
        B = wavs.shape[0]
        if train and dither > 0.0:
            rng, k = jax.random.split(rng)
            dither_keys = jax.random.split(k, B)
        else:
            dither_keys = None

        def one(w, key):
            return features.fbank(
                w, num_mel_bins=num_mel, frame_length=frame_len,
                frame_shift=frame_shift,
                dither=dither if (train and dither > 0) else 0.0,
                rng=key,
            )

        if dither_keys is not None:
            feats = jax.vmap(one)(wavs, dither_keys)
        else:
            feats = jax.vmap(lambda w: one(w, None))(wavs)
        feat_lens = jnp.where(
            wav_lens < frame_len, 0,
            1 + (wav_lens - frame_len) // frame_shift,
        ).astype(jnp.int32)

        if mean is not None:
            feats = (feats - mean) * istd

        if train and (spec_aug_on or spec_sub_on):
            rng, k1, k2 = jax.random.split(rng, 3)
            if spec_sub_on:
                keys = jax.random.split(k2, B)
                feats = jax.vmap(
                    lambda key, x, ln: augment.spec_sub(
                        key, x, ln, max_t=ss.get("max_t", 20),
                        num_t_sub=ss.get("num_t_sub", 3))
                )(keys, feats, feat_lens)
            if spec_aug_on:
                keys = jax.random.split(k1, B)
                feats = jax.vmap(
                    lambda key, x, ln: augment.spec_aug(
                        key, x, ln,
                        num_t_mask=sa.get("num_t_mask", 2),
                        num_f_mask=sa.get("num_f_mask", 2),
                        max_t=sa.get("max_t", 50),
                        max_f=sa.get("max_f", 10))
                )(keys, feats, feat_lens)
        return feats, feat_lens

    return featurize
