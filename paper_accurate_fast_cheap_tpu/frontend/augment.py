"""Spectrogram augmentation: SpecAugment masks, spec_sub, spec_trim.

Parity targets: `wenet/dataset/processor.py:562-647` — time/freq zero masks
(NO time-warp: the reference accepts a ``max_w`` arg but never implements
warping), U2++ spec_sub (replace a span with an earlier span), TrimTail
spec_trim (shorten the utterance by up to max_t frames).

TPU-first: all ops are jittable on statically shaped (T, D) arrays using an
explicit PRNG key and the true utterance length, so augmentation can run
batched on device instead of per-utterance on CPU workers.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _span_mask(rng, size: int, limit, max_len: int):
    """Random [start, end) span within [0, limit): start ~ U[0, limit-1],
    length ~ U[1, max_len]; returns bool (size,) mask of the span."""
    k1, k2 = jax.random.split(rng)
    start = jax.random.randint(k1, (), 0, jnp.maximum(limit, 1))
    length = jax.random.randint(k2, (), 1, max_len + 1)
    idx = jnp.arange(size)
    return (idx >= start) & (idx < start + length), start, length


@functools.partial(
    jax.jit,
    static_argnames=("num_t_mask", "num_f_mask", "max_t", "max_f"),
)
def spec_aug(
    rng: jax.Array,
    x: jax.Array,
    length=None,
    num_t_mask: int = 2,
    num_f_mask: int = 2,
    max_t: int = 50,
    max_f: int = 10,
) -> jax.Array:
    """SpecAugment on (T, D); spans are drawn within the true ``length``."""
    T, D = x.shape
    if length is None:
        length = T
    keys = jax.random.split(rng, num_t_mask + num_f_mask)
    y = x
    for i in range(num_t_mask):
        m, _, _ = _span_mask(keys[i], T, length, max_t)
        y = jnp.where(m[:, None], 0.0, y)
    for j in range(num_f_mask):
        m, _, _ = _span_mask(keys[num_t_mask + j], D, D, max_f)
        y = jnp.where(m[None, :], 0.0, y)
    return y


@functools.partial(jax.jit, static_argnames=("max_t", "num_t_sub"))
def spec_sub(
    rng: jax.Array,
    x: jax.Array,
    length=None,
    max_t: int = 20,
    num_t_sub: int = 3,
) -> jax.Array:
    """U2++ spec substitute: span [start, end) := x[start-pos : end-pos)."""
    T, D = x.shape
    if length is None:
        length = T
    y = x
    keys = jax.random.split(rng, num_t_sub)
    idx = jnp.arange(T)
    for i in range(num_t_sub):
        k1, k2 = jax.random.split(keys[i])
        m, start, _ = _span_mask(k1, T, length, max_t)
        pos = jax.random.randint(k2, (), 0, start + 1)
        shifted = jnp.take(x, jnp.maximum(idx - pos, 0), axis=0)
        y = jnp.where(m[:, None], shifted, y)
    return y


@functools.partial(jax.jit, static_argnames=("max_t",))
def spec_trim_length(rng: jax.Array, length: jax.Array, max_t: int = 20):
    """TrimTail: shorten by l ~ U[1, max_t] if l < length/2 (shape-preserving:
    only the valid length changes; the caller masks trailing frames)."""
    l = jax.random.randint(rng, (), 1, max_t + 1)
    return jnp.where(l < length // 2, length - l, length)
