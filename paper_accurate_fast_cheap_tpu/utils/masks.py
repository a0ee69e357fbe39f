"""Mask utilities (jit-friendly, static shapes).

Parity targets: `wenet/utils/mask.py` — make_pad_mask (`:200`),
subsequent_chunk_mask (`:88`), add_optional_chunk_mask dynamic-chunk
training (`:126-197`), subsequent_mask for AR decoding, and
causal_or_lookahead_mask (`:306`).

Convention: masks are boolean with True = valid/attend (the reference mixes
polarities; here every mask is True=keep and callers invert explicitly).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths -> bool (B, max_len), True on valid positions."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def subsequent_mask(size: int) -> jax.Array:
    """Causal (size, size) mask, True where s <= t."""
    return jnp.tril(jnp.ones((size, size), bool))


def subsequent_chunk_mask(
    size: int, chunk_size: int, num_left_chunks: int = -1
) -> jax.Array:
    """Chunk-causal mask: position t attends within its chunk and up to
    num_left_chunks previous chunks (-1 = all history)."""
    t = jnp.arange(size)
    chunk_of = t // chunk_size
    s_chunk = chunk_of[None, :]
    t_chunk = chunk_of[:, None]
    right_ok = s_chunk <= t_chunk
    if num_left_chunks < 0:
        left_ok = jnp.ones((size, size), bool)
    else:
        left_ok = s_chunk >= t_chunk - num_left_chunks
    return right_ok & left_ok


def add_optional_chunk_mask(
    pad_mask: jax.Array,
    use_dynamic_chunk: bool,
    use_dynamic_left_chunk: bool,
    decoding_chunk_size: int,
    static_chunk_size: int,
    num_decoding_left_chunks: int,
    rng: Optional[jax.Array] = None,
    max_chunk_cap: int = 25,
) -> jax.Array:
    """Combine the padding mask with a (possibly random) chunk mask.

    Mirrors `mask.py:126-197`: at train time with use_dynamic_chunk, draw a
    random chunk size — full context with prob 1/2, else 1..max_chunk_cap.
    Note the randomness is drawn per *batch* (like the reference).  Returns
    bool (B, T, T).

    TPU note: a traced random chunk size would create dynamic shapes, so the
    chunk mask is built with comparisons on a static (T, T) grid.
    """
    B, T = pad_mask.shape
    att = pad_mask[:, None, :] & pad_mask[:, :, None]
    if use_dynamic_chunk:
        assert rng is not None
        k1, k2, k3 = jax.random.split(rng, 3)
        full = jax.random.bernoulli(k1, 0.5)
        chunk = jax.random.randint(k2, (), 1, max_chunk_cap + 1)
        chunk = jnp.where(full, T, chunk)
        if use_dynamic_left_chunk:
            max_left = jnp.maximum((T // chunk) - 1, 1)
            nleft = jax.random.randint(k3, (), 0, max_left)
        else:
            nleft = jnp.asarray(-1)
        t = jnp.arange(T)
        tc = t[:, None] // chunk
        sc = t[None, :] // chunk
        cm = sc <= tc
        cm = cm & jnp.where(nleft < 0, True, sc >= tc - nleft)
        return att & cm[None]
    if static_chunk_size > 0:
        nleft = num_decoding_left_chunks
        cs = decoding_chunk_size if decoding_chunk_size > 0 else static_chunk_size
        cm = subsequent_chunk_mask(T, cs, nleft)
        return att & cm[None]
    if decoding_chunk_size > 0:
        cm = subsequent_chunk_mask(T, decoding_chunk_size,
                                   num_decoding_left_chunks)
        return att & cm[None]
    return att


def causal_or_lookahead_mask(size: int, right_context: int,
                             left_context: int = -1) -> jax.Array:
    """Limited left/right context mask (`mask.py:306`)."""
    t = jnp.arange(size)
    d = t[None, :] - t[:, None]  # s - t
    ok = d <= right_context
    if left_context >= 0:
        ok = ok & (d >= -left_context)
    return ok
