"""Common sequence helpers.

Parity targets: `wenet/utils/common.py` — add_sos_eos (`:112`), add_blank
(`:78`), reverse_pad_list (`:240`), th_accuracy (`:268`), log_add (`:355`).
All jit-friendly with static shapes (padded label tensors + lengths instead
of ragged lists).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_ID = -1


def add_sos_eos(ys: jax.Array, ys_lens: jax.Array, sos: int, eos: int,
                ignore_id: int = IGNORE_ID):
    """Padded (B, U) labels -> (ys_in (B, U+1) with <sos>, ys_out (B, U+1)
    with <eos> and ignore_id padding)."""
    B, U = ys.shape
    pos = jnp.arange(U + 1)[None, :]
    valid_in = pos[:, 1:] <= ys_lens[:, None]  # positions 1..U hold labels
    ys_in = jnp.concatenate(
        [jnp.full((B, 1), sos, ys.dtype),
         jnp.where(valid_in, ys, eos)], axis=1,
    )
    valid_out = pos < ys_lens[:, None]
    ys_ext = jnp.concatenate([ys, jnp.zeros((B, 1), ys.dtype)], axis=1)
    ys_out = jnp.where(
        valid_out, ys_ext,
        jnp.where(pos == ys_lens[:, None], eos, ignore_id),
    )
    return ys_in, ys_out


def add_blank(ys: jax.Array, ys_lens: jax.Array, blank: int,
              ignore_id: int = IGNORE_ID):
    """Prepend blank for transducer predictor input: (B, U) -> (B, U+1)."""
    B, U = ys.shape
    pos = jnp.arange(U + 1)[None, :]
    valid = pos[:, 1:] <= ys_lens[:, None]
    return jnp.concatenate(
        [jnp.full((B, 1), blank, ys.dtype), jnp.where(valid, ys, blank)],
        axis=1,
    )


def reverse_pad_list(ys: jax.Array, ys_lens: jax.Array,
                     pad_value: int = IGNORE_ID) -> jax.Array:
    """Reverse each row's valid prefix; fill the rest with pad_value."""
    B, U = ys.shape
    pos = jnp.arange(U)[None, :]
    idx = jnp.clip(ys_lens[:, None] - 1 - pos, 0, U - 1)
    rev = jnp.take_along_axis(ys, idx, axis=1)
    return jnp.where(pos < ys_lens[:, None], rev, pad_value)


def accuracy(logits: jax.Array, targets: jax.Array,
             ignore_id: int = IGNORE_ID) -> jax.Array:
    """Token accuracy over non-ignored positions (th_accuracy)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != ignore_id
    correct = jnp.sum((pred == targets) & valid)
    return correct / jnp.maximum(jnp.sum(valid), 1)


def log_add(a, b):
    """Numerically stable log(exp(a) + exp(b))."""
    return jnp.logaddexp(a, b)
