"""Streaming chunk-by-chunk encoder driver.

Parity target: `wenet/transformer/encoder.py:341-402`
(forward_chunk_by_chunk) — feed feature windows of
``(chunk - 1) * subsampling + right_context + 1`` frames, advance by
``chunk * subsampling``, thread the per-layer streaming state.

Improvement over the reference: for recurrent attention the reference's
chunk machinery is a NO-OP (the wkv state is not carried,
`rwkv_wrapper.py:81`; long-form is windowed at the CLI instead).  Here the
wkv/token-shift/conv-cache state is genuinely carried, so chunked streaming
output of a causal uni-directional model equals its full-utterance output.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def forward_chunk_by_chunk(
    encoder_apply: Callable,
    feats: jax.Array,
    decoding_chunk_size: int,
    subsampling: int = 4,
    context: int = 7,
) -> Tuple[jax.Array, jax.Array]:
    """encoder_apply(xs, xs_lens, streaming_state, offset) ->
    (ys, out_lens, new_state).  feats: (1, T, D).  Returns concatenated
    encoder outputs (1, T', D') and length."""
    T = feats.shape[1]
    stride = subsampling * decoding_chunk_size
    window = (decoding_chunk_size - 1) * subsampling + context
    outs = []
    state = None
    offset = 0
    for start in range(0, max(T - context + 1, 1), stride):
        chunk = feats[:, start : start + window]
        if chunk.shape[1] < context:
            break
        lens = jnp.asarray([chunk.shape[1]])
        ys, out_lens, state = encoder_apply(chunk, lens, state, offset)
        n = int(out_lens[0])
        outs.append(np.asarray(ys)[:, :n])
        offset += n
    if not outs:
        d = feats.shape[-1]
        return jnp.zeros((1, 0, d)), jnp.asarray([0])
    full = np.concatenate(outs, axis=1)
    return jnp.asarray(full), jnp.asarray([full.shape[1]])
