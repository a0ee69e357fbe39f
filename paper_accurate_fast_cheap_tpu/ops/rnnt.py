"""RNN-T (transducer) loss — jitted lax.scan forward algorithm.

Replaces the reference's external CUDA losses (`optimized_transducer`,
torchaudio rnnt_loss, k2 pruned rnnt — `wenet/transducer/transducer.py:
525-642`).  The memory trick of optimized_transducer (packed
``(sum T_i * (U_i + 1), V)`` logits) is replaced TPU-style: the joint's
(B, T, U+1, V) logits are never materialized — they are computed in T-chunks
under `jax.checkpoint` and immediately reduced to the two numbers per lattice
node the DP needs (label log-prob and blank log-prob).

Forward DP (log-space):
    alpha[0, 0] = 0
    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + label[t, u-1])
    -log P = -(alpha[T-1, U] + blank[T-1, U])

The intra-timestep recurrence over u is a first-order log-semiring linear
recurrence, evaluated with `lax.associative_scan` (log-parallel on TPU
instead of a length-U sequential chain).
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _log_linear_scan(a: jax.Array, c: jax.Array) -> jax.Array:
    """Solve x_u = logaddexp(a_u, c_u + x_{u-1}) with x_{-1} = -inf, along the
    last axis, via associative_scan on the log-semiring pairs (c, a)."""

    def combine(left, right):
        c1, a1 = left
        c2, a2 = right
        return c1 + c2, jnp.logaddexp(a2, c2 + a1)

    _, x = jax.lax.associative_scan(combine, (c, a), axis=-1)
    return x


def rnnt_forward(
    label_logp: jax.Array,  # (B, T, U+1); [..., u] = logP(label_{u+1} | t, u)
    blank_logp: jax.Array,  # (B, T, U+1)
    t_lens: jax.Array,      # (B,)
    u_lens: jax.Array,      # (B,) label counts U_b
) -> jax.Array:
    """Negative log-likelihood per sequence (B,)."""
    B, T, U1 = label_logp.shape
    u_idx = jnp.arange(U1)[None, :]
    # emitting a label is only allowed for u < U_b
    label_ok = u_idx < u_lens[:, None]
    alpha0 = jnp.broadcast_to(
        jnp.where(u_idx == 0, 0.0, NEG_INF), (B, U1)
    ).astype(jnp.float32)

    lab = jnp.where(label_ok[:, None, :], label_logp, NEG_INF)

    # inputs per scan step t: label_logp[:, t], blank_logp[:, t-1]
    blank_prev = jnp.concatenate(
        [jnp.zeros((B, 1, U1)), blank_logp[:, :-1]], axis=1
    )
    ts = jnp.arange(T)

    def scan_step(alpha, inp):
        lab_t, blank_tm1, t = inp
        a = jnp.where(t == 0, alpha, alpha + blank_tm1)
        c = jnp.pad(lab_t, ((0, 0), (1, 0)))[:, :U1]
        c = jnp.where(u_idx == 0, NEG_INF, c)
        new_alpha = _log_linear_scan(a, c)
        return new_alpha, new_alpha

    _, all_alpha = jax.lax.scan(
        scan_step, alpha0,
        (jnp.moveaxis(lab, 1, 0), jnp.moveaxis(blank_prev, 1, 0), ts),
    )
    all_alpha = jnp.moveaxis(all_alpha, 0, 1)  # (B, T, U1)

    # terminal: alpha[T_b - 1, U_b] + blank[T_b - 1, U_b]
    b_idx = jnp.arange(B)
    t_last = jnp.clip(t_lens - 1, 0, T - 1)
    alpha_fin = all_alpha[b_idx, t_last, u_lens]
    blank_fin = blank_logp[b_idx, t_last, u_lens]
    return -(alpha_fin + blank_fin)


def gather_rnnt_logprobs_chunked(
    enc_proj: jax.Array,    # (B, T, J) joint-projected encoder
    pred_proj: jax.Array,   # (B, U+1, J) joint-projected predictor
    labels: jax.Array,      # (B, U)
    joint_fn: Callable,     # (enc (B,Tc,1,J), pred (B,1,U+1,J)) -> logits
    blank_id: int = 0,
    t_chunk: int = 16,
) -> Tuple[jax.Array, jax.Array]:
    """Compute (label_logp, blank_logp) (B, T, U+1) without materializing the
    full (B, T, U+1, V) joint output."""
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    pad = (-T) % t_chunk
    if pad:
        enc_proj = jnp.pad(enc_proj, ((0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    NC = Tp // t_chunk
    enc_chunks = enc_proj.reshape(B, NC, t_chunk, J).transpose(1, 0, 2, 3)
    labels_ext = jnp.concatenate(
        [labels, jnp.zeros((B, 1), labels.dtype)], axis=1
    )  # label at u = U unused

    @jax.checkpoint
    def one_chunk(enc_c):
        logits = joint_fn(enc_c[:, :, None, :], pred_proj[:, None, :, :])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        blank = logp[..., blank_id]
        lab = jnp.take_along_axis(
            logp, labels_ext[:, None, :, None].astype(jnp.int32), axis=-1
        )[..., 0]
        return lab, blank

    lab, blank = jax.lax.map(one_chunk, enc_chunks)
    lab = jnp.moveaxis(lab, 0, 1).reshape(B, Tp, U1)[:, :T]
    blank = jnp.moveaxis(blank, 0, 1).reshape(B, Tp, U1)[:, :T]
    return lab, blank


def rnnt_loss_dense(
    logits: jax.Array,  # (B, T, U+1, V)
    labels: jax.Array,  # (B, U)
    t_lens: jax.Array,
    u_lens: jax.Array,
    blank_id: int = 0,
) -> jax.Array:
    """Oracle/convenience dense loss (small inputs only)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank = logp[..., blank_id]
    labels_ext = jnp.concatenate(
        [labels, jnp.zeros((labels.shape[0], 1), labels.dtype)], axis=1
    )
    lab = jnp.take_along_axis(
        logp, labels_ext[:, None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]
    return rnnt_forward(lab, blank, t_lens, u_lens)
