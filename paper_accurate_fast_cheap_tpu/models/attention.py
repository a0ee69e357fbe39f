"""Multi-head attention variants for the conformer encoder.

Parity targets: `wenet/transformer/attention.py` — MultiHeadedAttention
(`:28-267`), RelPositionMultiHeadedAttention (`:270-404`; Transformer-XL
matrices a+c / b+d but with rel_shift deliberately removed, `:396-399`, so
the "positional" term attends to absolute sinusoids).

All attention modules share one call signature so they are drop-in
interchangeable inside the conformer layer (mirrors the registry dispatch at
`wenet/utils/class_utils.py:77-89`):

    __call__(x_q, x_kv, mask, pos_emb, *, deterministic) -> (B, T, D)

``mask`` is a boolean (B, 1, T) or (B, T, T) padding/chunk mask (True =
attend).  Recurrent "attention" (rwkv/mamba) ignores mask and pos_emb, like
the reference wrappers do (SURVEY.md §3.5 note).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e10  # large-negative fill for masked logits (fp32/bf16 safe)


class MultiHeadedAttention(nn.Module):
    """Vanilla scaled-dot-product MHA."""

    heads: int
    d_model: int
    dropout_rate: float = 0.0
    key_bias: bool = True

    def setup(self):
        assert self.d_model % self.heads == 0
        self.d_k = self.d_model // self.heads
        self.linear_q = nn.Dense(self.d_model)
        self.linear_k = nn.Dense(self.d_model, use_bias=self.key_bias)
        self.linear_v = nn.Dense(self.d_model)
        self.linear_out = nn.Dense(self.d_model)
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    def _qkv(self, x_q, x_kv):
        B, Tq, _ = x_q.shape
        Tk = x_kv.shape[1]
        q = self.linear_q(x_q).reshape(B, Tq, self.heads, self.d_k)
        k = self.linear_k(x_kv).reshape(B, Tk, self.heads, self.d_k)
        v = self.linear_v(x_kv).reshape(B, Tk, self.heads, self.d_k)
        return q, k, v

    def _attend(self, scores, v, mask, deterministic):
        # scores: (B, H, Tq, Tk); mask: (B, 1, Tk) or (B, Tq, Tk) or None
        if mask is not None:
            m = mask[:, None] if mask.ndim == 3 else mask
            scores = jnp.where(m, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            m = mask[:, None] if mask.ndim == 3 else mask
            probs = jnp.where(m, probs, 0.0)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        # expose weights for coverage-style scorers (GNMT coverage_wu);
        # collected only when the caller applies with
        # mutable/capture 'intermediates'
        self.sow("intermediates", "attn_weights", probs)
        out = jnp.einsum("bhts,bshd->bthd", probs, v)
        B, Tq = out.shape[:2]
        return self.linear_out(out.reshape(B, Tq, self.d_model))

    def _with_cache(self, k, v, mask, cache):
        """Prepend a fixed-size KV cache (`attention.py:190-198` protocol,
        fixed-shape for jit): cache = {"k","v","valid"}; returns extended
        (k, v, key-mask, new_cache)."""
        B = k.shape[0]
        T = k.shape[1]
        k = jnp.concatenate([cache["k"].astype(k.dtype), k], axis=1)
        v = jnp.concatenate([cache["v"].astype(v.dtype), v], axis=1)
        valid = jnp.concatenate(
            [cache["valid"], jnp.ones((B, T), bool)], axis=1)
        Tc = cache["k"].shape[1]
        new_cache = {"k": k[:, -Tc:], "v": v[:, -Tc:],
                     "valid": valid[:, -Tc:]}
        return k, v, valid[:, None, :], new_cache

    def __call__(self, x_q, x_kv, mask=None, pos_emb=None, *,
                 deterministic: bool = True, cache=None,
                 return_cache: bool = False):
        q, k, v = self._qkv(x_q, x_kv)
        new_cache = None
        if cache is not None:
            k, v, mask, new_cache = self._with_cache(k, v, mask, cache)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(
            jnp.asarray(self.d_k, jnp.float32)
        ).astype(q.dtype)
        out = self._attend(scores, v, mask, deterministic)
        if return_cache:
            return out, new_cache
        return out


class ESPnetRelPositionMultiHeadedAttention(MultiHeadedAttention):
    """ESPnet-style rel-pos attention WITH the rel_shift
    (`attention.py:1058-1152`): pos_emb covers relative positions
    -(T-1)..(T-1) (2T-1 entries) and matrix_bd is shifted so column j
    corresponds to relative offset (j - i)."""

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.d_model, use_bias=False)
        self.pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(),
            (self.heads, self.d_k),
        )
        self.pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(),
            (self.heads, self.d_k),
        )

    @staticmethod
    def rel_shift(x):
        """(B, H, T, 2T-1) -> (B, H, T, T): keep columns so that output
        [..., i, j] = input[..., i, (T-1) + (j - i)]."""
        B, H, T, _ = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(B, H, 2 * T, T)
        x = x[:, :, 1:].reshape(B, H, T, 2 * T - 1)
        return x[..., :T]

    def __call__(self, x_q, x_kv, mask=None, pos_emb=None, *,
                 deterministic: bool = True):
        assert pos_emb is not None
        q, k, v = self._qkv(x_q, x_kv)
        Tq = q.shape[1]
        Np = pos_emb.shape[1]
        p = self.linear_pos(pos_emb).reshape(-1, Np, self.heads, self.d_k)
        q_u = q + self.pos_bias_u[None, None]
        q_v = q + self.pos_bias_v[None, None]
        matrix_ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
        matrix_bd = jnp.einsum("bthd,nshd->bhts", q_v, p)
        if Np == 2 * Tq - 1:
            matrix_bd = self.rel_shift(matrix_bd)
        scores = (matrix_ac + matrix_bd[..., : k.shape[1]]) / jnp.sqrt(
            jnp.asarray(self.d_k, jnp.float32)
        ).astype(q.dtype)
        return self._attend(scores, v, mask, deterministic)


class RelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Rel-pos MHA, WeNet flavor: scores = (q+u)k^T + (q+v)p^T, no rel_shift."""

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.d_model, use_bias=False)
        self.pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(),
            (self.heads, self.d_k),
        )
        self.pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(),
            (self.heads, self.d_k),
        )

    def __call__(self, x_q, x_kv, mask=None, pos_emb=None, *,
                 deterministic: bool = True, cache=None,
                 return_cache: bool = False):
        assert pos_emb is not None, "rel_pos attention needs pos_emb"
        q, k, v = self._qkv(x_q, x_kv)
        new_cache = None
        if cache is not None:
            # pos_emb must cover cache + current key positions
            k, v, mask, new_cache = self._with_cache(k, v, mask, cache)
        Np = pos_emb.shape[1]
        p = self.linear_pos(pos_emb).reshape(-1, Np, self.heads, self.d_k)
        q_u = q + self.pos_bias_u[None, None]
        q_v = q + self.pos_bias_v[None, None]
        matrix_ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
        matrix_bd = jnp.einsum("bthd,nshd->bhts", q_v, p)
        scores = (matrix_ac + matrix_bd[..., : k.shape[1]]) / jnp.sqrt(
            jnp.asarray(self.d_k, jnp.float32)
        ).astype(q.dtype)
        out = self._attend(scores, v, mask, deterministic)
        if return_cache:
            return out, new_cache
        return out
