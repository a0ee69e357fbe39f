"""Limited-context attention (LCA) with global tokens.

Parity target: `wenet/transformer/attention.py:406-1056`
(LimitedRelPositionMultiHeadedAttention): Longformer sliding-window
attention with symmetric context (e.g. 256 frames each side) plus NeMo-style
global tokens that attend everywhere and are attended by everyone; rel-pos
scores without rel_shift (like `attention.py:396-399`).

TPU-first design: instead of the reference's skew/overlapping-chunk matmul
gymnastics (`:861-1056`), keys/values are gathered into per-block banded
context tensors — each query block of W attends its 3 neighbouring key
blocks — giving O(T * 3W) memory and MXU-shaped (W x 3W) score matmuls.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models.attention import (
    MultiHeadedAttention,
    NEG_INF,
)


def _banded_context(x: jax.Array) -> jax.Array:
    """(B, H, NB, W, D) -> (B, H, NB, 3W, D): [prev, self, next] blocks."""
    prev = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))[:, :, :-1]
    nxt = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))[:, :, 1:]
    return jnp.concatenate([prev, x, nxt], axis=3)


class LimitedRelPositionAttention(MultiHeadedAttention):
    """Sliding-window rel-pos attention + global tokens."""

    context_size: Tuple[int, int] = (256, 256)
    global_tokens: int = 0
    global_tokens_spacing: int = 1

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
                 deterministic: bool = True):
        left, right = self.context_size
        W = max(left, right)
        B, T, _ = x_q.shape
        H, Dk = self.heads, self.d_k
        q, k, v = self._qkv(x_q, x_kv)          # (B, T, H, Dk)
        scale = 1.0 / jnp.sqrt(jnp.asarray(Dk, jnp.float32)).astype(q.dtype)

        if pos_emb is not None:
            p = self.linear_pos(pos_emb).reshape(-1, pos_emb.shape[1], H, Dk)
            p = jnp.broadcast_to(p, (B, T, H, Dk))
        else:
            p = jnp.zeros_like(k)
        q_u = (q + self.pos_bias_u[None, None]).transpose(0, 2, 1, 3)
        q_v = (q + self.pos_bias_v[None, None]).transpose(0, 2, 1, 3)
        kT = k.transpose(0, 2, 1, 3)
        vT = v.transpose(0, 2, 1, 3)
        pT = p.transpose(0, 2, 1, 3)            # (B, H, T, Dk)

        valid = (
            mask[:, 0, :] if mask is not None and mask.ndim == 3
            else (mask if mask is not None
                  else jnp.ones((B, T), bool))
        )

        pad = (-T) % W
        Tp = T + pad
        NB = Tp // W

        def blockify(a):  # (B,H,T,D) -> (B,H,NB,W,D)
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))
            return a.reshape(B, H, NB, W, Dk)

        qb_u, qb_v = blockify(q_u), blockify(q_v)
        kb, vb, pb = map(_banded_context, (blockify(kT), blockify(vT),
                                           blockify(pT)))
        valid_p = jnp.pad(valid, ((0, 0), (0, pad)))
        vmask_blocks = valid_p.reshape(B, NB, W)
        vmask_band = jnp.concatenate([
            jnp.pad(vmask_blocks, ((0, 0), (1, 0), (0, 0)))[:, :-1],
            vmask_blocks,
            jnp.pad(vmask_blocks, ((0, 0), (0, 1), (0, 0)))[:, 1:],
        ], axis=2)                               # (B, NB, 3W)

        scores = (
            jnp.einsum("bhnwd,bhncd->bhnwc", qb_u, kb)
            + jnp.einsum("bhnwd,bhncd->bhnwc", qb_v, pb)
        ) * scale                                # (B, H, NB, W, 3W)

        # relative-distance mask: key pos (block offset) - query pos in
        # [-left, right]
        qpos = jnp.arange(W)[:, None]
        kpos = jnp.arange(3 * W)[None, :] - W
        rel = kpos - qpos
        band_ok = (rel >= -left) & (rel <= right)
        band_mask = band_ok[None, None, None] & \
            vmask_band[:, None, :, None, :]

        G = self.global_tokens
        if G > 0:
            # exclude global keys from the local band (they get their own
            # score columns below; NeMo semantics, no double counting)
            g_idx = jnp.arange(G) * self.global_tokens_spacing
            is_global = jnp.zeros((Tp,), bool).at[g_idx].set(True)
            ig_blocks = is_global.reshape(NB, W)
            ig_band = jnp.concatenate([
                jnp.pad(ig_blocks, ((1, 0), (0, 0)))[:-1],
                ig_blocks,
                jnp.pad(ig_blocks, ((0, 1), (0, 0)))[1:],
            ], axis=1)                           # (NB, 3W)
            band_mask = band_mask & ~ig_band[None, None, :, None, :]
        scores = jnp.where(band_mask, scores, NEG_INF)

        if G > 0:
            kg = kT[:, :, g_idx]                 # (B, H, G, Dk)
            vg = vT[:, :, g_idx]
            pg = pT[:, :, g_idx]
            # non-global queries also attend the global tokens (content +
            # positional terms, consistent with the banded columns)
            scores_g = (
                jnp.einsum("bhnwd,bhgd->bhnwg", qb_u, kg)
                + jnp.einsum("bhnwd,bhgd->bhnwg", qb_v, pg)
            ) * scale
            g_valid = valid[:, g_idx]
            scores_g = jnp.where(
                g_valid[:, None, None, None, :], scores_g, NEG_INF
            )
            all_scores = jnp.concatenate([scores, scores_g], axis=-1)
        else:
            all_scores = scores

        probs = jax.nn.softmax(all_scores, axis=-1)
        probs = jnp.where(all_scores > NEG_INF / 2, probs, 0.0)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        out = jnp.einsum("bhnwc,bhncd->bhnwd", probs[..., : 3 * W], vb)
        if G > 0:
            out = out + jnp.einsum(
                "bhnwg,bhgd->bhnwd", probs[..., 3 * W :], vg
            )
        out = out.reshape(B, H, Tp, Dk)[:, :, :T]

        if G > 0:
            # global queries attend the full sequence
            qg_u = q_u[:, :, g_idx]
            qg_v = q_v[:, :, g_idx]
            sg = (
                jnp.einsum("bhgd,bhtd->bhgt", qg_u, kT)
                + jnp.einsum("bhgd,bhtd->bhgt", qg_v, pT)
            ) * scale
            sg = jnp.where(valid[:, None, None, :], sg, NEG_INF)
            pg = jax.nn.softmax(sg, axis=-1)
            pg = self.attn_dropout(pg, deterministic=deterministic)
            og = jnp.einsum("bhgt,bhtd->bhgd", pg, vT)
            out = out.at[:, :, g_idx].set(og)

        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.d_model)
        return self.linear_out(out)
