"""LCA banded attention vs dense-masked reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.models.lca import LimitedRelPositionAttention


def dense_reference(params, x, pos_emb, valid, heads, d_k, left, right,
                    n_global, spacing):
    """Straight-line full-T^2 implementation of the LCA semantics."""
    p = params["params"]

    def lin(name, v, bias=True):
        out = v @ p[name]["kernel"]
        if bias and "bias" in p[name]:
            out = out + p[name]["bias"]
        return out

    B, T, D = x.shape
    q = lin("linear_q", x).reshape(B, T, heads, d_k)
    k = lin("linear_k", x).reshape(B, T, heads, d_k)
    v = lin("linear_v", x).reshape(B, T, heads, d_k)
    pe = (pos_emb @ p["linear_pos"]["kernel"]).reshape(
        1, T, heads, d_k)
    pe = np.broadcast_to(pe, (B, T, heads, d_k))
    qu = q + np.asarray(p["pos_bias_u"])[None, None]
    qv = q + np.asarray(p["pos_bias_v"])[None, None]
    scores = (
        np.einsum("bthd,bshd->bhts", qu, k)
        + np.einsum("bthd,bshd->bhts", qv, pe)
    ) / np.sqrt(d_k)

    g_idx = np.arange(n_global) * spacing
    is_g = np.zeros(T, bool)
    is_g[g_idx] = True
    t = np.arange(T)
    rel = t[None, :] - t[:, None]  # key - query
    local_ok = (rel >= -left) & (rel <= right)
    allowed = local_ok & ~is_g[None, :] | is_g[None, :]      # (T, T)
    allowed = allowed[None, None] & valid[:, None, None, :]  # (B,1,T,T)
    # global queries attend everything valid
    full = np.broadcast_to(valid[:, None, None, :], scores.shape).copy()
    allowed = np.broadcast_to(allowed, scores.shape).copy()
    allowed[:, :, is_g, :] = full[:, :, is_g, :]
    scores = np.where(allowed, scores, -1e10)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    probs = np.where(scores > -1e9, np.asarray(probs), 0.0)
    out = np.einsum("bhts,bshd->bthd", probs, v)
    return lin("linear_out", out.reshape(B, T, heads * d_k))


@pytest.mark.parametrize("T,left,right,G", [
    (40, 8, 8, 0), (40, 8, 8, 2), (37, 4, 4, 1), (16, 8, 8, 1),
])
def test_banded_matches_dense(T, left, right, G):
    heads, d_model = 2, 16
    mod = LimitedRelPositionAttention(
        heads=heads, d_model=d_model, dropout_rate=0.0,
        context_size=(left, right), global_tokens=G,
        global_tokens_spacing=3,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, T, d_model))
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, T, d_model)) * 0.1
    valid = np.ones((2, T), bool)
    valid[1, T - 5 :] = False
    params = mod.init(jax.random.PRNGKey(2), x, x,
                      jnp.asarray(valid)[:, None, :], pos)
    got = np.asarray(mod.apply(params, x, x,
                               jnp.asarray(valid)[:, None, :], pos))
    want = dense_reference(params, np.asarray(x), np.asarray(pos), valid,
                           heads, d_model // heads, left, right, G, 3)
    # compare only valid query positions
    for b in range(2):
        n = int(valid[b].sum())
        np.testing.assert_allclose(got[b, :n], want[b, :n], rtol=2e-4,
                                   atol=2e-4)


def test_lca_in_encoder():
    from paper_accurate_fast_cheap_tpu.models.conformer import (
        ConformerEncoder,
    )

    enc = ConformerEncoder(
        input_size=80, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=1, selfattention_layer_type="limited_rel_selfattn",
        rwkv_conf={"att_context_size": (8, 8), "global_tokens": 1},
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 80))
    lens = jnp.asarray([64, 40])
    params = enc.init(jax.random.PRNGKey(1), x, lens)
    out, olens = enc.apply(params, x, lens)
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()
