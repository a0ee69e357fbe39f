"""Mamba-2 SSD op + block tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.ops import ssd


def _inputs(key, Bt=2, T=37, H=4, P=8, G=2, N=6):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (Bt, T, H, P))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (Bt, T, H)))
    A = -jnp.exp(jax.random.normal(ks[2], (H,)) * 0.5)
    B = jax.random.normal(ks[3], (Bt, T, G, N))
    C = jax.random.normal(ks[4], (Bt, T, G, N))
    D = jnp.ones((H,)) * 0.5
    return x, dt, A, B, C, D


def test_chunked_matches_ref():
    x, dt, A, B, C, D = _inputs(jax.random.PRNGKey(0))
    y_ref = ssd.ssd_ref(x, dt, A, B, C, D)
    for L in (8, 16, 64):
        y = ssd.ssd_chunked(x, dt, A, B, C, D, chunk_size=L)
        np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_state_carry():
    x, dt, A, B, C, D = _inputs(jax.random.PRNGKey(1), T=32)
    y_full, S_full = ssd.ssd_chunked(x, dt, A, B, C, D, chunk_size=8,
                                     return_state=True)
    h = 16
    y1, S1 = ssd.ssd_chunked(x[:, :h], dt[:, :h], A, B[:, :h], C[:, :h], D,
                             chunk_size=8, return_state=True)
    y2, S2 = ssd.ssd_chunked(x[:, h:], dt[:, h:], A, B[:, h:], C[:, h:], D,
                             state=S1, chunk_size=8, return_state=True)
    np.testing.assert_allclose(jnp.concatenate([y1, y2], 1), y_full,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(S2, S_full, rtol=2e-4, atol=2e-4)


def test_grads_match():
    x, dt, A, B, C, D = _inputs(jax.random.PRNGKey(2), Bt=1, T=20, H=2,
                                P=4, G=1, N=4)

    def loss(fn):
        def f(x, dt, B, C):
            return jnp.sum(jnp.tanh(fn(x, dt, A, B, C, D)))
        return jax.grad(f, argnums=(0, 1, 2, 3))(x, dt, B, C)

    g_ref = loss(lambda *a: ssd.ssd_ref(*a))
    g_chk = loss(lambda *a: ssd.ssd_chunked(*a, chunk_size=8))
    for a, b in zip(g_ref, g_chk):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_mamba_block_and_encoder():
    from paper_accurate_fast_cheap_tpu.models.conformer import (
        ConformerEncoder,
    )

    enc = ConformerEncoder(
        input_size=80, output_size=64, attention_heads=4, linear_units=64,
        num_blocks=1, selfattention_layer_type="mamba_att",
        rwkv_conf={"rnn_att_direction": "bi"},
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 80))
    lens = jnp.asarray([64, 48])
    params = enc.init(jax.random.PRNGKey(1), x, lens)
    out, olens = enc.apply(params, x, lens)
    assert out.shape == (2, 15, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_mamba_bidirectional_padding_invariance():
    from paper_accurate_fast_cheap_tpu.models.mamba import MambaAttention

    mod = MambaAttention(head_size=8, d_model=32, n_layers=1,
                         direction="bi", d_state=16, chunk_size=8)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 20, 32))
    params = mod.init(jax.random.PRNGKey(4), x, lengths=jnp.asarray([20]))
    out_a = mod.apply(params, x, lengths=jnp.asarray([20]))
    pad = jax.random.normal(jax.random.PRNGKey(5), (1, 12, 32)) * 50
    x_pad = jnp.concatenate([x, pad], axis=1)
    out_b = mod.apply(params, x_pad, lengths=jnp.asarray([20]))
    np.testing.assert_allclose(np.asarray(out_a),
                               np.asarray(out_b)[:, :20],
                               rtol=2e-3, atol=2e-3)
