"""WKV6 op: chunked (MXU) formulation vs naive scan oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.ops.wkv6 import wkv6_chunked, wkv6_ref


def _rand_inputs(key, B=2, T=37, H=3, N=8, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    r = jax.random.normal(ks[0], (B, T, H, N), dtype)
    k = jax.random.normal(ks[1], (B, T, H, N), dtype)
    v = jax.random.normal(ks[2], (B, T, H, N), dtype)
    # raw decay logits in a realistic range: decay = exp(-exp(w))
    w = jax.random.normal(ks[3], (B, T, H, N), dtype) * 1.0 - 2.0
    u = jax.random.normal(ks[4], (H, N), dtype) * 0.5
    return r, k, v, w, u


def test_chunked_matches_ref_fp32():
    r, k, v, w, u = _rand_inputs(jax.random.PRNGKey(0))
    y_ref = wkv6_ref(r, k, v, w, u)
    for L in (8, 16):
        y = wkv6_chunked(r, k, v, w, u, chunk_size=L)
        np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_chunked_matches_ref_T_multiple_of_chunk():
    r, k, v, w, u = _rand_inputs(jax.random.PRNGKey(1), T=64)
    y_ref = wkv6_ref(r, k, v, w, u)
    y = wkv6_chunked(r, k, v, w, u, chunk_size=16)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_state_carry_equals_full_sequence():
    r, k, v, w, u = _rand_inputs(jax.random.PRNGKey(2), T=64)
    y_full, S_full = wkv6_chunked(r, k, v, w, u, chunk_size=16,
                                  return_state=True)
    half = 32
    y1, S1 = wkv6_chunked(r[:, :half], k[:, :half], v[:, :half], w[:, :half],
                          u, chunk_size=16, return_state=True)
    y2, S2 = wkv6_chunked(r[:, half:], k[:, half:], v[:, half:], w[:, half:],
                          u, state=S1, chunk_size=16, return_state=True)
    np.testing.assert_allclose(jnp.concatenate([y1, y2], 1), y_full,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(S2, S_full, rtol=2e-4, atol=2e-4)


def test_ref_state_carry():
    r, k, v, w, u = _rand_inputs(jax.random.PRNGKey(3), T=20)
    y_full, S_full = wkv6_ref(r, k, v, w, u, return_state=True)
    y1, S1 = wkv6_ref(r[:, :9], k[:, :9], v[:, :9], w[:, :9], u,
                      return_state=True)
    y2, S2 = wkv6_ref(r[:, 9:], k[:, 9:], v[:, 9:], w[:, 9:], u, state=S1,
                      return_state=True)
    np.testing.assert_allclose(jnp.concatenate([y1, y2], 1), y_full,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(S2, S_full, rtol=1e-5, atol=1e-5)


def test_bf16_io_fp32_accum():
    r, k, v, w, u = _rand_inputs(jax.random.PRNGKey(4), T=48)
    y_ref = wkv6_ref(r, k, v, w, u)
    cast = lambda x: x.astype(jnp.bfloat16)
    y = wkv6_chunked(cast(r), cast(k), cast(v), cast(w), cast(u),
                     chunk_size=16)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32), y_ref,
                               rtol=0.05, atol=0.05)


def test_grads_match_ref():
    r, k, v, w, u = _rand_inputs(jax.random.PRNGKey(5), B=1, T=24, H=2, N=4)

    def loss_via(fn):
        def f(r, k, v, w, u):
            y = fn(r, k, v, w, u)
            return jnp.sum(jnp.sin(y))
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(r, k, v, w, u)

    g_ref = loss_via(wkv6_ref)
    g_chk = loss_via(lambda *a: wkv6_chunked(*a, chunk_size=8))
    for a, b in zip(g_ref, g_chk):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_strong_decay_is_stable():
    # decays near 0 (large w logits) must not produce inf/nan
    r, k, v, w, u = _rand_inputs(jax.random.PRNGKey(6), T=40)
    w = jnp.full_like(w, 1.5)  # decay = exp(-exp(1.5)) ~ 0.011
    y = wkv6_chunked(r, k, v, w, u, chunk_size=16)
    y_ref = wkv6_ref(r, k, v, w, u)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(y, y_ref, rtol=2e-3, atol=2e-3)
