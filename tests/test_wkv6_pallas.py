"""Pallas WKV6 kernel vs scan oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.ops.wkv6 import wkv6_ref
from paper_accurate_fast_cheap_tpu.ops.wkv6_pallas import wkv6_pallas

# 5 = per-head two-pass kernel, 6 = lane-packed issue-minimal kernel,
# 7 = single-pass carried-state kernel (minimal I/O)
VERSIONS = [5, 6, 7]


def _inputs(key, B=2, T=40, H=2, N=64, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    mk = lambda k: jax.random.normal(k, (B, T, H, N), dtype)
    r, k, v, w = mk(ks[0]), mk(ks[1]), mk(ks[2]), mk(ks[3]) - 2.0
    u = jax.random.normal(ks[4], (H, N), dtype) * 0.5
    return r, k, v, w, u


@pytest.mark.parametrize("version", VERSIONS)
def test_pallas_matches_ref(version):
    r, k, v, w, u = _inputs(jax.random.PRNGKey(0))
    y_ref = wkv6_ref(r, k, v, w, u)
    y = wkv6_pallas(r, k, v, w, u, chunk_size=32, version=version)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("version", VERSIONS)
def test_pallas_multi_chunk(version):
    r, k, v, w, u = _inputs(jax.random.PRNGKey(1), T=100)
    y_ref = wkv6_ref(r, k, v, w, u)
    y = wkv6_pallas(r, k, v, w, u, chunk_size=32, version=version)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=3e-4, atol=3e-4)


def test_pallas_v6_odd_heads_and_ragged_t():
    """v6 packs heads into lanes; H=3 exercises the G=1 fallback and
    T=57 the pad/unpad path."""
    r, k, v, w, u = _inputs(jax.random.PRNGKey(7), B=2, T=57, H=3, N=32)
    y_ref = wkv6_ref(r, k, v, w, u)
    y = wkv6_pallas(r, k, v, w, u, chunk_size=32, version=6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("version", VERSIONS)
def test_pallas_grad_via_chunked_recompute(version):
    r, k, v, w, u = _inputs(jax.random.PRNGKey(2), B=1, T=32, H=1, N=64)

    def f(fn):
        return jax.grad(
            lambda r, k, v, w, u: jnp.sum(jnp.sin(fn(r, k, v, w, u))),
            argnums=(0, 1, 2, 3, 4))(r, k, v, w, u)

    g_p = f(lambda *a: wkv6_pallas(*a, chunk_size=16, version=version))
    g_r = f(wkv6_ref)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("version", VERSIONS)
def test_pallas_carried_state_and_final_state(version):
    """Two-pass kernels: carried-in state and final-state output are
    native (no chunked-path fallback); streaming split == full forward."""
    r, k, v, w, u = _inputs(jax.random.PRNGKey(3), B=2, T=100, H=4)
    S0 = jnp.asarray(
        np.random.RandomState(9).randn(2, 4, 64, 64).astype(np.float32) * 0.3
    )
    y_ref, S_ref = wkv6_ref(r, k, v, w, u, state=S0, return_state=True)
    y, S = wkv6_pallas(r, k, v, w, u, state=S0, return_state=True,
                       version=version)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_ref),
                               rtol=2e-3, atol=2e-3)
    # streaming: two halves with carried state == full run
    y_a, S_a = wkv6_pallas(
        r[:, :50], k[:, :50], v[:, :50], w[:, :50], u,
        state=S0, return_state=True, version=version)
    y_b = wkv6_pallas(
        r[:, 50:], k[:, 50:], v[:, 50:], w[:, 50:], u, state=S_a,
        version=version)
    y_cat = jnp.concatenate([y_a, y_b], axis=1)
    np.testing.assert_allclose(np.asarray(y_cat), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)
