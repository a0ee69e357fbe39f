"""Analytic custom-VJP backward of the chunked WKV6 vs autodiff oracles.

The reference ships four hand-written backward CUDA scan kernels
(`wenet/rwkv_v6/cuda/wkv6_cuda.cu:66-263`); here the backward is two calls
of the chunked dual core plus a reverse-cumsum decay-gradient identity
(`ops/wkv6.wkv6_backward`).  These tests pin it against (a) XLA autodiff of
the IDENTICAL chunked primal and (b) autodiff of the naive scan oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.ops.wkv6 import (
    wkv6,
    wkv6_chunked,
    wkv6_chunked_vjp,
    wkv6_ref,
)

NAMES = ("r", "k", "v", "w", "u", "state")


def _rand(key, B=2, T=70, H=2, N=8, wscale=1.0, wshift=-1.0):
    ks = jax.random.split(key, 8)
    r = jax.random.normal(ks[0], (B, T, H, N))
    k = jax.random.normal(ks[1], (B, T, H, N))
    v = jax.random.normal(ks[2], (B, T, H, N))
    w = jax.random.normal(ks[3], (B, T, H, N)) * wscale + wshift
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    S0 = jax.random.normal(ks[5], (B, H, N, N))
    cot_y = jax.random.normal(ks[6], (B, T, H, N))
    cot_S = jax.random.normal(ks[7], (B, H, N, N))
    return r, k, v, w, u, S0, cot_y, cot_S


def _check(got, want, rtol):
    for n, a, b in zip(NAMES, want, got):
        # absolute escape: an exactly-zero autodiff grad (e.g. the decay
        # grad at T=1, where no cross-step pair exists) must not amplify
        # fp32 noise into a relative failure
        diff = float(jnp.max(jnp.abs(a - b)))
        if diff < 1e-5:
            continue
        err = diff / (float(jnp.max(jnp.abs(a))) + 1e-9)
        assert err < rtol, f"grad[{n}] rel err {err:.3e} >= {rtol}"


def test_grads_match_chunked_autodiff_with_state():
    r, k, v, w, u, S0, cot_y, cot_S = _rand(jax.random.PRNGKey(0))

    def loss(fn):
        def f(*a):
            y, S = fn(*a[:5], state=a[5], chunk_size=32, inner_size=8,
                      return_state=True)
            return jnp.sum(y * cot_y) + jnp.sum(S * cot_S)
        return f

    args = (r, k, v, w, u, S0)
    g_ad = jax.grad(loss(wkv6_chunked), argnums=tuple(range(6)))(*args)
    g_cv = jax.grad(loss(wkv6_chunked_vjp), argnums=tuple(range(6)))(*args)
    _check(g_cv, g_ad, 1e-4)


def test_grads_match_scan_oracle():
    # mild decay logits so the chunked path's overflow clamp never binds
    r, k, v, w, u, S0, cot_y, cot_S = _rand(
        jax.random.PRNGKey(1), wscale=0.3, wshift=-0.5)

    def loss_ref(*a):
        y, S = wkv6_ref(*a[:5], state=a[5], return_state=True)
        return jnp.sum(y * cot_y) + jnp.sum(S * cot_S)

    def loss_cv(*a):
        y, S = wkv6_chunked_vjp(*a[:5], state=a[5], chunk_size=32,
                                inner_size=8, return_state=True)
        return jnp.sum(y * cot_y) + jnp.sum(S * cot_S)

    args = (r, k, v, w, u, S0)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_cv = jax.grad(loss_cv, argnums=tuple(range(6)))(*args)
    _check(g_cv, g_ref, 1e-4)


def test_grads_no_state_padding_path():
    # T=70 with chunk 32 exercises the pad-to-multiple path
    r, k, v, w, u, _, cot_y, _ = _rand(jax.random.PRNGKey(2))

    def l_ad(*a):
        return jnp.sum(wkv6_chunked(*a, chunk_size=32, inner_size=8) * cot_y)

    def l_cv(*a):
        return jnp.sum(
            wkv6_chunked_vjp(*a, chunk_size=32, inner_size=8) * cot_y)

    args = (r, k, v, w, u)
    g_ad = jax.grad(l_ad, argnums=tuple(range(5)))(*args)
    g_cv = jax.grad(l_cv, argnums=tuple(range(5)))(*args)
    _check(g_cv, g_ad, 1e-4)


def test_grads_clamped_decay_region():
    # decay logits pushed above the clamp log(160/(S+2)): autodiff of the
    # clamped primal zeroes those gradients; the analytic path must agree
    r, k, v, w, u, _, cot_y, _ = _rand(
        jax.random.PRNGKey(3), T=64, wscale=2.0, wshift=2.5)

    def l_ad(*a):
        return jnp.sum(wkv6_chunked(*a, chunk_size=16, inner_size=8) * cot_y)

    def l_cv(*a):
        return jnp.sum(
            wkv6_chunked_vjp(*a, chunk_size=16, inner_size=8) * cot_y)

    args = (r, k, v, w, u)
    g_ad = jax.grad(l_ad, argnums=tuple(range(5)))(*args)
    g_cv = jax.grad(l_cv, argnums=tuple(range(5)))(*args)
    # near-total clamping makes the decay gradient a small difference of
    # large cumulative sums — fp32 cancellation noise, not structure, so
    # the tolerance here is looser than in the mild-decay tests
    _check(g_cv, g_ad, 5e-4)
    clamp = np.log(160.0 / 10.0)
    wg = np.asarray(g_cv[3])
    assert np.all(wg[np.asarray(w) > clamp] == 0.0)


def test_dispatcher_default_uses_custom_vjp():
    r, k, v, w, u, _, cot_y, _ = _rand(jax.random.PRNGKey(4), T=32)

    def l_disp(*a):
        return jnp.sum(wkv6(*a, chunk_size=16) * cot_y)

    # the custom-vjp rule must be on the path: its backward never stores
    # chunk intermediates, and its grads must match the autodiff variant
    def l_ad(*a):
        return jnp.sum(wkv6(*a, chunk_size=16, impl="chunked_ad") * cot_y)

    g_d = jax.grad(l_disp, argnums=tuple(range(5)))(r, k, v, w, u)
    g_a = jax.grad(l_ad, argnums=tuple(range(5)))(r, k, v, w, u)
    _check(g_d, g_a, 1e-4)


def test_bf16_grads_finite_and_close():
    r, k, v, w, u, _, cot_y, _ = _rand(jax.random.PRNGKey(5), T=64)
    rb, kb, vb, wb = (x.astype(jnp.bfloat16) for x in (r, k, v, w))

    def l16(*a):
        return jnp.sum(
            wkv6_chunked_vjp(*a, u, chunk_size=16).astype(jnp.float32)
            * cot_y)

    def l32(*a):
        return jnp.sum(wkv6_chunked(*a, u, chunk_size=16) * cot_y)

    g16 = jax.grad(l16, argnums=(0, 1, 2, 3))(rb, kb, vb, wb)
    g32 = jax.grad(l32, argnums=(0, 1, 2, 3))(r, k, v, w)
    for n, a, b in zip(NAMES, g32, g16):
        b = b.astype(jnp.float32)
        assert bool(jnp.all(jnp.isfinite(b))), f"grad[{n}] not finite"
        denom = float(jnp.max(jnp.abs(a))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b))) / denom
        assert err < 0.1, f"bf16 grad[{n}] rel err {err:.3e}"


def test_pallas_backward_is_analytic():
    # the pallas wrapper's backward routes through wkv6_backward; on CPU the
    # pallas forward runs in interpret mode so this stays a cheap check
    from paper_accurate_fast_cheap_tpu.ops import wkv6_pallas

    r, k, v, w, u, _, cot_y, _ = _rand(jax.random.PRNGKey(6), T=64)

    def l_pl(*a):
        return jnp.sum(
            wkv6_pallas.wkv6_pallas(*a, u, chunk_size=32) * cot_y)

    def l_ad(*a):
        return jnp.sum(wkv6_chunked(*a, u, chunk_size=32) * cot_y)

    g_pl = jax.grad(l_pl, argnums=(0, 1, 2, 3))(r, k, v, w)
    g_ad = jax.grad(l_ad, argnums=(0, 1, 2, 3))(r, k, v, w)
    _check(g_pl, g_ad, 1e-4)


@pytest.mark.parametrize("T,chunk,inner", [
    (1, 16, 8), (5, 16, 8), (16, 16, 16), (33, 16, 4), (8, 256, 16),
])
def test_edge_shapes(T, chunk, inner):
    ks = jax.random.split(jax.random.PRNGKey(T), 6)
    B, H, N = 1, 2, 4
    r, k, v = (jax.random.normal(kk, (B, T, H, N)) for kk in ks[:3])
    w = jax.random.normal(ks[3], (B, T, H, N)) - 1.0
    u = jax.random.normal(ks[4], (H, N)) * 0.5
    cot = jax.random.normal(ks[5], (B, T, H, N))

    def l_ad(*a):
        return jnp.sum(
            wkv6_chunked(*a, chunk_size=chunk, inner_size=inner) * cot)

    def l_cv(*a):
        return jnp.sum(
            wkv6_chunked_vjp(*a, chunk_size=chunk, inner_size=inner) * cot)

    g_ad = jax.grad(l_ad, argnums=tuple(range(5)))(r, k, v, w, u)
    g_cv = jax.grad(l_cv, argnums=tuple(range(5)))(r, k, v, w, u)
    _check(g_cv, g_ad, 5e-4)


def test_dual_core_locksteps_forward():
    """`_chunked_dual`'s y-contraction + u-bonus must equal `wkv6_chunked`.

    The dual core intentionally mirrors (not calls) the forward's
    machinery to keep the benchmark hot path untouched; this pins the two
    implementations in lockstep so a numerics fix to one cannot silently
    miss the other."""
    from paper_accurate_fast_cheap_tpu.ops.wkv6 import _chunked_dual

    r, k, v, w, u, S0, cot_y, _ = _rand(jax.random.PRNGKey(7), T=70)
    y_fwd, S_fwd = wkv6_chunked(r, k, v, w, u, state=S0, chunk_size=32,
                                inner_size=8, return_state=True)
    y_nb, _, S_dual = _chunked_dual(r, k, v, cot_y, w, S0, 32, 8,
                                    jnp.float32)
    diag = jnp.sum(r * u[None, None] * k, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(y_nb + diag * v),
                               np.asarray(y_fwd), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(S_dual), np.asarray(S_fwd),
                               rtol=2e-5, atol=2e-5)


def test_remat_over_custom_vjp():
    """gradient_checkpointing (jax.checkpoint) composes with the analytic
    VJP: rematerialized encoder grads equal plain encoder grads."""
    from paper_accurate_fast_cheap_tpu.models import conformer

    def build(gc):
        return conformer.ConformerEncoder(
            input_size=80, output_size=64, attention_heads=2, num_blocks=2,
            linear_units=128, dropout_rate=0.0, positional_dropout_rate=0.0,
            attention_dropout_rate=0.0,
            selfattention_layer_type="rwkv_tmix60_bidirectional",
            gradient_checkpointing=gc,
            rwkv_conf={"rwkv_do_bfloat16": False},
        )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 96, 80))
    lens = jnp.array([96, 60])
    params = build(False).init(jax.random.PRNGKey(1), x, lens,
                               deterministic=True)

    def loss(gc):
        enc = build(gc)

        def f(p):
            y, _ = enc.apply(p, x, lens, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(y ** 2)
        return f

    g0 = jax.jit(jax.grad(loss(False)))(params)
    g1 = jax.jit(jax.grad(loss(True)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        assert err < 1e-5, err
