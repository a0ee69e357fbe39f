"""Analytic custom-VJP backward of the chunked SSD vs autodiff oracles.

The reference's `mamba_ssm` ships hand-written Triton backward kernels for
`mamba_chunk_scan_combined`; here the backward is two calls of the chunked
dual core plus the scalar log-decay reverse-cumsum identity
(`ops/ssd.ssd_backward`).  Pinned against XLA autodiff of the identical
chunked primal and the naive scan oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.ops.ssd import (
    ssd,
    ssd_chunked,
    ssd_chunked_vjp,
    ssd_ref,
)

NAMES = ("x", "dt", "A", "B", "C", "D", "state")


def _rand(key, Bt=2, T=70, H=4, P=8, G=2, N=6):
    ks = jax.random.split(key, 9)
    x = jax.random.normal(ks[0], (Bt, T, H, P))
    dt = jnp.abs(jax.random.normal(ks[1], (Bt, T, H))) + 0.05
    A = -jnp.abs(jax.random.normal(ks[2], (H,))) - 0.1
    B = jax.random.normal(ks[3], (Bt, T, G, N))
    C = jax.random.normal(ks[4], (Bt, T, G, N))
    D = jax.random.normal(ks[5], (H,))
    S0 = jax.random.normal(ks[6], (Bt, H, N, P))
    cot_y = jax.random.normal(ks[7], (Bt, T, H, P))
    cot_S = jax.random.normal(ks[8], (Bt, H, N, P))
    return x, dt, A, B, C, D, S0, cot_y, cot_S


def _check(got, want, rtol, names=NAMES):
    for n, a, b in zip(names, want, got):
        # absolute escape: an exactly-zero autodiff grad (e.g. the decay
        # grad at T=1, where no cross-step pair exists) must not amplify
        # fp32 noise into a relative failure
        diff = float(jnp.max(jnp.abs(a - b)))
        if diff < 1e-5:
            continue
        err = diff / (float(jnp.max(jnp.abs(a))) + 1e-9)
        assert err < rtol, f"grad[{n}] rel err {err:.3e} >= {rtol}"


def test_grads_match_chunked_autodiff_full_surface():
    x, dt, A, B, C, D, S0, cot_y, cot_S = _rand(jax.random.PRNGKey(0))

    def loss(fn):
        def f(*a):
            y, S = fn(*a[:6], state=a[6], chunk_size=16, return_state=True)
            return jnp.sum(y * cot_y) + jnp.sum(S * cot_S)
        return f

    args = (x, dt, A, B, C, D, S0)
    g_ad = jax.grad(loss(ssd_chunked), argnums=tuple(range(7)))(*args)
    g_cv = jax.grad(loss(ssd_chunked_vjp), argnums=tuple(range(7)))(*args)
    _check(g_cv, g_ad, 1e-4)


def test_grads_match_scan_oracle():
    x, dt, A, B, C, D, S0, cot_y, cot_S = _rand(jax.random.PRNGKey(1))

    def loss_ref(*a):
        y, S = ssd_ref(*a[:6], state=a[6], return_state=True)
        return jnp.sum(y * cot_y) + jnp.sum(S * cot_S)

    def loss_cv(*a):
        y, S = ssd_chunked_vjp(*a[:6], state=a[6], chunk_size=16,
                               return_state=True)
        return jnp.sum(y * cot_y) + jnp.sum(S * cot_S)

    args = (x, dt, A, B, C, D, S0)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    g_cv = jax.grad(loss_cv, argnums=tuple(range(7)))(*args)
    _check(g_cv, g_ref, 1e-4)


def test_grads_no_D_no_state_padding_path():
    x, dt, A, B, C, _, _, cot_y, _ = _rand(jax.random.PRNGKey(2))

    def l_ad(*a):
        return jnp.sum(ssd_chunked(*a, chunk_size=16) * cot_y)

    def l_cv(*a):
        return jnp.sum(ssd_chunked_vjp(*a, chunk_size=16) * cot_y)

    args = (x, dt, A, B, C)
    g_ad = jax.grad(l_ad, argnums=tuple(range(5)))(*args)
    g_cv = jax.grad(l_cv, argnums=tuple(range(5)))(*args)
    _check(g_cv, g_ad, 1e-4)


def test_dispatcher_default_uses_custom_vjp():
    x, dt, A, B, C, D, _, cot_y, _ = _rand(jax.random.PRNGKey(3), T=64)

    def l_disp(*a):
        return jnp.sum(ssd(*a, chunk_size=16) * cot_y)

    def l_ad(*a):
        return jnp.sum(ssd(*a, chunk_size=16, impl="chunked_ad") * cot_y)

    args = (x, dt, A, B, C, D)
    g_d = jax.grad(l_disp, argnums=tuple(range(6)))(*args)
    g_a = jax.grad(l_ad, argnums=tuple(range(6)))(*args)
    _check(g_d, g_a, 1e-4)


def test_bf16_grads_finite_and_close():
    x, dt, A, B, C, D, _, cot_y, _ = _rand(jax.random.PRNGKey(4), T=64)
    xb, Bb, Cb = (z.astype(jnp.bfloat16) for z in (x, B, C))

    def l16(xx, bb, cc):
        return jnp.sum(
            ssd_chunked_vjp(xx, dt, A, bb, cc, D,
                            chunk_size=16).astype(jnp.float32) * cot_y)

    def l32(xx, bb, cc):
        return jnp.sum(ssd_chunked(xx, dt, A, bb, cc, D,
                                   chunk_size=16) * cot_y)

    g16 = jax.grad(l16, argnums=(0, 1, 2))(xb, Bb, Cb)
    g32 = jax.grad(l32, argnums=(0, 1, 2))(x, B, C)
    for n, a, b in zip(("x", "B", "C"), g32, g16):
        b = b.astype(jnp.float32)
        assert bool(jnp.all(jnp.isfinite(b))), f"grad[{n}] not finite"
        denom = float(jnp.max(jnp.abs(a))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b))) / denom
        assert err < 0.1, f"bf16 grad[{n}] rel err {err:.3e}"


@pytest.mark.parametrize("T,chunk", [(1, 8), (7, 8), (8, 8), (17, 8),
                                     (4, 64)])
def test_edge_shapes(T, chunk):
    ks = jax.random.split(jax.random.PRNGKey(100 + T), 6)
    Bt, H, P, G, N = 1, 2, 4, 1, 3
    x = jax.random.normal(ks[0], (Bt, T, H, P))
    dt = jnp.abs(jax.random.normal(ks[1], (Bt, T, H))) + 0.05
    A = -jnp.abs(jax.random.normal(ks[2], (H,))) - 0.1
    B = jax.random.normal(ks[3], (Bt, T, G, N))
    C = jax.random.normal(ks[4], (Bt, T, G, N))
    cot = jax.random.normal(ks[5], (Bt, T, H, P))

    def l_ad(*a):
        return jnp.sum(ssd_chunked(*a, chunk_size=chunk) * cot)

    def l_cv(*a):
        return jnp.sum(ssd_chunked_vjp(*a, chunk_size=chunk) * cot)

    g_ad = jax.grad(l_ad, argnums=tuple(range(5)))(x, dt, A, B, C)
    g_cv = jax.grad(l_cv, argnums=tuple(range(5)))(x, dt, A, B, C)
    _check(g_cv, g_ad, 5e-4, names=("x", "dt", "A", "B", "C"))


def test_dual_core_locksteps_forward():
    """`_ssd_dual` with (u=b*dt, q=C, probe=ybar) + D-skip must equal
    `ssd_chunked` (the dual mirrors, not calls, the forward's machinery;
    this pins them in lockstep)."""
    from paper_accurate_fast_cheap_tpu.ops.ssd import _ssd_dual

    x, dt, A, B, C, D, S0, cot_y, _ = _rand(jax.random.PRNGKey(8))
    y_fwd, S_fwd = ssd_chunked(x, dt, A, B, C, D, state=S0, chunk_size=16,
                               return_state=True)
    rep = x.shape[2] // B.shape[2]
    Bh = jnp.repeat(B, rep, axis=2)
    Ch = jnp.repeat(C, rep, axis=2)
    la = dt * A[None, None, :]
    u = Bh * dt[..., None]
    yA, _, S_dual = _ssd_dual(u, x, la, Ch, cot_y, S0, 16)
    y = yA + x * D[None, None, :, None]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_fwd),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(S_dual), np.asarray(S_fwd),
                               rtol=2e-5, atol=2e-5)
