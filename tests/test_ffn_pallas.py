"""Fused Pallas FFN kernel (`ops/ffn_pallas.py`) parity tests.

Runs in interpret mode on CPU (conftest forces the cpu backend); the
kernel-vs-XLA numerics class and the module wiring are what is under
test — on-chip wall-clock lives in BENCH_SWEEP.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.ops import ffn_pallas
from paper_accurate_fast_cheap_tpu.models.convolution import (
    PositionwiseFeedForward,
)


def _mats(rng, D, H, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(3, 50, D)), dtype)
    w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.05, dtype)
    b1 = jnp.asarray(rng.normal(size=(H,)), dtype)
    w2 = jnp.asarray(rng.normal(size=(H, D)) * 0.05, dtype)
    b2 = jnp.asarray(rng.normal(size=(D,)), dtype)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("act", ["swish", "relu", "gelu", "hardtanh"])
def test_fused_matches_ref_f32(act):
    rng = np.random.default_rng(0)
    x, w1, b1, w2, b2 = _mats(rng, 128, 256)
    y = ffn_pallas.fused_ffn(x, w1, b1, w2, b2, act)
    ref = ffn_pallas._ffn_ref(x, w1, b1, w2, b2, act)
    assert y.shape == ref.shape and y.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_fused_bf16_rounding_class():
    rng = np.random.default_rng(1)
    x, w1, b1, w2, b2 = _mats(rng, 128, 256, jnp.bfloat16)
    y = ffn_pallas.fused_ffn(x, w1, b1, w2, b2, "swish")
    ref = ffn_pallas._ffn_ref(x, w1, b1, w2, b2, "swish")
    assert y.dtype == jnp.bfloat16
    # bias/act run in f32 in-kernel -> rounding-class differences only
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def test_row_padding_and_odd_rows():
    """R=3*50=150 is not a multiple of the row block -> pad + slice."""
    rng = np.random.default_rng(2)
    x, w1, b1, w2, b2 = _mats(rng, 128, 128)
    y = ffn_pallas.fused_ffn(x, w1, b1, w2, b2, "relu", rows=64)
    ref = ffn_pallas._ffn_ref(x, w1, b1, w2, b2, "relu")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_unaligned_width_falls_back():
    rng = np.random.default_rng(3)
    x, w1, b1, w2, b2 = _mats(rng, 100, 200)  # not %128
    assert not ffn_pallas.supported(x.shape, 100, 200, x.dtype)
    y = ffn_pallas.fused_ffn(x, w1, b1, w2, b2, "swish")
    ref = ffn_pallas._ffn_ref(x, w1, b1, w2, b2, "swish")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)


def test_grad_matches_xla_formula():
    """custom-VJP recompute == autodiff of the plain formula (teacher
    branches of the train step differentiate through deterministic
    forwards, so the kernel must be grad-safe)."""
    rng = np.random.default_rng(4)
    x, w1, b1, w2, b2 = _mats(rng, 128, 128)

    def f_fused(*a):
        return jnp.sum(ffn_pallas.fused_ffn(*a, "swish") ** 2)

    def f_ref(*a):
        return jnp.sum(ffn_pallas._ffn_ref(*a, act="swish") ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_module_param_tree_unchanged_and_paths_agree():
    """The rewired PositionwiseFeedForward keeps nn.Dense's Dense_0/
    Dense_1 tree (checkpoint compat) and its xla/pallas paths agree."""
    m_xla = PositionwiseFeedForward(d_model=128, hidden=256, impl="xla")
    m_pal = PositionwiseFeedForward(d_model=128, hidden=256, impl="pallas")
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 9, 128)),
                    jnp.float32)
    p = m_xla.init(jax.random.PRNGKey(0), x)
    assert set(p["params"]) == {"Dense_0", "Dense_1"}
    assert p["params"]["Dense_0"]["kernel"].shape == (128, 256)
    y1 = m_xla.apply(p, x)
    y2 = m_pal.apply(p, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6,
                               atol=1e-5)


def test_dropout_active_uses_xla_path():
    """impl='auto' + training dropout must not enter the kernel (dropout
    sits between act and the second matmul)."""
    m = PositionwiseFeedForward(d_model=128, hidden=256, dropout_rate=0.5)
    x = jnp.ones((2, 8, 128), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = m.apply(p, x, deterministic=True)
    # dropout actually applied (outputs differ) and finite
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.max(jnp.abs(y - y2))) > 0
