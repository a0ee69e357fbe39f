"""Exactness of the Pallas vocab top-k vs the XLA `top_k_vocab`.

The kernel must be a bit-exact drop-in (same selection, same tie rules)
so the device beam's hypotheses are identical whichever impl runs —
`decode/rnnt_search.py` parity against the reference depends on it.
CPU runs use pallas interpret mode (same code path the TPU compiles).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.decode.rnnt_search import top_k_vocab
from paper_accurate_fast_cheap_tpu.ops.topk_pallas import (
    supported, top_k_vocab_pallas)


def _check(x, k):
    v0, i0 = top_k_vocab(jnp.asarray(x), k)
    v1, i1 = top_k_vocab_pallas(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


@pytest.mark.parametrize("shape,k", [
    ((4, 8, 5002), 8),       # the SF/LF product point (V=vocab, beam 8)
    ((2, 3, 2000), 4),       # odd rows (row padding) + non-pow2 V
    ((16, 1537), 8),         # 2-D input, V % 128 != 0
])
def test_matches_xla_random(shape, k):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 5
    assert supported(shape, k)
    _check(x, k)


def test_adversarial_ties():
    # many exact duplicates across chunk boundaries; quantized values so
    # equal floats occur constantly — tie-break rules must agree
    rng = np.random.default_rng(0)
    x = rng.integers(-6, 6, size=(8, 8, 2048)).astype(np.float32)
    _check(x, 8)


def test_neg_inf_rows_and_lanes():
    x = np.random.default_rng(1).normal(size=(4, 4, 1664)).astype(np.float32)
    x[0, 1] = -np.inf                      # dead beam row
    x[2, :, 700:] = -np.inf                # masked vocab tail
    v0, _ = top_k_vocab(jnp.asarray(x), 6)
    v1, _ = top_k_vocab_pallas(jnp.asarray(x), 6)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    # indices of -inf entries are unspecified in both impls; finite
    # entries must agree exactly
    _check(x[1:2], 6)


def test_fallback_outside_envelope():
    # small V routes to the XLA path inside top_k_vocab_pallas
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 600))
    assert not supported(x.shape, 8)
    _check(x, 8)


@pytest.mark.parametrize("B,N,V,tw,cw", [
    (2, 8, 2000, 0.7, 0.3),
    (3, 4, 1100, 1.0, 0.0),     # ctc_weight 0 -> log_cw = -inf
])
def test_fused_matches_unfused(B, N, V, tw, cw):
    import math
    from paper_accurate_fast_cheap_tpu.ops.topk_pallas import (
        fused_top_k_vocab_pallas)
    logp = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(7), (B * N, V)))
    ctc = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(8), (B, V)))
    ltw = math.log(tw) if tw > 0 else -math.inf
    lcw = math.log(cw) if cw > 0 else -math.inf
    fused = jnp.logaddexp(ltw + logp, lcw + jnp.repeat(ctc, N, axis=0))
    v0, i0 = top_k_vocab(fused.reshape(B, N, V), N)
    v1, i1 = fused_top_k_vocab_pallas(logp, ctc, N, ltw, lcw)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_device_beam_identical_across_topk_impls():
    """rnnt_beam_search hypotheses are identical with topk_impl pallas/xla.

    Tiny shapes (V=1100 > the 8*128 kernel gate, T=3) keep interpret-mode
    pallas fast on CPU."""
    from paper_accurate_fast_cheap_tpu.decode import rnnt_search

    B, T, V, H = 2, 3, 1100, 16
    key = jax.random.PRNGKey(3)
    enc = jax.random.normal(key, (B, T, H))
    ctc = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(4), (B, T, V)))
    E = jax.random.normal(jax.random.PRNGKey(5), (V, H)) * 0.1
    A = jax.random.normal(jax.random.PRNGKey(6), (H, V)) * 0.1

    def predictor_step(params, tokens, state):
        s = jnp.tanh(state + params["E"][tokens])
        return s, s

    def joint_step(params, enc_t, pred):
        return jax.nn.log_softmax((enc_t + pred) @ params["A"])

    params = {"E": E, "A": A}
    outs = {}
    for impl in ("xla", "pallas"):
        res = rnnt_search.rnnt_beam_search(
            predictor_step, joint_step, lambda n: jnp.zeros((n, H)),
            enc, jnp.full((B,), T, jnp.int32), ctc, beam_size=4,
            params=params, topk_impl=impl)
        outs[impl] = res
    for a, b in zip(outs["xla"], outs["pallas"]):
        assert a.tokens == b.tokens
        assert a.nbest == b.nbest
        np.testing.assert_allclose(a.nbest_scores, b.nbest_scores)
