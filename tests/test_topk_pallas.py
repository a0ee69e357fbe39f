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


@pytest.mark.parametrize("B,N,V,D,tw,cw", [
    (2, 8, 2048, 128, 0.7, 0.3),
    (3, 4, 1203, 256, 0.7, 0.3),    # V % 128 != 0 -> -inf pad columns
    (2, 4, 1280, 128, 1.0, 0.0),    # ctc_weight 0 -> log_cw = -inf
])
def test_joint_fused_matches_oracle(B, N, V, D, tw, cw):
    """joint_top_k_vocab_pallas == f32 XLA oracle of the same math.

    Oracle: logits = x @ w + b (f32), logp = log_softmax, fused =
    logaddexp(ltw+logp, lcw+ctc_rep), then `top_k_vocab`.  Indices must
    match exactly; values to f32 tolerance (the kernel's streaming
    logsumexp sums tiles in a different order than XLA's reduce)."""
    import math
    from paper_accurate_fast_cheap_tpu.ops.topk_pallas import (
        joint_top_k_vocab_pallas)
    x = jax.random.normal(jax.random.PRNGKey(10), (B * N, D)) * 0.5
    w = jax.random.normal(jax.random.PRNGKey(11), (D, V)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(12), (V,)) * 0.1
    ctc = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(13), (B, V)))
    ltw = math.log(tw) if tw > 0 else -math.inf
    lcw = math.log(cw) if cw > 0 else -math.inf
    logp = jax.nn.log_softmax(x @ w + b)
    fused = jnp.logaddexp(ltw + logp, lcw + jnp.repeat(ctc, N, axis=0))
    v0, i0 = top_k_vocab(fused.reshape(B, N, V), N)
    v1, i1 = joint_top_k_vocab_pallas(x, w, b, ctc, N, ltw, lcw)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=1e-5, atol=1e-5)


def test_joint_fused_tie_semantics():
    """Exact logit ties (duplicated w columns + equal bias) must break to
    the lowest global vocab index, matching `top_k_vocab`."""
    from paper_accurate_fast_cheap_tpu.ops.topk_pallas import (
        joint_top_k_vocab_pallas)
    B, N, V, D = 2, 4, 1408, 128
    rng = np.random.default_rng(2)
    w = rng.normal(size=(D, V)).astype(np.float32)
    # duplicate blocks of columns across chunk boundaries -> exact ties
    w[:, 400:420] = w[:, 100:120]
    w[:, 1300:1320] = w[:, 100:120]
    b = np.zeros((V,), np.float32)
    b[400:420] = b[100:120]
    x = rng.normal(size=(B * N, D)).astype(np.float32) * 0.3
    ctc = np.full((B, V), -np.log(V), np.float32)   # uniform -> ties kept
    logp = jax.nn.log_softmax(jnp.asarray(x) @ w + b)
    fused = jnp.logaddexp(np.log(0.7) + logp,
                          np.log(0.3) + jnp.repeat(jnp.asarray(ctc), N, 0))
    v0, i0 = top_k_vocab(fused.reshape(B, N, V), N)
    v1, i1 = joint_top_k_vocab_pallas(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(ctc),
        N, float(np.log(0.7)), float(np.log(0.3)))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_joint_fused_fallback_outside_envelope():
    """D % 128 != 0 or small V routes to the XLA fallback (same answer)."""
    import math
    from paper_accurate_fast_cheap_tpu.ops.topk_pallas import (
        joint_top_k_vocab_pallas)
    B, N, V, D = 2, 4, 1100, 96          # D not lane-aligned
    x = jax.random.normal(jax.random.PRNGKey(20), (B * N, D))
    w = jax.random.normal(jax.random.PRNGKey(21), (D, V)) * 0.2
    b = jnp.zeros((V,))
    ctc = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(22), (B, V)))
    ltw, lcw = math.log(0.7), math.log(0.3)
    logp = jax.nn.log_softmax(x @ w + b)
    fused = jnp.logaddexp(ltw + logp, lcw + jnp.repeat(ctc, N, axis=0))
    v0, i0 = top_k_vocab(fused.reshape(B, N, V), N)
    v1, i1 = joint_top_k_vocab_pallas(x, w, b, ctc, N, ltw, lcw)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)


def test_device_beam_joint_fused_matches_xla(tiny_transducer):
    """Full search parity: topk_impl='pallas_joint' == 'xla' hypotheses.

    Uses the real Transducer model via `make_transducer_step_fns` (the
    attribute-carrying split joint fns) in f32 on CPU interpret mode."""
    from paper_accurate_fast_cheap_tpu.decode import rnnt_search
    model, params, enc, enc_lens, ctc = tiny_transducer
    fns = rnnt_search.make_transducer_step_fns(model, params)
    assert hasattr(fns[1], "preact")
    r_xla = rnnt_search.rnnt_beam_search(
        *fns, enc, enc_lens, ctc, beam_size=4, params=params,
        topk_impl="xla")
    r_jf = rnnt_search.rnnt_beam_search(
        *fns, enc, enc_lens, ctc, beam_size=4, params=params,
        topk_impl="pallas_joint")
    for a, b in zip(r_xla, r_jf):
        assert a.tokens == b.tokens
        assert abs(a.score - b.score) < 1e-3


@pytest.fixture(scope="module")
def tiny_transducer():
    from paper_accurate_fast_cheap_tpu.models import factory
    config = {
        "model": "transducer",
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 64, "attention_heads": 2, "linear_units": 128,
            "num_blocks": 1, "input_layer": "conv2d",
            "selfattention_layer_type": "rwkv_tmix60",
            "rwkv_head_size": 16},
        "predictor": "rnn",
        "predictor_conf": {
            "embed_size": 32, "output_size": 32, "embed_dropout": 0.1,
            "hidden_size": 32, "num_layers": 1, "dropout": 0.1},
        "joint_conf": {"join_dim": 128},
        "decoder": None,
        "model_conf": {"ctc_weight": 0.3, "transducer_weight": 0.7,
                       "attention_weight": 0.0},
    }
    model, _ = factory.init_model(config, 1200, 80)
    B, T = 2, 48
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80))
    lens = jnp.array([T, T - 13], jnp.int32)
    params = model.init(jax.random.PRNGKey(1), feats[:1, :40], lens[:1],
                        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]))
    enc, enc_lens = model.apply(params, feats, lens,
                                method=model.forward_encoder)
    ctc = model.apply(params, enc, method=model.ctc_logprobs)
    return model, params, enc, enc_lens, ctc
