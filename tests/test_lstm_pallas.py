"""Fused Pallas LSTM predictor step (`ops/lstm_pallas.py`) parity.

Interpret mode on CPU; the beam only engages the kernel on TPU, so
these tests pin the kernel's math to the XLA predictor step it
replaces (`models/predictor.RNNPredictor.forward_step`).
"""
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.decode import rnnt_search
from paper_accurate_fast_cheap_tpu.models import factory
from paper_accurate_fast_cheap_tpu.ops import lstm_pallas

VOCAB = 80


def _model_and_params(dtype=jnp.float32):
    config = {
        "model": "transducer",
        "encoder": "conformer",
        "encoder_conf": {"output_size": 128, "attention_heads": 4,
                         "linear_units": 256, "num_blocks": 1,
                         "input_layer": "conv2d"},
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 128, "output_size": 128,
                           "hidden_size": 128, "num_layers": 2,
                           "embed_dropout": 0.1, "dropout": 0.1},
        "joint_conf": {"join_dim": 128},
        "decoder": None,
        "model_conf": {"ctc_weight": 0.3, "transducer_weight": 0.7,
                       "attention_weight": 0.0},
    }
    model, _ = factory.init_model(config, VOCAB, 80)
    feats = jnp.zeros((1, 64, 80), jnp.float32)
    lens = jnp.asarray([64])
    params = model.init(jax.random.PRNGKey(0), feats, lens,
                        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]))
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            params)
    return model, params


def test_kernel_matches_xla_step_f32():
    """Direct kernel call in f32 (strict tolerance; the .fused wrapper
    itself only engages the kernel for 2-byte dtypes — see supported())."""
    model, params = _model_and_params()
    pred_step, joint_step, init_state = \
        rnnt_search.make_transducer_step_fns(model, params)
    assert hasattr(pred_step, "fused"), "rnn predictor must expose .fused"
    R = 16
    st = init_state(R)
    tok = jnp.asarray(np.random.default_rng(0).integers(1, VOCAB, R),
                      jnp.int32)
    out_x, st_x = pred_step(params, tok, st)
    pred = params["params"]["predictor"]
    x = jnp.take(pred["embed"]["embedding"], tok, axis=0)
    layers = tuple(
        (pred[f"lstm_{i}"]["ih"]["kernel"], pred[f"lstm_{i}"]["ih"]["bias"],
         pred[f"lstm_{i}"]["hh"]) for i in range(2))
    out_f, nhs, ncs = lstm_pallas.lstm_predictor_step(
        x, st[0], st[1], layers, pred["projection"]["kernel"],
        pred["projection"]["bias"])
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_x, np.float32),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip((nhs, ncs), jax.tree.leaves(st_x)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-4)
    # second step from the fused state (state layout round-trips)
    out2, _ = pred_step.fused(params, tok, (nhs, ncs))
    assert np.isfinite(np.asarray(out2, np.float32)).all()


def test_fused_predictor_step_bf16_class():
    model, params = _model_and_params(jnp.bfloat16)
    pred_step, _, init_state = \
        rnnt_search.make_transducer_step_fns(model, params)
    R = 8
    st = init_state(R)
    tok = jnp.asarray(np.random.default_rng(1).integers(1, VOCAB, R),
                      jnp.int32)
    out_x, _ = pred_step(params, tok, st)
    out_f, _ = pred_step.fused(params, tok, st)
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_x, np.float32),
                               rtol=0.05, atol=0.05)


def test_unaligned_width_falls_back_to_xla():
    """supported() rejects non-lane-aligned dims; .fused must route to
    the XLA step and still be correct."""
    assert not lstm_pallas.supported(100, 128, 128, 16)
    assert not lstm_pallas.supported(128, 128, 128, 13)  # rows % 8
    # f32 pinning broke VMEM coloring on chip -> 2-byte dtypes only
    assert not lstm_pallas.supported(128, 128, 128, 16, jnp.float32)
    assert lstm_pallas.supported(128, 128, 128, 16, jnp.bfloat16)
    model, params = _model_and_params()
    pred_step, _, init_state = \
        rnnt_search.make_transducer_step_fns(model, params)
    R = 12  # not a multiple of 8 -> fallback branch inside .fused
    st = init_state(R)
    tok = jnp.asarray(np.random.default_rng(2).integers(1, VOCAB, R),
                      jnp.int32)
    out_x, _ = pred_step(params, tok, st)
    out_f, _ = pred_step.fused(params, tok, st)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-6, atol=1e-6)
