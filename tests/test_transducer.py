"""Transducer model: loss composition, overfit, greedy + beam decode."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.decode import rnnt_search
from paper_accurate_fast_cheap_tpu.models.transducer import Transducer
from paper_accurate_fast_cheap_tpu.train import schedulers, train_step

VOCAB = 12


def _tiny_transducer():
    return Transducer(
        vocab_size=VOCAB,
        encoder_conf=dict(
            input_size=16, output_size=32, attention_heads=2,
            linear_units=64, num_blocks=1,
            selfattention_layer_type="rwkv_tmix60_bidirectional",
            dropout_rate=0.0, positional_dropout_rate=0.0,
            input_layer="linear",
        ),
        predictor_conf=dict(embed_size=32, hidden_size=32, output_size=32,
                            num_layers=1, embed_dropout=0.0, dropout=0.0),
        joint_conf=dict(join_dim=32),
        decoder_conf=dict(attention_heads=2, linear_units=64, num_blocks=1,
                          r_num_blocks=1, dropout_rate=0.0),
        transducer_weight=0.6, ctc_weight=0.2, attention_weight=0.2,
        reverse_weight=0.3, sos=VOCAB - 1, eos=VOCAB - 1,
        rnnt_t_chunk=4,
    )


def _batch(key):
    B, T = 2, 50
    feats = jax.random.normal(key, (B, T, 16))
    flens = jnp.asarray([T, T - 10])
    labels = jnp.asarray([[3, 5, 7, 0], [2, 9, 4, 6]], jnp.int32)
    llens = jnp.asarray([3, 4], jnp.int32)
    return feats, flens, labels, llens


def test_loss_composition():
    model = _tiny_transducer()
    feats, flens, labels, llens = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), feats, flens, labels, llens)
    out = model.apply(params, feats, flens, labels, llens)
    np.testing.assert_allclose(
        float(out["loss"]),
        0.6 * float(out["loss_rnnt"]) + 0.2 * float(out["loss_ctc"])
        + 0.2 * float(out["loss_att"]),
        rtol=1e-5,
    )
    assert np.isfinite(float(out["loss"]))


def test_transducer_overfit_and_decode():
    model = _tiny_transducer()
    feats, flens, labels, llens = _batch(jax.random.PRNGKey(2))
    params = model.init(jax.random.PRNGKey(3), feats, flens, labels, llens)

    def loss_fn(p, batch, rng):
        out = model.apply(p, *batch, deterministic=False,
                          rngs={"dropout": rng})
        return out["loss"], {}

    opt = train_step.make_optimizer(
        "adam", schedulers.steady_lr(5e-3, warmup_steps=10), grad_clip=5.0
    )
    step = jax.jit(train_step.make_train_step(loss_fn, opt))
    state = train_step.init_train_state(params, opt)
    batch = (feats, flens, labels, llens)
    first = None
    for i in range(300):
        state, loss, _ = step(state, batch, jax.random.PRNGKey(10 + i))
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5

    p = state.params
    enc, enc_lens = model.apply(p, feats, flens,
                                method=model.forward_encoder)

    predictor_step = jax.jit(
        lambda tok, st: model.apply(p, tok, st, method=model.predictor_step)
    )
    joint_step = jax.jit(
        lambda e, pr: model.apply(p, e, pr, method=model.joint_step)
    )
    init_state_fn = functools.partial(
        model.apply, p, method=model.predictor_init_state
    )

    res_g = rnnt_search.basic_greedy_search(
        predictor_step, joint_step, init_state_fn(2), enc, enc_lens
    )
    # greedy can drop tokens whose emission probability is smeared across
    # frames (per-frame argmax < blank even though the summed path prob is
    # high); require a subsequence missing at most one token.  Beam search
    # below must be exact.
    def is_subseq(a, b):
        it = iter(b)
        return all(x in it for x in a)

    assert is_subseq(res_g[0].tokens, [3, 5, 7])
    assert len(res_g[0].tokens) >= 2
    assert is_subseq(res_g[1].tokens, [2, 9, 4, 6])
    assert len(res_g[1].tokens) >= 3

    # pure-transducer beam (ctc fusion off): the toy CTC head's posteriors
    # are not spiky, and the reference's per-frame fusion rule re-emits
    # tokens on smeared posteriors; fusion behavior is covered by the
    # synthetic test in test_rnnt_search.py.
    ctc_probs = model.apply(p, enc, method=model.ctc_logprobs)
    res_b = rnnt_search.rnnt_beam_search(
        predictor_step, joint_step, init_state_fn, enc, enc_lens,
        ctc_probs, beam_size=4, ctc_weight=0.0, transducer_weight=1.0,
    )
    assert res_b[0].tokens == [3, 5, 7]
    assert res_b[1].tokens == [2, 9, 4, 6]
    # nbest is sorted
    assert res_b[0].nbest_scores == sorted(res_b[0].nbest_scores,
                                           reverse=True)


# --- bidirectional transducer (wenet/transducer_espnet/bitransducer.py) ----

def test_reverse_features_pad_list():
    from paper_accurate_fast_cheap_tpu.models.bitransducer import (
        reverse_features_pad_list,
    )

    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 3),
                    jnp.float32)
    lens = jnp.asarray([5, 3])
    out = np.asarray(reverse_features_pad_list(x, lens))
    np.testing.assert_allclose(out[0], np.asarray(x)[0, ::-1])
    np.testing.assert_allclose(out[1, :3], np.asarray(x)[1, 2::-1])
    np.testing.assert_allclose(out[1, 3:], 0.0)


def test_bitransducer_loss_composition():
    from paper_accurate_fast_cheap_tpu.models.bitransducer import (
        BiTransducer,
    )

    model = BiTransducer(
        vocab_size=VOCAB,
        encoder_conf=dict(
            input_size=16, output_size=32, attention_heads=2,
            linear_units=64, num_blocks=1, dropout_rate=0.0,
            positional_dropout_rate=0.0, input_layer="linear",
        ),
        predictor_conf=dict(embed_size=32, hidden_size=32, output_size=32,
                            num_layers=1, embed_dropout=0.0, dropout=0.0),
        joint_conf=dict(join_dim=32),
        rnnt_t_chunk=4,
    )
    feats, flens, labels, llens = _batch(jax.random.PRNGKey(2))
    params = model.init(jax.random.PRNGKey(3), feats, flens, labels, llens)
    out = jax.jit(model.apply)(params, feats, flens, labels, llens)
    np.testing.assert_allclose(
        float(out["loss"]),
        0.7 * float(out["loss_rnnt"]) + 0.3 * float(out["loss_rnnt_r"]),
        rtol=1e-5,
    )
    assert np.isfinite(float(out["loss"]))
    # the two branches are independent heads over the same encoder: with a
    # palindromic batch they should still differ (separate params), but both
    # must be finite and of similar magnitude
    assert abs(float(out["loss_rnnt"]) - float(out["loss_rnnt_r"])) < 10.0
