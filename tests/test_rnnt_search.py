"""Transducer search algorithms on synthetic deterministic models."""
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.decode import rnnt_search

V = D = 10


def predictor_step(tokens, state):
    """Toy predictor: output = one-hot of last token; state unused."""
    return jax.nn.one_hot(tokens, D), state


def joint_step(enc_t, pred_out):
    """Emit the token encoded in enc_t unless the predictor just emitted it
    (then blank)."""
    logits = enc_t * 10.0
    same = jnp.sum(enc_t * pred_out, -1, keepdims=True) > 0.5
    blank_boost = jnp.where(same, 20.0, -20.0)
    logits = logits.at[:, 0].set(blank_boost[:, 0])
    return jax.nn.log_softmax(logits)


def test_greedy_synthetic():
    seq = [5, 7, 3]
    enc = jax.nn.one_hot(jnp.asarray([seq]), D)
    res = rnnt_search.basic_greedy_search(
        predictor_step, joint_step, jnp.zeros((1,)), enc, jnp.asarray([3])
    )
    assert res[0].tokens == [5, 7, 3]


def test_greedy_respects_lengths():
    seq = [5, 7, 3, 2]
    enc = jax.nn.one_hot(jnp.asarray([seq]), D)
    res = rnnt_search.basic_greedy_search(
        predictor_step, joint_step, jnp.zeros((1,)), enc, jnp.asarray([2])
    )
    assert res[0].tokens == [5, 7]


def test_beam_synthetic_no_fusion():
    seq = [5, 7, 3]
    enc = jax.nn.one_hot(jnp.asarray([seq]), D)
    ctc = jnp.log(jnp.full((1, 3, V), 1.0 / V))
    res = rnnt_search.rnnt_beam_search(
        predictor_step, joint_step, lambda n: jnp.zeros((n,)),
        enc, jnp.asarray([3]), ctc, beam_size=4,
        ctc_weight=0.0, transducer_weight=1.0,
    )
    assert res[0].tokens == [5, 7, 3]
    assert res[0].nbest_scores == sorted(res[0].nbest_scores, reverse=True)


def test_beam_ctc_fusion_prefers_ctc_when_transducer_uniform():
    """With an uninformative transducer, spiky CTC posteriors drive the beam
    (shallow fusion semantics of prefix_beam_search.py:128-131)."""
    T = 5
    enc = jnp.zeros((1, T, D))  # joint gives uniform-ish logits

    def flat_joint(enc_t, pred_out):
        return jax.nn.log_softmax(jnp.zeros((enc_t.shape[0], V)))

    ctc = jnp.full((1, T, V), -20.0)
    # CTC strongly wants: blank, 4, blank, 6, blank
    for t, tok in enumerate([0, 4, 0, 6, 0]):
        ctc = ctc.at[0, t, tok].set(0.0)
    res = rnnt_search.rnnt_beam_search(
        predictor_step, flat_joint, lambda n: jnp.zeros((n,)),
        enc, jnp.asarray([T]), ctc, beam_size=4,
        ctc_weight=0.9, transducer_weight=0.1,
    )
    assert res[0].tokens == [4, 6]


def test_beam_batch_independent():
    """Batched search must not leak state across utterances."""
    seq0, seq1 = [5, 7, 3], [2, 8, 1]
    enc = jax.nn.one_hot(jnp.asarray([seq0, seq1]), D)
    ctc = jnp.log(jnp.full((2, 3, V), 1.0 / V))
    res = rnnt_search.rnnt_beam_search(
        predictor_step, joint_step, lambda n: jnp.zeros((n,)),
        enc, jnp.asarray([3, 3]), ctc, beam_size=3,
        ctc_weight=0.0, transducer_weight=1.0,
    )
    assert res[0].tokens == seq0
    assert res[1].tokens == seq1


def test_greedy_multi_emission():
    """n_steps>1 emits multiple symbols per frame (synthetic model that
    wants to emit token sequence per frame: enc one-hot of first token, and
    after emitting x the joint wants x+1 once, then blank)."""

    def joint2(enc_t, pred_out):
        # desired: emit token from enc unless predictor already emitted it
        # or its successor; after successor -> blank
        tok = jnp.argmax(enc_t, -1)
        last = jnp.argmax(pred_out, -1)
        want = jnp.where(last == tok, tok + 1,
                         jnp.where(last == tok + 1, 0, tok))
        return jnp.log(jax.nn.one_hot(want, V) + 1e-8)

    seq = [3, 6]
    enc = jax.nn.one_hot(jnp.asarray([seq]), V)
    res1 = rnnt_search.basic_greedy_search(
        predictor_step, joint2, jnp.zeros((1,)), enc, jnp.asarray([2]),
        n_steps=1)
    res2 = rnnt_search.basic_greedy_search(
        predictor_step, joint2, jnp.zeros((1,)), enc, jnp.asarray([2]),
        n_steps=3)
    assert res1[0].tokens == [3, 6]          # one per frame
    assert res2[0].tokens == [3, 4, 6, 7]    # pairs per frame
