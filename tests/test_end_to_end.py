"""End-to-end slice: fbank -> conformer CTC/AED -> train -> greedy decode.

Mirrors the reference's empirical QA (SURVEY.md §4): overfit a tiny batch and
check the model can reproduce it with greedy CTC.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paper_accurate_fast_cheap_tpu.decode import search
from paper_accurate_fast_cheap_tpu.frontend import features
from paper_accurate_fast_cheap_tpu.models.asr_model import ASRModel
from paper_accurate_fast_cheap_tpu.train import schedulers, train_step

VOCAB = 12


def _tiny_model(ctc_weight=0.3, reverse_weight=0.3):
    return ASRModel(
        vocab_size=VOCAB,
        encoder_conf=dict(
            input_size=80, output_size=64, attention_heads=4,
            linear_units=128, num_blocks=2,
            selfattention_layer_type="rwkv_tmix60_bidirectional",
            dropout_rate=0.0, positional_dropout_rate=0.0,
        ),
        decoder_conf=dict(attention_heads=4, linear_units=128,
                          num_blocks=1, r_num_blocks=1, dropout_rate=0.0),
        ctc_weight=ctc_weight,
        reverse_weight=reverse_weight,
        sos=VOCAB - 1, eos=VOCAB - 1,
    )


def _toy_batch(key):
    """Synthetic 'audio': distinct waveform patterns per label sequence."""
    B, S = 2, 16000
    wavs = jax.random.normal(key, (B, S)) * 1000.0
    feats, flens = features.fbank_batch(wavs, jnp.asarray([S, S]))
    labels = jnp.asarray([[3, 5, 7, 0], [2, 2, 9, 4]], jnp.int32)
    label_lens = jnp.asarray([3, 4], jnp.int32)
    return feats, flens, labels, label_lens


def test_overfit_tiny_batch_and_greedy_decode():
    model = _tiny_model()
    feats, flens, labels, label_lens = _toy_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), feats, flens, labels,
                        label_lens)

    def loss_fn(p, batch, rng):
        out = model.apply(p, *batch, deterministic=False,
                          rngs={"dropout": rng})
        return out["loss"], {"loss_ctc": out["loss_ctc"],
                             "loss_att": out["loss_att"]}

    opt = train_step.make_optimizer(
        "adam", schedulers.steady_lr(3e-3, warmup_steps=10), grad_clip=5.0,
    )
    step = jax.jit(train_step.make_train_step(loss_fn, opt))
    state = train_step.init_train_state(params, opt)
    batch = (feats, flens, labels, label_lens)
    losses = []
    for i in range(120):
        state, loss, metrics = step(state, batch,
                                    jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # greedy decode reproduces the labels
    enc, enc_lens = model.apply(state.params, feats, flens,
                                method=model.forward_encoder)
    logp = model.apply(state.params, enc, method=model.ctc_logprobs)
    res = search.ctc_greedy_search(np.asarray(logp), np.asarray(enc_lens))
    assert res[0].tokens == [3, 5, 7]
    assert res[1].tokens == [2, 2, 9, 4]

    # prefix beam search agrees with greedy on an overfit model
    res_b = search.ctc_prefix_beam_search(np.asarray(logp),
                                          np.asarray(enc_lens), beam_size=5)
    assert res_b[0].tokens == [3, 5, 7]
    assert res_b[1].tokens == [2, 2, 9, 4]

    # attention rescoring keeps the right hypothesis on top
    def dec_apply(enc_, lens_, ys_in, ys_lens, r_ys_in, rw):
        return model.apply(state.params, enc_, lens_, ys_in, ys_lens,
                           r_ys_in, rw, method=model.decoder_forward)

    res_r = search.attention_rescoring(
        dec_apply, enc, enc_lens, res_b, sos=VOCAB - 1, eos=VOCAB - 1,
        ctc_weight=0.3, reverse_weight=0.3,
    )
    assert res_r[0].tokens == [3, 5, 7]


def test_loss_dict_contents():
    model = _tiny_model()
    feats, flens, labels, label_lens = _toy_batch(jax.random.PRNGKey(2))
    params = model.init(jax.random.PRNGKey(3), feats, flens, labels,
                        label_lens)
    out = model.apply(params, feats, flens, labels, label_lens)
    for k in ("loss", "loss_ctc", "loss_att", "th_accuracy"):
        assert k in out and np.isfinite(float(out[k]))
    # combined loss = ctc_weight * ctc + (1-ctc_weight) * att
    np.testing.assert_allclose(
        float(out["loss"]),
        0.3 * float(out["loss_ctc"]) + 0.7 * float(out["loss_att"]),
        rtol=1e-5,
    )


def test_hard_clip_skips_spike_steps():
    model = _tiny_model(ctc_weight=1.0)
    feats, flens, labels, label_lens = _toy_batch(jax.random.PRNGKey(4))
    params = model.init(jax.random.PRNGKey(5), feats, flens, labels,
                        label_lens)

    def loss_fn(p, batch, rng):
        out = model.apply(p, *batch)
        return out["loss"] * 1e6, {}  # force a huge grad

    opt = train_step.make_optimizer("adam", schedulers.steady_lr(1e-3, 1))
    step = jax.jit(train_step.make_train_step(
        loss_fn, opt, clip_hard_maxvalue=10.0))
    state = train_step.init_train_state(params, opt)
    new_state, loss, metrics = step(state, (feats, flens, labels, label_lens),
                                    jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    # params unchanged
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(new_state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restrict_learning_mask():
    model = _tiny_model()
    feats, flens, labels, label_lens = _toy_batch(jax.random.PRNGKey(6))
    params = model.init(jax.random.PRNGKey(7), feats, flens, labels,
                        label_lens)
    # freeze everything except rwkv time-mix params (the paper's LF fine-tune
    # recipe: exclude .* include .*rwkv.*)
    mask = train_step.restrict_learning_mask(
        params, exclude=".*", include=".*tmix.*")
    leaves = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable = [jax.tree_util.keystr(p) for p, v in leaves if v]
    frozen = [jax.tree_util.keystr(p) for p, v in leaves if not v]
    assert trainable and frozen
    assert all("tmix" in p for p in trainable)
    assert not any("tmix" in p for p in frozen)


def test_attention_beam_search():
    """AR attention beam search on the overfit model reproduces labels."""
    model = _tiny_model(ctc_weight=0.3, reverse_weight=0.0)
    feats, flens, labels, label_lens = _toy_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), feats, flens, labels,
                        label_lens)

    def loss_fn(p, batch, rng):
        out = model.apply(p, *batch, deterministic=False,
                          rngs={"dropout": rng})
        return out["loss"], {}

    opt = train_step.make_optimizer(
        "adam", schedulers.steady_lr(3e-3, warmup_steps=10))
    step = jax.jit(train_step.make_train_step(loss_fn, opt))
    state = train_step.init_train_state(params, opt)
    batch = (feats, flens, labels, label_lens)
    for i in range(150):
        state, loss, _ = step(state, batch, jax.random.PRNGKey(500 + i))

    enc, enc_lens = model.apply(state.params, feats, flens,
                                method=model.forward_encoder)

    def one_step(enc_, lens_, ys, ys_lens):
        def call(mdl, *a):
            return mdl.decoder.forward_one_step(*a)
        return model.apply(state.params, enc_, lens_, ys, ys_lens,
                           method=call)

    res = search.attention_beam_search(
        one_step, enc, enc_lens, sos=VOCAB - 1, eos=VOCAB - 1, beam_size=4,
        max_len=8,
    )
    assert res[0].tokens == [3, 5, 7]
    assert res[1].tokens == [2, 2, 9, 4]


def test_joint_decoding():
    """Time-sync joint CTC+attention decode on the overfit model."""
    from paper_accurate_fast_cheap_tpu.decode.joint_decoding import (
        joint_decoding,
    )

    model = _tiny_model(ctc_weight=0.5, reverse_weight=0.0)
    feats, flens, labels, label_lens = _toy_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), feats, flens, labels,
                        label_lens)

    def loss_fn(p, batch, rng):
        out = model.apply(p, *batch, deterministic=False,
                          rngs={"dropout": rng})
        return out["loss"], {}

    opt = train_step.make_optimizer(
        "adam", schedulers.steady_lr(3e-3, warmup_steps=10))
    step = jax.jit(train_step.make_train_step(loss_fn, opt))
    state = train_step.init_train_state(params, opt)
    batch = (feats, flens, labels, label_lens)
    for i in range(150):
        state, loss, _ = step(state, batch, jax.random.PRNGKey(900 + i))

    enc, enc_lens = model.apply(state.params, feats, flens,
                                method=model.forward_encoder)
    logp = np.asarray(model.apply(state.params, enc,
                                  method=model.ctc_logprobs))

    def one_step(enc_, lens_, ys, ys_lens):
        def call(mdl, *a):
            return mdl.decoder.forward_one_step(*a)
        return model.apply(state.params, enc_, lens_, ys, ys_lens,
                           method=call)

    res = joint_decoding(
        one_step, enc[0:1], enc_lens[0:1], logp[0], sos=VOCAB - 1,
        eos=VOCAB - 1, beam_size=4,
    )
    assert res.tokens == [3, 5, 7]
