"""Long-form window decomposition exactness + deferred beam finalize.

`bin/recognize_wav.window_batches` claims frame i of window s covers
exactly the samples the whole-file fbank's frame s+i covers — window
hypotheses must therefore be bit-identical to slicing whole-file
features.  Verified here against the actual frontend.
"""
import numpy as np
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.bin.recognize_wav import (
    make_window_slicer,
    window_batches,
)
from paper_accurate_fast_cheap_tpu.frontend.pipeline import make_feature_fn


def _featurizer():
    return make_feature_fn(
        {"fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                        "frame_length": 25, "dither": 0.0},
         "spec_aug": False, "spec_sub": False}, None)


def test_sample_windows_match_whole_file_fbank():
    rng = np.random.RandomState(0)
    sr, shift, length = 16000, 160, 400
    wav = (rng.randn(sr * 7 + 123) * 0.1).astype(np.float32)
    featurize = _featurizer()

    whole, wlens = featurize(jnp.asarray(wav[None]),
                             jnp.asarray([len(wav)]), train=False)
    whole = np.asarray(whole[0][: int(wlens[0])])

    chunk, batch = 120, 2
    win_samples = (chunk - 1) * shift + length
    slicer = make_window_slicer(wav, win_samples)
    seen = 0
    for group, s0, slens in window_batches(len(wav), chunk, batch,
                                           shift, length):
        swins = slicer(jnp.asarray(s0))
        feats, flens = featurize(swins, jnp.asarray(slens), train=False)
        feats = np.asarray(feats)
        for j, start in enumerate(group):
            n = int(flens[j])
            ref = whole[start : start + chunk]
            assert n == len(ref), (start, n, len(ref))
            np.testing.assert_array_equal(feats[j, :n], ref)
            seen += n
    assert seen == len(whole)


def test_window_batches_tail_padding():
    # 250 total frames at chunk 120 -> starts 0,120,240 with a 10-frame
    # tail; final group padded to the full batch with zero-length rows
    shift, length = 160, 400
    wav_len = (250 - 1) * shift + length
    groups = list(window_batches(wav_len, 120, 2, shift, length))
    assert [g for g, _, _ in groups] == [[0, 120], [240]]
    _, s0, slens = groups[-1]
    assert s0.shape == (2,) and slens[1] == 0
    assert slens[0] == wav_len - 240 * shift


def test_deferred_beam_finalize_matches_direct():
    from paper_accurate_fast_cheap_tpu.decode import rnnt_search

    rng = np.random.RandomState(1)
    B, T, De, Dp, V, N = 2, 12, 8, 8, 9, 3
    enc = jnp.asarray(rng.randn(B, T, De).astype(np.float32))
    lens = jnp.asarray([12, 7])
    ctc = jnp.asarray(np.log(rng.dirichlet(np.ones(V), (B, T))
                             ).astype(np.float32))
    W = jnp.asarray(rng.randn(De + Dp, V).astype(np.float32) * 0.5)
    E = jnp.asarray(rng.randn(V, Dp).astype(np.float32))

    def predictor_step(tok, state):
        out = E[tok] + state
        return out, out

    import jax

    def joint_step(e, pr):
        return jax.nn.log_softmax(jnp.concatenate([e, pr], -1) @ W, -1)

    init = lambda n: jnp.zeros((n, Dp))
    kw = dict(beam_size=N, ctc_weight=0.3, transducer_weight=0.7)
    direct = rnnt_search.rnnt_beam_search(
        predictor_step, joint_step, init, enc, lens, ctc, **kw)
    out = rnnt_search.rnnt_beam_search(
        predictor_step, joint_step, init, enc, lens, ctc, defer=True, **kw)
    deferred = rnnt_search.finalize_device_beam(out)
    for a, b in zip(direct, deferred):
        assert a.tokens == b.tokens
        assert a.nbest == b.nbest
        np.testing.assert_allclose(a.nbest_scores, b.nbest_scores)
