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


def test_force_align_device_tokens_matches_host():
    """The traceable device-token aligner (fused-chain path) must produce
    the same frame alignment as the host-label batched aligner for rows
    that fit its state budget, and flag the rest."""
    import jax

    from paper_accurate_fast_cheap_tpu.ops import ctc_utils

    rng = np.random.RandomState(3)
    B, T, V, Lmax = 4, 17, 7, 5
    logp = jnp.asarray(np.log(rng.dirichlet(np.ones(V), (B, T))
                              ).astype(np.float32))
    lens = np.asarray([17, 11, 17, 9], np.int32)
    labels = [
        [2, 3, 3, 1],      # repeat => no skip transition there
        [4, 2],
        list(rng.randint(1, V, 9)),   # 9 > Lmax => overflow row
        [],                # empty => flagged, all-blank
    ]
    tokens = np.zeros((B, Lmax), np.int32)
    tok_len = np.zeros((B,), np.int32)
    for b, ls in enumerate(labels):
        tok_len[b] = len(ls)
        tokens[b, : min(len(ls), Lmax)] = ls[:Lmax]

    path, ok = jax.jit(ctc_utils.force_align_device_tokens)(
        logp, jnp.asarray(lens), jnp.asarray(tokens),
        jnp.asarray(tok_len))
    path, ok = np.asarray(path), np.asarray(ok)
    assert list(ok) == [True, True, False, False]

    host = ctc_utils.force_align_batch_device(
        logp, lens, [labels[0], labels[1], [], []])
    np.testing.assert_array_equal(path[0, : lens[0]], host[0])
    np.testing.assert_array_equal(path[1, : lens[1]], host[1])
    assert not path[2].any() and not path[3].any()


def test_recognize_wav_fused_chain_matches_unfused(tmp_path):
    """`--fuse on` (single-dispatch slice->fbank->encoder->ctc->beam->
    align program) must reproduce the unfused pipeline's transcript AND
    CTM timings exactly."""
    import io
    import wave

    import yaml

    from paper_accurate_fast_cheap_tpu.bin.recognize_wav import main
    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.train import checkpointing

    units = tmp_path / "units.txt"
    units.write_text("<blank> 0\n<unk> 1\na 2\nb 3\nc 4\n<sos> 5\n")
    config = {
        "model": "transducer",
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 32, "attention_heads": 2, "linear_units": 48,
            "num_blocks": 1, "input_layer": "conv2d",
            "dropout_rate": 0.0,
            "selfattention_layer_type": "rwkv_tmix60_bidirectional",
            "rwkv_head_size": 16,
        },
        "decoder": None,
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 32, "hidden_size": 32,
                           "output_size": 32, "num_layers": 1},
        "joint_conf": {"join_dim": 32},
        "model_conf": {"ctc_weight": 0.3, "transducer_weight": 0.7,
                       "attention_weight": 0.0},
        "tokenizer": "whitespace",
        "tokenizer_conf": {"symbol_table_path": str(units),
                           "special_tokens": {"<sos>": 5, "<eos>": 5}},
        "dataset_conf": {
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": 0.0},
        },
    }
    cfg_path = tmp_path / "trans.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    import jax

    model, _ = factory.init_model(config, 6, 23)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 23)),
                        jnp.asarray([64]), jnp.ones((1, 4), jnp.int32),
                        jnp.asarray([4]))
    ckpt = tmp_path / "ckpt"
    checkpointing.save_checkpoint(str(ckpt), params)

    rng = np.random.RandomState(11)
    wav = (rng.randn(16000 * 3) * 0.05).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())
    wav_path = tmp_path / "ep.wav"
    wav_path.write_bytes(buf.getvalue())

    outs = {}
    for fuse in ("off", "on"):
        out_dir = tmp_path / f"out_{fuse}"
        rc = main([
            "--config", str(cfg_path), "--checkpoint", str(ckpt),
            "--wav", str(wav_path), "--output_dir", str(out_dir),
            "--mode", "rnnt_beam_search", "--chunk_size", "120",
            "--batch_size", "2", "--beam_size", "2",
            "--precision", "fp32", "--fuse", fuse,
        ])
        assert rc == 0
        outs[fuse] = ((out_dir / "ep.txt").read_text(),
                      (out_dir / "ep.ctm").read_text())
    assert outs["on"][0] == outs["off"][0]
    assert outs["on"][1] == outs["off"][1]
    # the fused run actually produced hypotheses (guards against a
    # trivially-empty equality)
    assert outs["on"][0].strip()


def test_beam_unroll_is_exact():
    """`unroll` only changes scan scheduling — hypotheses, n-best and
    scores must be identical to the unroll=1 beam."""
    from paper_accurate_fast_cheap_tpu.decode import rnnt_search

    rng = np.random.RandomState(5)
    B, T, De, Dp, V, N = 2, 13, 8, 8, 9, 3
    enc = jnp.asarray(rng.randn(B, T, De).astype(np.float32))
    lens = jnp.asarray([13, 6])
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
    base = rnnt_search.rnnt_beam_search(
        predictor_step, joint_step, init, enc, lens, ctc, **kw)
    for unroll in (2, 4):
        got = rnnt_search.rnnt_beam_search(
            predictor_step, joint_step, init, enc, lens, ctc,
            unroll=unroll, **kw)
        for a, b in zip(base, got):
            assert a.tokens == b.tokens and a.nbest == b.nbest
            np.testing.assert_allclose(a.nbest_scores, b.nbest_scores,
                                       rtol=1e-6)
