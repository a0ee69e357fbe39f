"""Context-graph biasing + augmentations + latency/rtf tools."""
import numpy as np

from paper_accurate_fast_cheap_tpu.decode import search
from paper_accurate_fast_cheap_tpu.decode.context_graph import ContextGraph


def test_context_graph_scores():
    cg = ContextGraph([[3, 4, 5], [4, 6]], context_score=2.0)
    # full match accumulates then keeps boost
    s, st = cg.forward_one_step(cg.root, 3)
    assert s == 2.0
    s2, st = cg.forward_one_step(st, 4)
    assert s2 == 2.0
    s3, st = cg.forward_one_step(st, 5)
    assert s3 == 2.0 and st is cg.root  # completed, reset
    # partial match then mismatch backtracks
    s, st = cg.forward_one_step(cg.root, 3)
    s2, st = cg.forward_one_step(st, 9)
    assert s + s2 == 0.0
    # fail link: 3 -> 4 partial of [3,4,5], then 6 completes [4,6]
    _, st = cg.forward_one_step(cg.root, 3)
    _, st = cg.forward_one_step(st, 4)
    d, st = cg.forward_one_step(st, 6)
    assert st is cg.root  # [4, 6] completed via fail transition


def test_prefix_beam_with_biasing_changes_ranking():
    # posteriors slightly prefer token 2, but phrase [1] is biased
    T, V = 4, 5
    logp = np.log(np.full((1, T, V), 0.02))
    logp[0, :, 0] = np.log(0.55)   # blank
    logp[0, 1, 0] = np.log(0.05)   # blank unlikely at t=1: emit something
    logp[0, 1, 2] = np.log(0.50)
    logp[0, 1, 1] = np.log(0.35)
    res_plain = search.ctc_prefix_beam_search(logp, np.asarray([T]),
                                              beam_size=4)
    assert res_plain[0].tokens == [2]
    cg = ContextGraph([[1]], context_score=3.0)
    res_bias = search.ctc_prefix_beam_search(logp, np.asarray([T]),
                                             beam_size=4, context_graph=cg)
    assert res_bias[0].tokens == [1]


def test_augmentations_shapes():
    import random

    from paper_accurate_fast_cheap_tpu.data import augmentations as aug

    rng = np.random.RandomState(0)
    s = {"key": "u", "wav": rng.randn(8000).astype(np.float32) * 0.1,
         "sample_rate": 16000}
    rirs = [np.exp(-np.arange(100) / 10).astype(np.float32)]
    out = list(aug.RIREngine(rirs, prob=1.0,
                             rng=random.Random(0))(iter([s])))[0]
    assert out["wav"].shape == s["wav"].shape
    out = list(aug.apply_telephony(iter([s]), prob=1.0,
                                   rng=random.Random(0)))[0]
    assert out["wav"].shape == s["wav"].shape
    out = list(aug.distort_wav(iter([s]), prob=1.0,
                               rng=random.Random(0)))[0]
    assert out["wav"].shape == s["wav"].shape
    assert np.isfinite(out["wav"]).all()


def test_latency_metrics():
    from paper_accurate_fast_cheap_tpu.tools import latency_metrics as lm

    utt = lm.utterance_latency([0.5, 1.2, 2.0], [0.3, 1.0, 1.5])
    assert abs(utt.first_token - 0.2) < 1e-9
    assert abs(utt.last_token - 0.5) < 1e-9
    rep = lm.latency_report([utt, utt])
    assert "p50" in rep["avg_token"]


def test_rtf_tables(tmp_path):
    from paper_accurate_fast_cheap_tpu.tools import rtf_tables

    for i in range(3):
        (tmp_path / f"run{i}.rtf").write_text(
            f"final_rtf 0.00{i+1}\nbatch 4 chunk 9000 iters 10\n")
    rows = rtf_tables.aggregate(
        [str(tmp_path / f"run{i}.rtf") for i in range(3)])
    assert rows[0]["runs"] == 3
    assert 0.001 <= rows[0]["rtf_mean"] <= 0.003


def test_metrics_logger(tmp_path):
    import json

    from paper_accurate_fast_cheap_tpu.train.metrics_logger import (
        MetricsLogger,
    )

    lg = MetricsLogger(str(tmp_path), use_tensorboard=True)
    lg.log(1, {"loss": 2.5, "grad_norm": 0.1})
    lg.log(2, {"loss": 2.0})
    lg.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[0])["train/loss"] == 2.5
    assert (tmp_path / "tensorboard").exists()


def test_dynamic_batch_word_cap():
    from paper_accurate_fast_cheap_tpu.data import pipeline as pl

    samples = [
        {"key": f"u{i}", "wav": np.zeros(1600), "sample_rate": 16000,
         "label": np.asarray([1]), "txt": "a b c"}
        for i in range(9)
    ]
    batches = list(pl.dynamic_batch(iter(samples),
                                    max_frames_in_batch=10**9,
                                    max_words_in_batch=7))
    assert all(sum(len(s["txt"].split()) for s in b) <= 7 or len(b) == 1
               for b in batches)
    assert len(batches) > 1


def test_dynamic_batch_one_utt_per_job():
    from paper_accurate_fast_cheap_tpu.data import pipeline as pl

    samples = [
        {"key": f"u{i}", "wav": np.zeros(1600), "sample_rate": 16000,
         "label": np.asarray([1]), "txt": "x", "job": f"j{i % 2}"}
        for i in range(6)
    ]
    batches = list(pl.dynamic_batch(iter(samples),
                                    max_frames_in_batch=10**9,
                                    one_utt_per_job=True))
    for b in batches:
        jobs = [s["job"] for s in b]
        assert len(jobs) == len(set(jobs))


def test_joint_decoding_lexicon_constraint():
    """Lexicon constraint (`beam_search_timesync.py:395-422`): an invalid
    word is excluded when the lexicon forbids it, kept without the
    constraint; the fallback keeps search alive if everything is pruned."""
    import jax.numpy as jnp

    from paper_accurate_fast_cheap_tpu.decode.joint_decoding import (
        joint_decoding,
    )

    # vocab: 0 blank, 1 '▁cat', 2 '▁dog', 3 'x' (continuation)
    V, T = 4, 6
    tok_to_str = {1: "▁cat", 2: "▁dog", 3: "x"}
    ctc = np.full((T, V), -10.0, np.float32)
    # CTC wants: ▁cat x  ("catx") — not a lexicon word
    for t, tok in enumerate([1, 1, 3, 0, 0, 0]):
        ctc[t, tok] = 0.0

    def decoder_one_step(enc, enc_lens, ys, ys_lens):
        return jnp.zeros((ys.shape[0], V))  # uniform attention scores

    enc = jnp.zeros((1, T, 4))
    kw = dict(sos=0, eos=0, beam_size=4, ctc_weight=1.0, att_weight=0.0)
    free = joint_decoding(decoder_one_step, enc, jnp.asarray([T]), ctc,
                          **kw)
    assert free.tokens == [1, 3]  # unconstrained: 'catx'
    constrained = joint_decoding(
        decoder_one_step, enc, jnp.asarray([T]), ctc,
        words={"cat": 0, "dog": 1}, word_prefixes={"cat": 0, "dog": 1},
        tok_to_str=tok_to_str, **kw)
    # 'catx' is not a valid prefix -> pruned; best valid is 'cat'
    assert constrained.tokens == [1], constrained.tokens
    # fallback: lexicon that rejects everything still yields a result
    fallback = joint_decoding(
        decoder_one_step, enc, jnp.asarray([T]), ctc,
        words={}, word_prefixes={}, tok_to_str=tok_to_str, **kw)
    assert fallback.tokens  # non-empty despite total rejection
