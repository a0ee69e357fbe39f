"""GNMT global scorer (length_wu + coverage_wu) for the ONMT attention
path: penalty math vs the reference's own `onmt_translate/penalties.py`,
and the coverage-aware beam end-to-end on a real decoder via captured
cross-attention weights."""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.decode import search as our_search


def test_penalties_match_reference():
    for name in ("torchaudio", "torchaudio.compliance",
                 "torchaudio.compliance.kaldi", "langid", "sentencepiece"):
        sys.modules.setdefault(name, types.ModuleType(name))
    wh = types.ModuleType("whisper")
    wt = types.ModuleType("whisper.tokenizer")
    wt.LANGUAGES = {"en": "english"}
    wh.tokenizer = wt
    sys.modules.setdefault("whisper", wh)
    sys.modules.setdefault("whisper.tokenizer", wt)
    dec = types.ModuleType("wenet.transformer.decoder")
    for cls in ("LanguageSpecificTransformerDecoder", "TransformerDecoder",
                "BiTransformerDecoder"):
        setattr(dec, cls, type(cls, (), {}))
    sys.modules.setdefault("wenet.transformer.decoder", dec)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import torch

        from wenet.onmt_translate.penalties import PenaltyBuilder
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference penalties unimportable: {e}")
    pb = PenaltyBuilder("wu", "wu")
    rng = np.random.RandomState(0)
    cov = rng.rand(5).astype(np.float32) * 1.5
    want_cov = float(pb.coverage_wu(torch.from_numpy(cov), beta=0.4))
    got_cov = our_search.gnmt_coverage_wu(cov, 0.4)
    np.testing.assert_allclose(got_cov, want_cov, rtol=1e-5)
    for L in (1, 7, 30):
        want_len = float(pb.length_wu(L, alpha=0.9))
        np.testing.assert_allclose(
            our_search.gnmt_length_wu(L, 0.9), want_len, rtol=1e-6)


def test_gnmt_beam_with_real_decoder_coverage():
    from paper_accurate_fast_cheap_tpu.models.asr_model import ASRModel

    vocab = 12
    model = ASRModel(
        vocab_size=vocab,
        encoder_conf=dict(input_size=8, output_size=16, attention_heads=2,
                          linear_units=16, num_blocks=1),
        decoder_conf=dict(attention_heads=2, linear_units=16,
                          num_blocks=2),
        ctc_weight=0.5,
    )
    B, T = 2, 20
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 8))
    flens = jnp.asarray([T, T - 8], jnp.int32)
    labels = jnp.ones((B, 3), jnp.int32)
    llens = jnp.full((B,), 3, jnp.int32)
    params = model.init(jax.random.PRNGKey(1), feats, flens, labels, llens)
    enc, enc_lens = model.apply(params, feats, flens,
                                method=model.forward_encoder)

    step_attn = our_search.make_gnmt_step_fn(model, params)
    logp, attn_cov = step_attn(enc, enc_lens,
                               jnp.full((B, 1), vocab - 1, jnp.int32),
                               jnp.ones((B,), jnp.int32))
    assert logp.shape == (B, vocab)
    assert attn_cov.shape == (B, enc.shape[1])
    s = np.asarray(attn_cov).sum(axis=-1)
    np.testing.assert_allclose(s, 1.0, rtol=1e-4)  # softmax rows

    plain_step = jax.jit(lambda e, el, ys, yl: model.apply(
        params, e, el, ys, yl, method=model.decoder_one_step_attn))
    res_plain = our_search.attention_beam_search(
        plain_step, enc, enc_lens, sos=vocab - 1, eos=vocab - 1,
        beam_size=3, max_len=6)
    res_gnmt = our_search.attention_beam_search(
        plain_step, enc, enc_lens, sos=vocab - 1, eos=vocab - 1,
        beam_size=3, max_len=6, gnmt_alpha=0.9, gnmt_beta=0.4,
        decoder_one_step_attn=step_attn)
    for r in res_gnmt:
        assert np.isfinite(r.score)
    # the scorer changes scores (coverage/length penalties applied)
    assert any(abs(a.score - b.score) > 1e-9
               for a, b in zip(res_plain, res_gnmt))
