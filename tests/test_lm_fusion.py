"""LM shallow fusion (`decode/lm.py` + transducer_espnet hooks).

Parity targets: the reference `use_lm` hooks in
`wenet/transducer_espnet/beam_search_transducer.py:121-139,280-291,
383-397,472-500,639-669,800-827` — cross-checked here against the
reference's own torch beam search with the SAME n-gram LM mocked into
its scorer protocol.
"""
import math

import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.decode.lm import NGramLM, UniformLM

V = 7

ARPA = """\
\\data\\
ngram 1=7
ngram 2=5
ngram 3=2

\\1-grams:
-0.90\t0\t-0.30
-0.70\t1\t-0.40
-0.80\t2\t-0.20
-1.00\t3\t-0.10
-1.10\t4
-1.20\t5\t-0.50
-1.30\t6

\\2-grams:
-0.20\t0 1\t-0.15
-0.30\t1 2\t-0.25
-0.40\t2 3
-0.50\t1 5\t-0.35
-0.60\t5 1

\\3-grams:
-0.10\t0 1 2
-0.15\t1 2 3

\\end\\
"""

LN10 = math.log(10.0)


@pytest.fixture
def lm(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return NGramLM.from_arpa(str(p), symbol_table=None, vocab_size=V)


def test_arpa_parse(lm):
    assert lm.order == 3
    lp, bo = lm.ngrams[0][(1,)]
    assert abs(lp - (-0.70 * LN10)) < 1e-6
    assert abs(bo - (-0.40 * LN10)) < 1e-6
    assert (0, 1, 2) in lm.ngrams[2]


def test_backoff_recursion(lm):
    # direct trigram
    assert abs(lm._logp((0, 1), 2) - (-0.10 * LN10)) < 1e-6
    # no trigram (0,1,5): backoff(0,1) + bigram(1,5)
    want = (-0.15 * LN10) + (-0.50 * LN10)
    assert abs(lm._logp((0, 1), 5) - want) < 1e-6
    # no trigram, no bigram (1, 4): bo(0,1) + bo(1) + uni(4)
    want = (-0.15 * LN10) + (-0.40 * LN10) + (-1.10 * LN10)
    assert abs(lm._logp((0, 1), 4) - want) < 1e-6
    # unigram-only context
    assert abs(lm._logp((), 6) - (-1.30 * LN10)) < 1e-6


def test_score_vector_matches_recursion(lm):
    for hist in [(), (1,), (0, 1), (1, 2), (4, 6), (2, 3)]:
        vec, new_state = lm.score(hist, None)
        assert new_state == hist[-2:]
        for w in range(V):
            assert abs(float(vec[w]) - lm._logp(hist[-2:], w)) < 1e-6, (
                hist, w)


def test_advance_and_sequence_logp(lm):
    st = lm.init_state()
    assert st == ()
    st = lm.advance(st, 0)
    st = lm.advance(st, 1)
    assert st == (0, 1)
    st = lm.advance(st, 2)
    assert st == (1, 2)  # truncated to order-1
    total = lm.sequence_logp([0, 1, 2])
    want = lm._logp((), 0) + lm._logp((0,), 1) + lm._logp((0, 1), 2)
    assert abs(total - want) < 1e-6


def test_uniform_lm():
    u = UniformLM(10)
    vec, st = u.score((), 3)
    assert np.allclose(vec, -math.log(10))
    assert u.advance((), 5) == ()


def test_fusion_changes_scores_not_crash(lm):
    """Fused beam runs end to end and biases towards LM-favored tokens."""
    import jax
    import jax.numpy as jnp

    from paper_accurate_fast_cheap_tpu.decode.transducer_espnet import (
        BeamSearchTransducer,
    )

    D = V

    def predictor_step(tokens, state):
        return jax.nn.one_hot(tokens, D), state

    def joint_step(enc_t, pred_out):
        logits = enc_t * 4.0
        same = jnp.sum(enc_t * pred_out, -1, keepdims=True) > 0.5
        blank_boost = jnp.where(same, 8.0, -8.0)
        logits = logits.at[:, 0].set(blank_boost[:, 0])
        return jax.nn.log_softmax(logits)

    seq = [5, 1, 2]
    enc = jax.nn.one_hot(jnp.asarray(seq), D)
    base = BeamSearchTransducer(
        predictor_step, joint_step, lambda n: jnp.zeros((n,)),
        beam_size=4, search_type="default")
    fused = BeamSearchTransducer(
        predictor_step, joint_step, lambda n: jnp.zeros((n,)),
        beam_size=4, search_type="default", lm=lm, lm_weight=0.5)
    r0 = base.decode(enc)
    r1 = fused.decode(enc)
    assert r0.tokens == seq
    assert r1.tokens == seq  # acoustics dominate at this weight
    assert not np.isclose(r0.score, r1.score)  # LM really contributed


@pytest.mark.parametrize("stype", ["default", "tsd", "alsd", "nsc",
                                   "maes"])
@pytest.mark.parametrize("seed", [0, 1])
def test_reference_parity_with_lm(stype, seed, lm):
    """Exact hypothesis+score parity vs the reference torch beam with the
    same n-gram LM mocked into its ESPnet scorer protocol."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from tests.test_transducer_espnet import _Shared, _ref_stub
    from tests.test_transducer_espnet import ref_bst as _ref_bst_fixture  # noqa: F401
    import sys
    import types

    # reuse the fixture body via direct import machinery
    from tests import test_transducer_espnet as tte

    class RefLM:
        """Mock of the ESPnet LM scorer protocol over our NGramLM: the
        state is the n-gram context; ``score``/``batch_score`` advance by
        the last label (lm_tokens) then return the next-token dist."""

        def __init__(self, ng):
            self.ng = ng

        def zero_state(self):
            return ()

        def score(self, lm_tokens, state, x):
            st = () if state is None else state
            vec, ns = self.ng.score(st, int(lm_tokens))
            return torch.from_numpy(np.asarray(vec)), ns

        def batch_score(self, lm_tokens, states, x):
            outs, news = [], []
            for tok, st in zip(lm_tokens.tolist(), states):
                st = () if st is None else st
                v, s2 = self.ng.score(st, int(tok))
                outs.append(torch.from_numpy(np.asarray(v)))
                news.append(s2)
            return torch.stack(outs), news

    # import the reference stack the same way the module fixture does
    for name in ("torchaudio", "torchaudio.compliance",
                 "torchaudio.compliance.kaldi", "langid", "sentencepiece"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    wh = types.ModuleType("whisper")
    wt = types.ModuleType("whisper.tokenizer")
    wt.LANGUAGES = {"en": "english"}
    wh.tokenizer = wt
    sys.modules.setdefault("whisper", wh)
    sys.modules.setdefault("whisper.tokenizer", wt)
    dec_mod = types.ModuleType("wenet.transformer.decoder")
    for cls in ("LanguageSpecificTransformerDecoder", "TransformerDecoder",
                "BiTransformerDecoder"):
        setattr(dec_mod, cls, type(cls, (), {}))
    sys.modules.setdefault("wenet.transformer.decoder", dec_mod)
    try:
        from wenet.transducer_espnet import beam_search_transducer as bst
    except Exception as e:
        pytest.skip(f"reference espnet stack unimportable: {e}")

    from paper_accurate_fast_cheap_tpu.decode.transducer_espnet import (
        BeamSearchTransducer,
    )

    shared = _Shared(seed, V=V)
    dec, joint = _ref_stub(shared)
    kw = dict(beam_size=4, search_type=stype, max_sym_exp=2, u_max=50,
              nstep=2, prefix_alpha=2, expansion_gamma=2.3,
              expansion_beta=2, nbest=4)
    ref = bst.BeamSearchTransducer(decoder=dec, joint_network=joint,
                                   lm=RefLM(lm), lm_weight=0.4, **kw)
    with torch.no_grad():
        ref_hyps = ref(torch.from_numpy(shared.enc))

    # ours: same LM but with sos_id=blank so the leading blank is
    # consumed like the reference's first lm.score advance
    ours_lm = NGramLM(lm.ngrams, lm.vocab_size, sos_id=0)
    pstep, jstep, init = shared.jax_fns()
    ours = BeamSearchTransducer(pstep, jstep, init, lm=ours_lm,
                                lm_weight=0.4, **kw)
    our_hyps = ours(jnp.asarray(shared.enc))

    ref_seqs = [list(h.yseq) for h in ref_hyps]
    our_seqs = [list(h.yseq) for h in our_hyps]
    assert our_seqs == ref_seqs, (stype, seed, our_seqs, ref_seqs)
    np.testing.assert_allclose(
        [h.score for h in our_hyps], [float(h.score) for h in ref_hyps],
        rtol=1e-4, atol=1e-4)
