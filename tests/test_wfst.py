"""WFST tooling (`decode/wfst.py`) + `hlg_rescore` fallback.

Parity targets: `tools/fst/make_tlg.sh` / `compile_lexicon_token_fst.sh`
(graph build surface) and `wenet/k2/model.py:185-303` (hlg_rescore
score combination `am + lm_scale*ngram + decoder_scale*dec +
r_decoder_scale*rdec`).
"""
import math

import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.decode import wfst
from paper_accurate_fast_cheap_tpu.decode.lm import NGramLM

LN10 = math.log(10.0)

# token ids: 0=blank/eps-ish, 1..4 letters a,b,c,d ; word ids 1..3
LEXICON = {1: [1, 2], 2: [1, 3], 3: [4]}  # w1="ab", w2="ac", w3="d"

ARPA = """\
\\data\\
ngram 1=3
ngram 2=2

\\1-grams:
-0.60\t1\t-0.30
-0.90\t2\t-0.20
-0.50\t3\t-0.40

\\2-grams:
-0.10\t1 3
-0.20\t3 2

\\end\\
"""


@pytest.fixture
def lm(tmp_path):
    p = tmp_path / "g.arpa"
    p.write_text(ARPA)
    return NGramLM.from_arpa(str(p), symbol_table=None, vocab_size=4)


def test_lexicon_to_l_spells_words():
    L = wfst.lexicon_to_l(LEXICON)
    # follow "a b" from root: must output word 1 and return to root
    state, out = 0, []
    for tok in [1, 2]:
        hit = [(ol, dst) for il, ol, _w, dst in L.arcs[state] if il == tok]
        assert hit, (state, tok)
        ol, state = hit[0]
        if ol != wfst.EPS:
            out.append(ol)
    assert out == [1] and state == 0
    assert 0 in L.finals


def test_arpa_to_g_costs(lm):
    G = wfst.arpa_to_g(lm)
    # from the empty context, word 3 costs -ln p = 0.50*ln10
    arcs0 = {il: w for il, _ol, w, _d in G.arcs[G.start] if il != wfst.EPS}
    assert abs(arcs0[3] - 0.50 * LN10) < 1e-6
    # bigram (3 -> 2) exists from context state (3,)
    s3 = [d for il, _ol, _w, d in G.arcs[G.start] if il == 3][0]
    arcs3 = {il: w for il, _ol, w, _d in G.arcs[s3] if il != wfst.EPS}
    assert abs(arcs3[2] - 0.20 * LN10) < 1e-6
    # backoff arc from (3,) has cost -bow(3) = 0.40*ln10
    bo = [w for il, _ol, w, _d in G.arcs[s3] if il == wfst.EPS]
    assert bo and abs(bo[0] - 0.40 * LN10) < 1e-6


def test_fst_text_roundtrip(tmp_path, lm):
    G = wfst.arpa_to_g(lm)
    p = tmp_path / "g.fst.txt"
    wfst.write_fst_text(G, str(p))
    G2 = wfst.read_fst_text(str(p))
    assert G2.num_states == G.num_states
    assert G2.num_arcs == G.num_arcs
    assert set(G2.finals) == set(G.finals)


def test_lg_scorer_prefers_lexical_paths(lm):
    sc = wfst.LGScorer(wfst.lexicon_to_l(LEXICON), wfst.arpa_to_g(lm))
    st = sc.init_state()
    vec, st = sc.score(st, None)
    # token 4 spells word 3 completely: score = ln p(w3) = -0.5*ln10
    assert abs(float(vec[4]) - (-0.50 * LN10)) < 1e-6
    # token 1 starts words 1/2 — cost of the better continuation (w1)
    assert abs(float(vec[1]) - (-0.60 * LN10)) < 1e-6
    # after consuming token 4 (word 3), token 2/3 are mid-word-invalid
    vec2, st2 = sc.score(st, 4)
    assert vec2[2] == sc.oov_logp
    # bigram (3 -> 2): starting word 2 ("a c") after word 3 scores the
    # bigram logp -0.20*ln10
    assert abs(float(vec2[1]) - (-0.20 * LN10)) < 1e-6


def test_lg_scorer_constrains_beam_search(lm):
    """Plugged into the espnet beam's lm= hook, the LG scorer biases
    decoding toward lexicon-spellable token sequences."""
    import jax
    import jax.numpy as jnp

    from paper_accurate_fast_cheap_tpu.decode.transducer_espnet import (
        BeamSearchTransducer,
    )

    D = 5

    def predictor_step(tokens, state):
        return jax.nn.one_hot(tokens, D), state

    def joint_step(enc_t, pred_out):
        logits = enc_t * 3.0
        same = jnp.sum(enc_t * pred_out, -1, keepdims=True) > 0.5
        blank_boost = jnp.where(same, 6.0, -6.0)
        logits = logits.at[:, 0].set(blank_boost[:, 0])
        return jax.nn.log_softmax(logits)

    # acoustics weakly say [1, 2]; both w1="ab"(=1,2) and w2="ac"(=1,3)
    # start with 1 — the LG lexicon+LM must keep the decode lexical
    seq = [1, 2]
    enc = jax.nn.one_hot(jnp.asarray(seq), D)
    sc = wfst.LGScorer(wfst.lexicon_to_l(LEXICON), wfst.arpa_to_g(lm))
    bs = BeamSearchTransducer(
        predictor_step, joint_step, lambda n: jnp.zeros((n,)),
        beam_size=4, search_type="default", lm=sc, lm_weight=1.0)
    res = bs.decode(enc)
    assert res.tokens == seq


def test_hlg_rescore_fallback_combination(lm):
    from paper_accurate_fast_cheap_tpu.models import k2_model

    rng = np.random.RandomState(0)
    B, T, V = 2, 20, 5
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    ctc_logp = logits - np.log(
        np.exp(logits).sum(-1, keepdims=True))
    lengths = np.asarray([T, T - 5], np.int32)
    res0 = k2_model.hlg_rescore(
        ctc_logp, lengths, decoder_apply=None, sos=4, eos=4,
        lm_scale=0.0, ngram_lm=lm, beam_size=4)
    res1 = k2_model.hlg_rescore(
        ctc_logp, lengths, decoder_apply=None, sos=4, eos=4,
        lm_scale=5.0, ngram_lm=lm, beam_size=4)
    assert len(res0) == len(res1) == B
    for r0, r1 in zip(res0, res1):
        assert r0.nbest == r1.nbest  # same n-best source (ctc beam)
        # lm_scale shifts the totals by exactly 5 * seq ngram logp
        for h, s0, s1 in zip(r0.nbest, r0.nbest_scores, r1.nbest_scores):
            want = s0 + 5.0 * lm.sequence_logp(h)
            assert abs(s1 - want) < 1e-6


def test_hlg_rescore_decoder_scales(lm):
    """decoder_scale moves totals by the decoder path scores (reference
    `k2/model.py:281-301` combination, incl. the fwd-no-eos asymmetry)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    B, T, V = 1, 12, 5
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    ctc_logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = np.asarray([T], np.int32)
    enc_out = rng.randn(B, T, 8).astype(np.float32)
    enc_lens = lengths

    Wd = rng.randn(8, V).astype(np.float32)

    def decoder_apply(enc, enc_lens, ys_in, ys_lens, r_ys_in, rw):
        l_logits = jnp.einsum("btd,dv->btv", enc[:, :ys_in.shape[1]], Wd)
        return l_logits, l_logits * 0.5

    from paper_accurate_fast_cheap_tpu.models import k2_model

    res0 = k2_model.hlg_rescore(
        ctc_logp, lengths, decoder_apply, sos=4, eos=4,
        enc_out=enc_out, enc_lens=enc_lens, beam_size=4)
    res1 = k2_model.hlg_rescore(
        ctc_logp, lengths, decoder_apply, sos=4, eos=4,
        enc_out=enc_out, enc_lens=enc_lens,
        decoder_scale=2.0, r_decoder_scale=1.0, beam_size=4)
    # scores must differ (decoder really contributed) and the n-best
    # candidate set is unchanged
    assert res0[0].nbest == res1[0].nbest
    assert any(abs(a - b) > 1e-9 for a, b in
               zip(res0[0].nbest_scores, res1[0].nbest_scores))


def test_lg_scorer_vocab_size_covers_oov_tokens(lm):
    """Score vectors must cover the MODEL vocab, not just the lexicon's
    largest token id — beams index vec[tok] for any proposed token."""
    sc = wfst.LGScorer(wfst.lexicon_to_l(LEXICON), wfst.arpa_to_g(lm),
                       vocab_size=10)
    vec, st = sc.score(sc.init_state(), None)
    assert vec.shape[0] == 10
    # tokens beyond the lexicon's max id (4) exist and carry oov_logp
    assert vec[9] == pytest.approx(sc.oov_logp)
    # lexicon-covered tokens still score above the OOV floor
    assert vec[1] > sc.oov_logp
