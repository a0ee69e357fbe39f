"""CTC / attention decoding algorithms.

Parity target: `wenet/transformer/search.py` — DecodeResult (`:29-58`),
ctc_greedy_search (`:106-121`), ctc_prefix_beam_search with per-token peak
times (`:124-248`), attention_rescoring (`:363-448`).

Split of labor (TPU-first): the per-frame log-probs and all batched scoring
run jitted on device; the beam bookkeeping (dynamic prefix sets) runs on
host over the downloaded (T, V) posteriors, like the reference's python
loops — the posteriors are tiny next to the encoder work.  Greedy search is
fully vectorized on device.
"""
from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.utils.common import log_add


@dataclasses.dataclass
class DecodeResult:
    tokens: List[int]
    score: float = 0.0
    confidence: float = 0.0
    tokens_confidence: List[float] = dataclasses.field(default_factory=list)
    times: List[int] = dataclasses.field(default_factory=list)
    nbest: List[List[int]] = dataclasses.field(default_factory=list)
    nbest_scores: List[float] = dataclasses.field(default_factory=list)
    nbest_times: List[List[int]] = dataclasses.field(default_factory=list)


def remove_duplicates_and_blank(tokens: Sequence[int],
                                blank_id: int = 0) -> List[int]:
    out, prev = [], None
    for t in tokens:
        if t != prev and t != blank_id:
            out.append(int(t))
        prev = t
    return out


def ctc_greedy_search(
    ctc_probs: np.ndarray,
    lengths: np.ndarray,
    blank_id: int = 0,
) -> List[DecodeResult]:
    """ctc_probs: (B, T, V) log-probs (numpy or device array)."""
    ctc_probs = np.asarray(ctc_probs)
    lengths = np.asarray(lengths)
    results = []
    for b in range(ctc_probs.shape[0]):
        T = int(lengths[b])
        ids = ctc_probs[b, :T].argmax(axis=-1)
        maxp = ctc_probs[b, np.arange(T), ids]
        tokens, times, confs = [], [], []
        prev = None
        for t, (i, p) in enumerate(zip(ids, maxp)):
            if i != prev and i != blank_id:
                tokens.append(int(i))
                times.append(t)
                confs.append(float(np.exp(p)))
            prev = i
        conf = float(np.mean(confs)) if confs else 0.0
        results.append(DecodeResult(tokens=tokens, score=float(maxp.sum()),
                                    confidence=conf, tokens_confidence=confs,
                                    times=times))
    return results


@dataclasses.dataclass
class _Prefix:
    """CTC prefix state: blank/non-blank ending scores + viterbi-ish timing
    + optional context-biasing boost (mirrors PrefixScore in
    `search.py:61-103`)."""

    s: float = -np.inf           # blank-ending score
    ns: float = -np.inf          # non-blank-ending score
    v_s: float = -np.inf         # viterbi blank score
    v_ns: float = -np.inf        # viterbi non-blank score
    cur_token_prob: float = -np.inf
    times_s: tuple = ()
    times_ns: tuple = ()
    context_state: object = None
    context_score: float = 0.0

    def score(self):
        return np.logaddexp(self.s, self.ns)

    def total_score(self):
        return self.score() + self.context_score

    def viterbi_score(self):
        return max(self.v_s, self.v_ns)

    def times(self):
        return self.times_s if self.v_s > self.v_ns else self.times_ns


def ctc_prefix_beam_search(
    ctc_probs: np.ndarray,
    lengths: np.ndarray,
    beam_size: int = 10,
    blank_id: int = 0,
    context_graph=None,
) -> List[DecodeResult]:
    """Standard CTC prefix beam search with per-token peak times and
    optional context-graph keyword biasing (`search.py:124-248`).

    Host-side over (T, V) log-posteriors; top-beam_size tokens expanded per
    frame (same pruning as the reference).
    """
    ctc_probs = np.asarray(ctc_probs)
    lengths = np.asarray(lengths)
    results = []
    for b in range(ctc_probs.shape[0]):
        T = int(lengths[b])
        root_cs = context_graph.root if context_graph is not None else None
        cur: Dict[tuple, _Prefix] = {
            (): _Prefix(s=0.0, ns=-np.inf, v_s=0.0, v_ns=0.0,
                        context_state=root_cs)
        }
        for t in range(T):
            logp = ctc_probs[b, t]
            top = np.argsort(logp)[-beam_size:]
            nxt: Dict[tuple, _Prefix] = defaultdict(_Prefix)
            for prefix, ps in cur.items():
                for u in top:
                    p = float(logp[u])
                    if u == blank_id:
                        n = nxt[prefix]
                        n.s = np.logaddexp(n.s, ps.score() + p)
                        n.context_state = ps.context_state
                        n.context_score = ps.context_score
                        if ps.viterbi_score() + p > n.v_s:
                            n.v_s = ps.viterbi_score() + p
                            n.times_s = ps.times()
                    elif prefix and u == prefix[-1]:
                        # repeat: extend non-blank of same prefix
                        n = nxt[prefix]
                        n.ns = np.logaddexp(n.ns, ps.ns + p)
                        n.context_state = ps.context_state
                        n.context_score = ps.context_score
                        if ps.v_ns + p > n.v_ns:
                            n.v_ns = ps.v_ns + p
                            if p > ps.cur_token_prob:
                                n.cur_token_prob = p
                                n.times_ns = ps.times_ns[:-1] + (t,)
                            else:
                                n.cur_token_prob = ps.cur_token_prob
                                n.times_ns = ps.times_ns
                        # and new token after blank
                        np_ = nxt[prefix + (int(u),)]
                        np_.ns = np.logaddexp(np_.ns, ps.s + p)
                        if context_graph is not None \
                                and np_.context_state is None:
                            d, cs = context_graph.forward_one_step(
                                ps.context_state, int(u))
                            np_.context_state = cs
                            np_.context_score = ps.context_score + d
                        if ps.v_s + p > np_.v_ns:
                            np_.v_ns = ps.v_s + p
                            np_.cur_token_prob = p
                            np_.times_ns = ps.times_s + (t,)
                    else:
                        np_ = nxt[prefix + (int(u),)]
                        np_.ns = np.logaddexp(np_.ns, ps.score() + p)
                        if context_graph is not None \
                                and np_.context_state is None:
                            d, cs = context_graph.forward_one_step(
                                ps.context_state, int(u))
                            np_.context_state = cs
                            np_.context_score = ps.context_score + d
                        if ps.viterbi_score() + p > np_.v_ns:
                            np_.v_ns = ps.viterbi_score() + p
                            np_.cur_token_prob = p
                            np_.times_ns = ps.times() + (t,)
            cur = dict(
                sorted(nxt.items(), key=lambda kv: kv[1].total_score(),
                       reverse=True)[:beam_size]
            )
        if context_graph is not None:
            for ps in cur.values():
                ps.context_score += context_graph.finalize(
                    ps.context_state)
            cur = dict(sorted(cur.items(),
                              key=lambda kv: kv[1].total_score(),
                              reverse=True))
        nbest = [list(p) for p in cur.keys()]
        scores = [float(ps.total_score()) for ps in cur.values()]
        times = [list(ps.times()) for ps in cur.values()]
        results.append(DecodeResult(
            tokens=nbest[0] if nbest else [],
            score=scores[0] if scores else 0.0,
            times=times[0] if times else [],
            nbest=nbest, nbest_scores=scores, nbest_times=times,
        ))
    return results


def gnmt_length_wu(cur_len: int, alpha: float) -> float:
    """GNMT length re-ranking divisor (`onmt_translate/penalties.py:89-95`)."""
    return ((5.0 + cur_len) / 6.0) ** alpha


def gnmt_coverage_wu(cov: np.ndarray, beta: float) -> float:
    """GNMT coverage re-ranking penalty (`penalties.py:63-73`):
    beta * -sum(log(min(cov, 1)))."""
    return float(beta * -np.log(np.minimum(cov, 1.0)).sum())


def attention_beam_search(
    decoder_one_step,
    enc_out: jax.Array,
    enc_lens: jax.Array,
    sos: int,
    eos: int,
    beam_size: int = 10,
    max_len: Optional[int] = None,
    length_penalty: float = 0.0,
    gnmt_alpha: float = 0.0,
    gnmt_beta: float = 0.0,
    decoder_one_step_attn=None,
) -> List[DecodeResult]:
    """Pure attention AR beam search (`search.py:251-360` semantics).

    decoder_one_step(enc (N, T, D), enc_lens (N,), ys (N, U), ys_lens (N,))
    -> last-position log-probs (N, V).  Runs batched over (utt x beam).

    GNMT global scorer (`asr_model.py:988-1079` onmt_attention_decoding +
    `onmt_translate/penalties.py`): with ``gnmt_alpha`` final scores divide
    by the length_wu penalty; with ``gnmt_beta`` and a
    ``decoder_one_step_attn`` callable (also returning per-step cross
    -attention coverage (N, T_enc)), the coverage_wu penalty is
    subtracted.
    """
    B, T, D = enc_out.shape
    N = beam_size
    if max_len is None:
        max_len = int(np.max(np.asarray(enc_lens))) + 1
    enc_rep = jnp.repeat(enc_out, N, axis=0)
    lens_rep = jnp.repeat(enc_lens, N, axis=0)

    ys = np.full((B * N, max_len + 1), eos, np.int32)
    ys[:, 0] = sos
    scores = np.full((B, N), -np.inf)
    scores[:, 0] = 0.0
    finished = np.zeros((B, N), bool)
    fin_hyps: List[List[Tuple[float, List[int]]]] = [[] for _ in range(B)]

    use_cov = gnmt_beta > 0.0 and decoder_one_step_attn is not None
    cov = np.zeros((B * N, T), np.float64) if use_cov else None
    enc_valid = np.asarray(enc_lens)

    def _final_score(s, u_len, coverage, b):
        if gnmt_alpha or gnmt_beta:
            out = s / gnmt_length_wu(u_len, gnmt_alpha) if gnmt_alpha else s
            if use_cov and coverage is not None:
                out = out - gnmt_coverage_wu(
                    coverage[: enc_valid[b]], gnmt_beta)
            return out
        return s / (u_len ** length_penalty) if length_penalty else s

    step_fn = jax.jit(decoder_one_step_attn if use_cov
                      else decoder_one_step)
    for u in range(max_len):
        out = step_fn(
            enc_rep, lens_rep, jnp.asarray(ys[:, : u + 1]),
            jnp.full((B * N,), u + 1, jnp.int32),
        )
        if use_cov:
            logp, attn = np.asarray(out[0]), np.asarray(out[1])
        else:
            logp = np.asarray(out)  # (B*N, V)
        V = logp.shape[-1]
        for b in range(B):
            cand = []
            for j in range(N):
                if not np.isfinite(scores[b, j]):
                    continue
                if finished[b, j]:
                    continue
                lp = logp[b * N + j]
                top = np.argsort(lp)[-N:]
                for tok in top:
                    cand.append((scores[b, j] + lp[tok], j, int(tok)))
            if not cand:
                continue
            cand.sort(reverse=True)
            new_ys = ys[b * N : (b + 1) * N].copy()
            new_scores = np.full(N, -np.inf)
            new_fin = np.zeros(N, bool)
            new_cov = (np.zeros((N, T), np.float64) if use_cov else None)
            kept = 0
            for s, j, tok in cand:
                if kept >= N:
                    break
                step_cov = (cov[b * N + j] + attn[b * N + j]
                            if use_cov else None)
                if tok == eos:
                    fin_hyps[b].append(
                        (_final_score(s, u + 1, step_cov, b),
                         [int(x) for x in ys[b * N + j, 1 : u + 1]])
                    )
                    continue
                new_ys[kept] = ys[b * N + j]
                new_ys[kept, u + 1] = tok
                new_scores[kept] = s
                if use_cov:
                    new_cov[kept] = step_cov
                kept += 1
            ys[b * N : (b + 1) * N] = new_ys
            scores[b] = new_scores
            finished[b] = new_fin
            if use_cov:
                cov[b * N : (b + 1) * N] = new_cov
    results = []
    for b in range(B):
        # include unfinished best hypotheses as fallback
        for j in range(N):
            if np.isfinite(scores[b, j]):
                fin_hyps[b].append(
                    (_final_score(scores[b, j], max_len,
                                  cov[b * N + j] if use_cov else None, b),
                     [int(x) for x in ys[b * N + j, 1 : max_len + 1]
                      if x != eos])
                )
        fin_hyps[b].sort(key=lambda x: x[0], reverse=True)
        best = fin_hyps[b][0] if fin_hyps[b] else (0.0, [])
        results.append(DecodeResult(tokens=best[1], score=float(best[0])))
    return results


def make_gnmt_step_fn(model, params):
    """Build a decoder_one_step_attn callable for the GNMT coverage path:
    returns (last-position log-probs (N, V), head-averaged last-layer
    src-attention at the last position (N, T_enc))."""

    def _find_src_attn(tree, out):
        if isinstance(tree, dict):
            for k in sorted(tree.keys()):
                if k == "src_attn" and "attn_weights" in tree[k]:
                    out.append(tree[k]["attn_weights"][0])
                else:
                    _find_src_attn(tree[k], out)

    def step(enc, enc_lens, ys, ys_lens):
        logp, mut = model.apply(
            params, enc, enc_lens, ys, ys_lens,
            method=model.decoder_one_step_attn,
            mutable=["intermediates"])
        found = []
        _find_src_attn(mut["intermediates"], found)
        if not found:
            raise ValueError("no src_attn weights captured")
        probs = found[-1]                     # last decoder layer
        return logp, probs[:, :, -1, :].mean(axis=1)

    return step


def attention_rescoring_scores(
    decoder_apply,
    enc_out: jax.Array,
    enc_len: jax.Array,
    nbest: List[List[int]],
    sos: int,
    eos: int,
    reverse_weight: float = 0.0,
) -> np.ndarray:
    """Batch-score n-best hypotheses with the attention decoder.

    decoder_apply(enc, enc_lens, ys_in, ys_lens, r_ys_in, reverse_weight)
    -> (l_logits, r_logits); enc_out is a single utterance (1, T, D)
    broadcast across hypotheses (mirrors `asr_model.py` attention_rescoring
    which runs the decoder once over padded hyps).
    Returns (n,) total log-prob of each hypothesis (incl. <eos>).
    """
    n = len(nbest)
    maxu = max((len(h) for h in nbest), default=0) + 1
    ys_in = np.full((n, maxu), eos, np.int32)
    r_ys_in = np.full((n, maxu), eos, np.int32)
    ys_in[:, 0] = sos
    r_ys_in[:, 0] = sos
    ys_lens = np.zeros((n,), np.int32)
    for i, h in enumerate(nbest):
        ys_in[i, 1 : 1 + len(h)] = h
        r_ys_in[i, 1 : 1 + len(h)] = h[::-1]
        ys_lens[i] = len(h) + 1
    enc = jnp.repeat(enc_out, n, axis=0)
    enc_lens = jnp.repeat(enc_len, n, axis=0)
    l_logits, r_logits = decoder_apply(
        enc, enc_lens, jnp.asarray(ys_in), jnp.asarray(ys_lens),
        jnp.asarray(r_ys_in), reverse_weight,
    )
    l_logp = np.asarray(jax.nn.log_softmax(l_logits, axis=-1))
    r_logp = np.asarray(jax.nn.log_softmax(r_logits, axis=-1))
    scores = np.zeros((n,), np.float64)
    for i, h in enumerate(nbest):
        s = sum(l_logp[i, j, tok] for j, tok in enumerate(h))
        s += l_logp[i, len(h), eos]
        if reverse_weight > 0.0:
            rh = h[::-1]
            rs = sum(r_logp[i, j, tok] for j, tok in enumerate(rh))
            rs += r_logp[i, len(h), eos]
            s = (1.0 - reverse_weight) * s + reverse_weight * rs
        scores[i] = s
    return scores


def attention_rescoring(
    decoder_apply,
    enc_out: jax.Array,
    enc_lens: jax.Array,
    ctc_results: List[DecodeResult],
    sos: int,
    eos: int,
    ctc_weight: float = 0.3,
    reverse_weight: float = 0.0,
) -> List[DecodeResult]:
    """Rescore prefix-beam n-best lists (`search.py:363-448`)."""
    out = []
    for b, res in enumerate(ctc_results):
        if not res.nbest:
            out.append(DecodeResult(tokens=[]))
            continue
        att = attention_rescoring_scores(
            decoder_apply, enc_out[b : b + 1], enc_lens[b : b + 1],
            res.nbest, sos, eos, reverse_weight,
        )
        total = att + ctc_weight * np.asarray(res.nbest_scores)
        best = int(np.argmax(total))
        out.append(DecodeResult(
            tokens=res.nbest[best], score=float(total[best]),
            times=res.nbest_times[best] if res.nbest_times else [],
        ))
    return out
