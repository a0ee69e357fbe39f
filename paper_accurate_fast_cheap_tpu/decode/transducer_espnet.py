"""ESPnet-style alternative transducer search stack.

Parity target: `/root/reference/wenet/transducer_espnet/
beam_search_transducer.py` (835 LoC) — the legacy alt stack the reference
carries next to `wenet/transducer/search/`.  Implemented here:

* ``default_beam_search``   (`:235-312`, Graves 2012 best-first beam)
* ``time_sync_decoding``    (`:313-407`, TSD with ``max_sym_exp``,
  Saon et al. 2020)
* ``align_length_sync_decoding`` (`:408-512`, ALSD with ``u_max``,
  Saon et al. 2020)

NSC (`:514-665`) and mAES (`:667-835`) are deliberately excluded: both
exist in the reference solely to host per-step neural-LM shallow fusion
(`use_lm`), which the release never configures (no LM is shipped or wired
in any recipe); without an LM they reduce to TSD with extra bookkeeping.
Documented in COVERAGE.md with the same rigor as the k2 gate.

Interface: the same jitted step callables the main stack uses
(`decode/rnnt_search.py`): ``predictor_step(tokens (n,), state) ->
(out (n, D), state)`` with per-hyp states gathered on axis 1 (ndim>=3) or
0; ``joint_step(enc (n, De), pred (n, Dp)) -> log-probs (n, V)``.  Device
work is batched per expansion round; the O(beam) bookkeeping runs on host
(this alt stack is not the paper's decode mode; the fully-on-device path
is `rnnt_search.rnnt_beam_search`).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.decode.rnnt_search import (
    _gather_state,
)
from paper_accurate_fast_cheap_tpu.decode.search import DecodeResult


@dataclasses.dataclass
class Hypothesis:
    """`beam_search_transducer.py:24-36`."""

    score: float
    yseq: List[int]
    pred_out: np.ndarray          # predictor output after consuming yseq
    state_idx: int                # row into the searcher's state bank


class _StateBank:
    """Flat predictor-state storage with row gather/append semantics."""

    def __init__(self, state):
        self.state = state        # pytree, n rows

    def gather(self, idxs):
        return _gather_state(self.state, jnp.asarray(idxs, jnp.int32))

    def append_rows(self, new_state):
        def cat(a, b):
            axis = 1 if a.ndim >= 3 else 0
            return jnp.concatenate([a, b], axis=axis)

        n0 = self._rows()
        self.state = jax.tree.map(cat, self.state, new_state)
        return n0

    def _rows(self):
        leaf = jax.tree.leaves(self.state)[0]
        return leaf.shape[1] if leaf.ndim >= 3 else leaf.shape[0]


class BeamSearchTransducer:
    """`beam_search_transducer.py:45-163` surface (LM-free)."""

    def __init__(
        self,
        predictor_step: Callable,
        joint_step: Callable,
        init_state_fn: Callable,
        beam_size: int = 8,
        blank_id: int = 0,
        search_type: str = "default",
        max_sym_exp: int = 2,
        u_max: int = 50,
        score_norm: bool = True,
        prefix_alpha: int = 1,
        nbest: Optional[int] = None,
    ):
        self.predictor_step = predictor_step
        self.joint_step = jax.jit(joint_step)
        self.init_state_fn = init_state_fn
        self.beam_size = beam_size
        self.blank_id = blank_id
        self.search_type = search_type
        self.max_sym_exp = max_sym_exp
        self.u_max = u_max
        self.score_norm = score_norm
        self.prefix_alpha = prefix_alpha
        self.nbest = nbest if nbest is not None else beam_size

    # -- public -----------------------------------------------------------
    def __call__(self, enc_out: jax.Array) -> List[Hypothesis]:
        """enc_out: (T, De) one utterance -> n-best hypotheses."""
        enc_out = jnp.asarray(enc_out)
        if self.search_type == "default":
            hyps = self.default_beam_search(enc_out)
        elif self.search_type == "tsd":
            hyps = self.time_sync_decoding(enc_out)
        elif self.search_type == "alsd":
            hyps = self.align_length_sync_decoding(enc_out)
        else:
            raise NotImplementedError(
                f"search_type {self.search_type!r}; nsc/maes are excluded "
                "(LM-fusion-only variants, see module docstring)")
        return self.sort_nbest(hyps)

    def decode(self, enc_out) -> DecodeResult:
        hyps = self(enc_out)
        nbest = [h.yseq[1:] for h in hyps]
        scores = [h.score for h in hyps]
        return DecodeResult(tokens=nbest[0] if nbest else [],
                            score=scores[0] if scores else 0.0,
                            nbest=nbest, nbest_scores=scores)

    def sort_nbest(self, hyps: List[Hypothesis]) -> List[Hypothesis]:
        """`:146-163` — normalize by length when score_norm."""
        if self.score_norm:
            hyps.sort(key=lambda x: x.score / max(len(x.yseq), 1),
                      reverse=True)
        else:
            hyps.sort(key=lambda x: x.score, reverse=True)
        return hyps[: self.nbest]

    # -- helpers ----------------------------------------------------------
    def _init_hyp(self):
        state = self.init_state_fn(1)
        tok = jnp.full((1,), self.blank_id, jnp.int32)
        pred, state = self.predictor_step(tok, state)
        bank = _StateBank(state)
        return Hypothesis(score=0.0, yseq=[self.blank_id],
                          pred_out=np.asarray(pred[0]), state_idx=0), bank

    def _advance(self, bank: _StateBank, hyps: List[Hypothesis],
                 tokens: List[int]):
        """Predictor step for (hyp, token) pairs; returns (pred_outs,
        new state row indices)."""
        idxs = [h.state_idx for h in hyps]
        st = bank.gather(idxs)
        toks = jnp.asarray(tokens, jnp.int32)
        pred, new_state = self.predictor_step(toks, st)
        base = bank.append_rows(new_state)
        return np.asarray(pred), [base + i for i in range(len(hyps))]

    def _joint(self, enc_t: jax.Array, hyps: List[Hypothesis]):
        pred = jnp.asarray(np.stack([h.pred_out for h in hyps]))
        enc = jnp.broadcast_to(enc_t[None], (len(hyps), enc_t.shape[-1]))
        return np.asarray(self.joint_step(enc, pred))

    # -- searches ----------------------------------------------------------
    def default_beam_search(self, enc_out) -> List[Hypothesis]:
        """Graves beam search (`:235-312`): best-first per frame; a frame
        finishes once >= beam kept (blank-extended) hyps outscore every
        pending expansion."""
        beam = self.beam_size
        beam_k = beam
        h0, bank = self._init_hyp()
        kept_hyps = [h0]
        for t in range(enc_out.shape[0]):
            hyps = kept_hyps
            kept_hyps = []
            while True:
                max_hyp = max(hyps, key=lambda x: x.score)
                hyps.remove(max_hyp)
                logp = self._joint(enc_out[t], [max_hyp])[0]
                nb = logp.copy()
                nb[self.blank_id] = -np.inf
                toks = [int(k) for k in
                        np.argsort(-nb)[: min(beam_k, nb.shape[0] - 1)]]
                # blank: hyp survives to the next frame
                kept_hyps.append(Hypothesis(
                    score=max_hyp.score + float(logp[self.blank_id]),
                    yseq=max_hyp.yseq[:], pred_out=max_hyp.pred_out,
                    state_idx=max_hyp.state_idx))
                # non-blank expansions compete within this frame
                preds, rows = self._advance(
                    bank, [max_hyp] * len(toks), toks)
                for tok, pr, row in zip(toks, preds, rows):
                    hyps.append(Hypothesis(
                        score=max_hyp.score + float(logp[tok]),
                        yseq=max_hyp.yseq + [tok],
                        pred_out=pr, state_idx=row))
                hyps_max = max(h.score for h in hyps)
                kept_most_prob = [h for h in kept_hyps
                                  if h.score > hyps_max]
                if len(kept_most_prob) >= beam:
                    kept_hyps = kept_most_prob
                    break
        return kept_hyps

    def time_sync_decoding(self, enc_out) -> List[Hypothesis]:
        """TSD (`:313-407`): per frame, up to max_sym_exp expansion
        rounds; blank outcomes merge into A by yseq."""
        beam = self.beam_size
        h0, bank = self._init_hyp()
        B = [h0]
        for t in range(enc_out.shape[0]):
            A: List[Hypothesis] = []
            C = B
            for v in range(self.max_sym_exp):
                if not C:
                    break
                logp = self._joint(enc_out[t], C)
                D: List[Hypothesis] = []
                seq_A = [h.yseq for h in A]
                for i, hyp in enumerate(C):
                    new_score = hyp.score + float(logp[i, self.blank_id])
                    if hyp.yseq not in seq_A:
                        A.append(Hypothesis(
                            score=new_score, yseq=hyp.yseq[:],
                            pred_out=hyp.pred_out,
                            state_idx=hyp.state_idx))
                        seq_A.append(hyp.yseq)
                    else:
                        pos = seq_A.index(hyp.yseq)
                        A[pos].score = float(np.logaddexp(
                            A[pos].score, new_score))
                if v < self.max_sym_exp - 1:
                    nb = np.asarray(logp[:, 1:]) if self.blank_id == 0 \
                        else logp
                    k = min(beam, nb.shape[1])
                    top = np.argpartition(-nb, k - 1, axis=1)[:, :k]
                    cand_hyps, cand_toks, cand_scores = [], [], []
                    for i, hyp in enumerate(C):
                        for kk in top[i]:
                            tok = int(kk) + (1 if self.blank_id == 0
                                             else 0)
                            cand_hyps.append(hyp)
                            cand_toks.append(tok)
                            cand_scores.append(
                                hyp.score + float(nb[i, kk]))
                    preds, rows = self._advance(bank, cand_hyps, cand_toks)
                    for h, tok, s, pr, row in zip(
                            cand_hyps, cand_toks, cand_scores, preds,
                            rows):
                        D.append(Hypothesis(score=s, yseq=h.yseq + [tok],
                                            pred_out=pr, state_idx=row))
                C = sorted(D, key=lambda x: x.score, reverse=True)[:beam]
            B = sorted(A, key=lambda x: x.score, reverse=True)[:beam]
        return B

    def align_length_sync_decoding(self, enc_out) -> List[Hypothesis]:
        """ALSD (`:408-512`): steps over i = t + u; hyps with the same
        yseq recombine; hyps reaching the last frame on blank become
        final."""
        beam = self.beam_size
        t_max = enc_out.shape[0]
        u_max = min(self.u_max, t_max - 1)
        h0, bank = self._init_hyp()
        B = [h0]
        final: List[Hypothesis] = []
        for i in range(t_max + u_max):
            B_, B_t = [], []
            for hyp in B:
                u = len(hyp.yseq) - 1
                t = i - u
                if t > t_max - 1:
                    continue
                B_.append(hyp)
                B_t.append(t)
            if not B_:
                continue
            enc = jnp.asarray(np.stack(
                [np.asarray(enc_out[t]) for t in B_t]))
            pred = jnp.asarray(np.stack([h.pred_out for h in B_]))
            logp = np.asarray(self.joint_step(enc, pred))
            A: List[Hypothesis] = []
            cand_hyps, cand_toks, cand_scores = [], [], []
            for idx, hyp in enumerate(B_):
                new_hyp = Hypothesis(
                    score=hyp.score + float(logp[idx, self.blank_id]),
                    yseq=hyp.yseq[:], pred_out=hyp.pred_out,
                    state_idx=hyp.state_idx)
                A.append(new_hyp)
                if B_t[idx] == t_max - 1:
                    final.append(new_hyp)
                nb = logp[idx, 1:] if self.blank_id == 0 else logp[idx]
                k = min(beam, nb.shape[0])
                top = np.argpartition(-nb, k - 1)[:k]
                for kk in top:
                    tok = int(kk) + (1 if self.blank_id == 0 else 0)
                    cand_hyps.append(hyp)
                    cand_toks.append(tok)
                    cand_scores.append(hyp.score + float(nb[kk]))
            if cand_hyps:
                preds, rows = self._advance(bank, cand_hyps, cand_toks)
                for h, tok, s, pr, row in zip(cand_hyps, cand_toks,
                                              cand_scores, preds, rows):
                    A.append(Hypothesis(score=s, yseq=h.yseq + [tok],
                                        pred_out=pr, state_idx=row))
            B = sorted(A, key=lambda x: x.score, reverse=True)[:beam]
            B = _recombine_hyps(B)
        return final if final else B


def _recombine_hyps(hyps: List[Hypothesis]) -> List[Hypothesis]:
    """Merge duplicate yseq with log-add (`utils2.py recombine_hyps`)."""
    out: List[Hypothesis] = []
    seen = {}
    for hyp in hyps:
        key = tuple(hyp.yseq)
        if key in seen:
            out[seen[key]].score = float(np.logaddexp(
                out[seen[key]].score, hyp.score))
        else:
            seen[key] = len(out)
            out.append(hyp)
    return out
