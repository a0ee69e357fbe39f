"""Time-synchronous joint CTC + attention one-pass decoding.

Parity targets: `wenet/espnet/beam_search_timesync.py:86-` (BeamSearchTimeSync:
CTC-prefix time-synchronous search where every prefix extension is scored by
the attention decoder, with per-prefix caching of decoder scores,
`cached_score :184-222`) and `wenet/transformer/search.py:450-497`
(joint_decoding dispatch): combined score =
``ctc_weight * ctc_prefix + att_weight * att``.

TPU split: decoder one-step calls are batched across all uncached prefix
extensions of a frame (one jitted call per frame) — the reference scores
them one python call at a time.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.decode.search import DecodeResult


def joint_decoding(
    decoder_one_step: Callable,
    enc_out: jax.Array,        # (1, T, D) single utterance
    enc_len: jax.Array,
    ctc_probs: np.ndarray,     # (T, V) log-probs
    sos: int,
    eos: int,
    beam_size: int = 10,
    ctc_weight: float = 0.5,
    att_weight: float = 0.5,
    blank_id: int = 0,
) -> DecodeResult:
    """Single-utterance time-sync joint search."""
    T = int(enc_len[0]) if hasattr(enc_len, "__getitem__") else int(enc_len)
    V = ctc_probs.shape[-1]
    # per-prefix CTC scores (blank-ending, nonblank-ending) + cached att
    # log-prob vector over next tokens
    beams: Dict[tuple, List[float]] = {(): [0.0, -np.inf]}
    att_cache: Dict[tuple, np.ndarray] = {}
    att_score: Dict[tuple, float] = {(): 0.0}

    step_fn = jax.jit(decoder_one_step)

    def ensure_att(prefixes: List[tuple]):
        missing = [p for p in prefixes if p not in att_cache]
        if not missing:
            return
        maxu = max(len(p) for p in missing) + 1
        n = len(missing)
        ys = np.full((n, maxu), eos, np.int32)
        ys[:, 0] = sos
        ys_lens = np.zeros((n,), np.int32)
        for i, p in enumerate(missing):
            ys[i, 1 : 1 + len(p)] = p
            ys_lens[i] = len(p) + 1
        enc_rep = jnp.repeat(enc_out, n, axis=0)
        lens_rep = jnp.repeat(jnp.asarray([T]), n, axis=0)
        logp = np.asarray(step_fn(enc_rep, lens_rep, jnp.asarray(ys),
                                  jnp.asarray(ys_lens)))
        for i, p in enumerate(missing):
            att_cache[p] = logp[i]

    for t in range(T):
        lp = ctc_probs[t]
        top = np.argsort(lp)[-beam_size:]
        ensure_att(list(beams.keys()))
        nxt: Dict[tuple, List[float]] = {}
        for prefix, (pb, pnb) in beams.items():
            p_tot = np.logaddexp(pb, pnb)
            # blank / repeat keep the prefix
            ent = nxt.setdefault(prefix, [-np.inf, -np.inf])
            ent[0] = np.logaddexp(ent[0], p_tot + lp[blank_id])
            if prefix:
                ent[1] = np.logaddexp(ent[1], pnb + lp[prefix[-1]])
            for u in top:
                u = int(u)
                if u == blank_id:
                    continue
                new = prefix + (u,)
                base = pb if (prefix and u == prefix[-1]) else p_tot
                e2 = nxt.setdefault(new, [-np.inf, -np.inf])
                e2[1] = np.logaddexp(e2[1], base + lp[u])
                if new not in att_score:
                    att_score[new] = att_score[prefix] + float(
                        att_cache[prefix][u]
                    )

        def combined(item):
            prefix, (pb, pnb) = item
            return (ctc_weight * np.logaddexp(pb, pnb)
                    + att_weight * att_score.get(prefix, -np.inf))

        beams = dict(sorted(nxt.items(), key=combined,
                            reverse=True)[:beam_size])

    # final ranking includes the attention eos score
    ensure_att(list(beams.keys()))
    best_prefix, best_score = (), -np.inf
    for prefix, (pb, pnb) in beams.items():
        s = ctc_weight * np.logaddexp(pb, pnb) + att_weight * (
            att_score.get(prefix, -np.inf)
            + float(att_cache[prefix][eos])
        )
        if s > best_score:
            best_prefix, best_score = prefix, s
    return DecodeResult(tokens=list(best_prefix), score=float(best_score))
