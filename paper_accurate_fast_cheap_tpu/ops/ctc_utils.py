"""CTC alignment utilities.

Parity targets: `wenet/utils/ctc_utils.py` — force_align viterbi (`:105`),
gen_timestamps_from_peak (`:62`), get_blank_id (`:164`); plus the behavior of
the release-missing `wenet/bin/ctc_align.py` (token-level CTM timings used by
`recognize_wav2.py:539-541`).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def insert_blank(labels: Sequence[int], blank_id: int = 0) -> np.ndarray:
    """y -> [blank, y1, blank, y2, ..., blank]."""
    out = np.full(2 * len(labels) + 1, blank_id, np.int64)
    out[1::2] = labels
    return out


def force_align(ctc_probs: np.ndarray, labels: Sequence[int],
                blank_id: int = 0) -> List[int]:
    """Viterbi alignment over the CTC graph.

    ctc_probs: (T, V) log-probs; labels: (U,).  Returns per-frame token ids
    (blank or label) of the best path.
    """
    ctc_probs = np.asarray(ctc_probs)
    T = ctc_probs.shape[0]
    y = insert_blank(list(labels), blank_id)
    S = len(y)
    lp = ctc_probs[:, y]                      # (T, S): only these columns
    # skip-transition (s-2) allowed where the label differs from two back
    allow2 = np.zeros(S, bool)
    allow2[2:] = (y[2:] != blank_id) & (y[2:] != y[:-2])
    NEG = -np.inf
    srange = np.arange(S)
    bp = np.tile(srange, (T, 1))
    alpha = np.full(S, NEG)
    alpha[0] = lp[0, 0]
    if S > 1:
        alpha[1] = lp[0, 1]
    # vectorized over states; ties keep the loop version's source priority
    # stay > s-1 > s-2 (np.argmax returns the first max)
    for t in range(1, T):
        c1 = np.full(S, NEG)
        c1[1:] = alpha[:-1]
        c2 = np.full(S, NEG)
        if S > 2:
            c2[2:] = np.where(allow2[2:], alpha[:-2], NEG)
        stack = np.stack((alpha, c1, c2))
        k = np.argmax(stack, axis=0)
        alpha = stack[k, srange] + lp[t]
        bp[t] = srange - k
    # end state: S-1 or S-2
    if S > 1 and alpha[S - 2] > alpha[S - 1]:
        s = S - 2
    else:
        s = S - 1
    path = np.zeros(T, np.int64)
    for t in range(T - 1, -1, -1):
        path[t] = y[s]
        if t > 0:
            s = bp[t, s]
    return [int(x) for x in path]


def remove_duplicates_and_blank(alignment: Sequence[int],
                                blank_id: int = 0) -> List[int]:
    out, prev = [], None
    for a in alignment:
        if a != prev and a != blank_id:
            out.append(int(a))
        prev = a
    return out


def alignment_to_token_spans(
    alignment: Sequence[int], blank_id: int = 0
) -> List[Tuple[int, int, int]]:
    """Collapse a frame alignment into (token, start_frame, end_frame_excl)."""
    spans = []
    prev = blank_id
    start = 0
    for t, a in enumerate(alignment):
        if a != prev:
            if prev != blank_id:
                spans.append((int(prev), start, t))
            start = t
            prev = a
        # same token repeated frames extend the span
    if prev != blank_id:
        spans.append((int(prev), start, len(alignment)))
    return spans


def gen_timestamps_from_peak(
    peaks: Sequence[int],
    max_duration: float,
    frame_rate: float = 0.04,
    max_token_duration: float = 1.0,
) -> List[Tuple[float, float]]:
    """Token (begin, end) times from CTC peak frames (`ctc_utils.py:62`):
    midpoints between neighbouring peaks, capped at max_token_duration."""
    times = []
    half = max_token_duration / 2
    for i, p in enumerate(peaks):
        t = p * frame_rate
        if i == 0:
            start = max(0.0, t - half)
        else:
            start = max((peaks[i - 1] * frame_rate + t) / 2, t - half)
        if i == len(peaks) - 1:
            end = min(max_duration, t + half)
        else:
            end = min((t + peaks[i + 1] * frame_rate) / 2, t + half)
        times.append((round(start, 3), round(end, 3)))
    return times


def get_blank_id(configs: dict, symbol_table: dict) -> int:
    blank_id = configs.get("ctc_conf", {}).get("ctc_blank_id")
    if blank_id is None:
        blank_id = symbol_table.get("<blank>", 0)
    return int(blank_id)


# -- batched on-device Viterbi (long-form CTM timing path) -----------------

_VITERBI_CACHE: dict = {}


def viterbi_path_device(logp, lens, y, allow2, S, unroll: int = 1):
    """Traceable whole-batch CTC Viterbi: forward scan emitting
    backpointers + reverse backtrack scan, all in jnp ops so it can run
    standalone OR inlined inside a larger jitted program (the fused
    long-form decode chain).  Only the (B, T) best-path token ids need
    to come back to host — at long-form shapes the alternative (fetching
    posterior columns and looping on host) costs seconds per window
    batch in transfers + Python.

    logp (B,T,V); lens/S (B,) i32; y (B,Sp) i32 blank-interleaved label
    sequences; allow2 (B,Sp) bool skip-transition mask.  Rows whose
    sequence does not fit Sp must be masked by the caller.
    """
    import jax
    import jax.numpy as jnp

    NEG = jnp.float32(-jnp.inf)
    B, T, _ = logp.shape
    Sp = y.shape[1]

    lp = jnp.take_along_axis(
        logp.astype(jnp.float32), y[:, None, :], axis=2)  # (B,T,Sp)
    valid = jnp.arange(Sp)[None, :] < S[:, None]
    lp = jnp.where(valid[:, None, :], lp, NEG)

    alpha0 = jnp.full((B, Sp), NEG)
    alpha0 = alpha0.at[:, 0].set(lp[:, 0, 0])
    if Sp > 1:
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(S > 1, lp[:, 0, 1], NEG))

    negcol = jnp.full((B, 1), NEG)

    def step(alpha, inp):
        lp_t, t = inp
        c1 = jnp.concatenate([negcol, alpha[:, :-1]], axis=1)
        if Sp > 2:
            c2 = jnp.concatenate([negcol, negcol, alpha[:, :-2]],
                                 axis=1)
        else:
            c2 = jnp.full((B, Sp), NEG)
        c2 = jnp.where(allow2, c2, NEG)
        stack = jnp.stack([alpha, c1, c2])        # (3,B,Sp)
        k = jnp.argmax(stack, axis=0)             # first max: stay>1>2
        new_alpha = jnp.take_along_axis(stack, k[None], axis=0)[0] \
            + lp_t
        act = (t < lens)[:, None]                 # freeze ended rows
        return (jnp.where(act, new_alpha, alpha),
                jnp.where(act, k, 0).astype(jnp.int8))

    # unroll amortizes loop overhead of the tiny (B,Sp) elementwise body
    alpha, ks = jax.lax.scan(
        step, alpha0,
        (jnp.moveaxis(lp[:, 1:], 1, 0), jnp.arange(1, T)),
        unroll=unroll)

    sm1 = S - 1
    sm2 = jnp.maximum(S - 2, 0)
    a_m1 = jnp.take_along_axis(alpha, sm1[:, None], 1)[:, 0]
    a_m2 = jnp.take_along_axis(alpha, sm2[:, None], 1)[:, 0]
    s_end = jnp.where((S > 1) & (a_m2 > a_m1), sm2, sm1)

    def back(s, k_t):
        tok = jnp.take_along_axis(y, s[:, None], 1)[:, 0]
        kk = jnp.take_along_axis(k_t, s[:, None], 1)[:, 0]
        return s - kk.astype(jnp.int32), tok

    s0, toks = jax.lax.scan(back, s_end, ks, reverse=True,
                            unroll=unroll)
    tok0 = jnp.take_along_axis(y, s0[:, None], 1)  # (B,1)
    return jnp.concatenate(
        [tok0, jnp.moveaxis(toks, 0, 1)], axis=1)  # (B,T)


def _viterbi_program(B: int, T: int, Sp: int, V: int):
    """Jitted standalone wrapper of `viterbi_path_device` (host-token
    alignment path, shapes baked for the program cache)."""
    import jax

    return jax.jit(viterbi_path_device)


def force_align_device_tokens(logp, lens, tokens, tok_len,
                              blank_id: int = 0, unroll: int = 1):
    """Traceable forced alignment whose LABELS are device arrays.

    The host variant (`force_align_batch_device`) needs the hypothesis
    tokens on host to build the blank-interleaved state sequence — a
    round trip that serializes beam-fetch -> align-dispatch in long-form
    decode.  This builds y/allow2/S with jnp ops from the beam's top
    hypothesis so the alignment fuses into the SAME dispatched program
    as the encoder + beam (recognize_wav --fuse).

    logp (B,T,V) log-probs; lens (B,) valid frames; tokens (B, Lmax)
    top-hypothesis ids (garbage past tok_len); tok_len (B,).
    Returns (path (B,T) i32, ok (B,) bool).  ok[b] is False when the
    2*tok_len+1 state sequence does not fit 2*Lmax+1 (cannot happen when
    tokens is the full beam row) or tok_len==0; such rows' paths are
    all-blank and the caller must fall back / skip.
    """
    import jax.numpy as jnp

    B, Lmax = tokens.shape
    Sp = 2 * Lmax + 1
    pos = jnp.arange(Sp)
    tok_idx = jnp.maximum((pos - 1) // 2, 0)
    gathered = jnp.take(tokens, jnp.minimum(tok_idx, Lmax - 1), axis=1)
    is_tok = ((pos % 2 == 1)[None, :]
              & (tok_idx[None, :] < tok_len[:, None]))
    y = jnp.where(is_tok, gathered, blank_id).astype(jnp.int32)
    # skip (s-2) allowed at non-blank states whose label differs from
    # two states back (i.e. from the previous label)
    y2 = jnp.concatenate(
        [jnp.full((B, 2), blank_id, y.dtype), y[:, :-2]], axis=1)
    allow2 = (pos[None, :] >= 2) & (y != blank_id) & (y != y2)
    S = (2 * tok_len + 1).astype(jnp.int32)
    ok = (tok_len > 0) & (S <= Sp)
    path = viterbi_path_device(logp, jnp.asarray(lens, jnp.int32), y,
                               allow2, jnp.where(ok, S, 1),
                               unroll=unroll)
    path = jnp.where(ok[:, None], path, blank_id)
    return path, ok


def force_align_batch_device(logp, lens, labels_list, blank_id: int = 0,
                             s_bucket: int = 256):
    """Batched `force_align` with the DP on device.

    logp: (B, T, V) log-probs (jax array, stays on device); lens (B,)
    valid frame counts; labels_list: per-row hypothesis token ids.
    Returns per-row frame alignments (lists, length lens[b]), identical
    to `force_align(logp[b, :lens[b]], labels_list[b])`.  The state axis
    is padded to `s_bucket` multiples so XLA programs are reused across
    hypothesis lengths.
    """
    import jax.numpy as jnp

    B, T, V = logp.shape
    lens = np.asarray(lens, np.int64)
    S_real = np.asarray([2 * len(l) + 1 for l in labels_list], np.int32)
    Sp = max(s_bucket, int(
        -(-int(S_real.max()) // s_bucket) * s_bucket))
    y = np.full((B, Sp), blank_id, np.int32)
    allow2 = np.zeros((B, Sp), bool)
    for b, labels in enumerate(labels_list):
        yb = insert_blank(list(labels), blank_id)
        y[b, : len(yb)] = yb
        if len(yb) > 2:
            allow2[b, 2 : len(yb)] = ((yb[2:] != blank_id)
                                      & (yb[2:] != yb[:-2]))
    key = (B, T, Sp, V)
    run = _VITERBI_CACHE.get(key)
    if run is None:
        run = _viterbi_program(B, T, Sp, V)
        _VITERBI_CACHE[key] = run
        if len(_VITERBI_CACHE) > 16:
            _VITERBI_CACHE.pop(next(iter(_VITERBI_CACHE)))
    path = np.asarray(run(logp, jnp.asarray(lens, jnp.int32),
                          jnp.asarray(y), jnp.asarray(allow2),
                          jnp.asarray(S_real)))
    return [[int(x) for x in path[b, : int(lens[b])]] for b in range(B)]
