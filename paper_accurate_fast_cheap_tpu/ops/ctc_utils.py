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
