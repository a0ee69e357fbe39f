"""force_align / timestamp utilities.

Parity target: `wenet/utils/ctc_utils.py:105-163` (force_align Viterbi).
The vectorized implementation must match the reference's per-state loop
exactly, including tie-breaking (stay > s-1 > s-2, end state prefers S-1)
— checked here against an inline transliteration of the loop form.
"""
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.ops.ctc_utils import (
    alignment_to_token_spans,
    force_align,
    insert_blank,
)


def _force_align_loop(ctc_probs, labels, blank_id=0):
    """The reference's O(T*S) per-state loop (`ctc_utils.py:105-163`)."""
    ctc_probs = np.asarray(ctc_probs)
    T = ctc_probs.shape[0]
    y = insert_blank(list(labels), blank_id)
    S = len(y)
    alpha = np.full((T, S), -np.inf)
    bp = np.zeros((T, S), np.int64)
    alpha[0, 0] = ctc_probs[0, y[0]]
    if S > 1:
        alpha[0, 1] = ctc_probs[0, y[1]]
    for t in range(1, T):
        for s in range(S):
            cands = [alpha[t - 1, s]]
            srcs = [s]
            if s > 0:
                cands.append(alpha[t - 1, s - 1])
                srcs.append(s - 1)
            if s > 1 and y[s] != blank_id and y[s] != y[s - 2]:
                cands.append(alpha[t - 1, s - 2])
                srcs.append(s - 2)
            k = int(np.argmax(cands))
            alpha[t, s] = cands[k] + ctc_probs[t, y[s]]
            bp[t, s] = srcs[k]
    s = S - 2 if (S > 1 and alpha[T - 1, S - 2] > alpha[T - 1, S - 1]) \
        else S - 1
    path = np.zeros(T, np.int64)
    for t in range(T - 1, -1, -1):
        path[t] = y[s]
        if t > 0:
            s = bp[t, s]
    return [int(x) for x in path]


def test_force_align_matches_loop_reference():
    rng = np.random.RandomState(0)
    for _ in range(100):
        V = rng.randint(3, 12)
        T = rng.randint(1, 30)
        L = rng.randint(0, max(1, T // 2))
        labels = list(rng.randint(1, V, size=L))
        lp = np.log(rng.dirichlet(np.ones(V), size=T))
        assert force_align(lp, labels) == _force_align_loop(lp, labels)


def test_force_align_repeated_labels():
    # identical consecutive labels force a blank between emissions
    rng = np.random.RandomState(1)
    lp = np.log(rng.dirichlet(np.ones(5), size=12))
    labels = [2, 2, 2]
    ali = force_align(lp, labels)
    assert ali == _force_align_loop(lp, labels)
    spans = alignment_to_token_spans(ali)
    assert [s[0] for s in spans] == labels


def test_force_align_column_remap_invariance():
    """recognize_wav's LF path gathers only {blank}+hyp columns and
    remaps ids; the alignment peaks must be identical."""
    rng = np.random.RandomState(2)
    V, T = 50, 40
    lp = np.log(rng.dirichlet(np.ones(V), size=T))
    labels = [7, 31, 7, 7, 45]
    full = force_align(lp, labels)
    cols = np.unique(np.asarray([0] + labels, np.int64))
    remap = {int(c): i for i, c in enumerate(cols)}
    sub = lp[:, cols]
    packed = force_align(sub, [remap[t] for t in labels],
                         blank_id=remap[0])
    inv = {i: int(c) for i, c in enumerate(cols)}
    assert [inv[p] for p in packed] == full


def test_force_align_empty_labels():
    rng = np.random.RandomState(3)
    lp = np.log(rng.dirichlet(np.ones(4), size=6))
    assert force_align(lp, []) == [0] * 6


def test_force_align_batch_device_parity():
    """The on-device batched Viterbi (LF CTM timing path) must return the
    host aligner's exact output per row, including frozen tail frames
    (lens < T), empty hypotheses, and repeated labels."""
    import jax.numpy as jnp

    from paper_accurate_fast_cheap_tpu.ops.ctc_utils import (
        force_align_batch_device,
    )

    rng = np.random.RandomState(4)
    B, T, V = 5, 25, 8
    logp = np.log(rng.dirichlet(np.ones(V), size=(B, T))).astype(np.float32)
    lens = np.asarray([25, 17, 1, 25, 9])
    labels = [[3, 3, 5], [1], [], [2, 4, 2, 4, 7, 7], [6, 6]]
    out = force_align_batch_device(jnp.asarray(logp), lens, labels,
                                   s_bucket=4)
    for b in range(B):
        assert out[b] == force_align(logp[b, : lens[b]], labels[b]), b
