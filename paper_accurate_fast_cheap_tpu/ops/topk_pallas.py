"""Pallas TPU kernel: exact top-k over a vocab-sized last axis.

Why: the device beam (`decode/rnnt_search.py`) spends ~60% of its
per-frame cost in `top_k_vocab` — measured 0.165 ms/frame at the SF
operating point (B=64, beam 8, V=5002; `bin/scan_op_bench.py`) vs
0.036 ms for the joint matmul.  The XLA formulation is two levels of k
masked-argmax rounds: ~16 serial rounds = ~40 small kernel dispatches +
HBM round trips between every round.  This kernel runs the SAME
two-level algorithm (identical selection + tie semantics, see
`top_k_vocab`'s docstring for the boundary-tie caveat) in ONE dispatch,
with every round operating on VMEM/registers:

  phase 1 — per-128-lane-chunk maxima (one sweep over the row block),
  phase 2 — top-k chunks per row, k masked-max rounds on one (8,128)
            register tile (ties -> lowest chunk id),
  phase 3 — gather the k winning chunks by a select-accumulate sweep
            (no dynamic indexing; -inf-safe, exact — no one-hot matmul),
  phase 4 — top-k of the k*128 survivors, k masked-max rounds over the
            gathered register tiles (ties -> lowest global index).

Row-block autotune on the v5e (B=64 x beam 8, V=5002, serial scan):
rows=8 -> 0.276 ms/frame, 32 -> 0.096, 64 -> 0.065, **128 -> 0.051**
(3.3x the XLA path's 0.165), 256 -> 0.074, 512 -> 0.080 — per-block
fixed cost dominates small blocks, VMEM pressure degrades huge ones.

Semantics match `rnnt_search.top_k_vocab` exactly (same chunk size, same
tie rules): phase 2's lowest-chunk-id tie-break == `_top_k_iter` argmax
over chunk maxima; phase 4's lowest-global-index tie-break == the
ascending-chunk-id sort + positional argmax there.  `tests/test_topk_
pallas.py` asserts bit-exact equality on adversarial tie patterns.

Reference analog: none — the CUDA stack's beam runs on host
(`wenet/transducer/search/prefix_beam_search.py:516-529`, np.argsort).
This kernel exists purely to price the TPU-native on-device search.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 8


def _select_phases(tile_fn, cm, vals_ref, idx_ref, *, k: int, G: int,
                   rows: int, lane):
    """Phases 2-4 of the exact two-level top-k, shared by every kernel.

    ``tile_fn(g)`` returns the (rows, 128) f32 scored tile for chunk g
    (from the input ref or a VMEM scratch); ``cm`` is the (rows, 128)
    chunk-maxima layout built by the caller's phase 1.
    """
    neg = jnp.float32(-jnp.inf)

    # phase 2: top-k chunk ids per row; ties -> lowest chunk id
    big = jnp.int32(G + _LANES)
    ids = []
    for _ in range(k):
        m = jnp.max(cm, axis=1, keepdims=True)              # (rows, 1)
        sel = jnp.min(jnp.where(cm == m, lane, big), axis=1,
                      keepdims=True)                        # (rows, 1)
        ids.append(sel)
        cm = jnp.where(lane == sel, neg, cm)

    # phase 3: gather the k winning chunks (select-accumulate, re-reading
    # the VMEM tiles; exactly one g matches each (row, slot))
    gath = [jnp.full((rows, _LANES), neg, jnp.float32) for _ in range(k)]
    for g in range(G):
        t = tile_fn(g)
        for s in range(k):
            gath[s] = jnp.where(ids[s] == g, t, gath[s])
    gidx = [ids[s] * _LANES + lane for s in range(k)]       # global vocab ids

    # phase 4: top-k of the k*128 survivors; ties -> lowest global index.
    # Slots are combined ELEMENTWISE first so each round pays exactly two
    # cross-lane reductions (max, min) instead of k+1.
    bigv = jnp.int32(G * _LANES + _LANES)
    out_v = jnp.full((rows, _LANES), neg, jnp.float32)
    out_i = jnp.zeros((rows, _LANES), jnp.int32)
    for j in range(k):
        m = gath[0]
        for s in range(1, k):
            m = jnp.maximum(m, gath[s])
        m = jnp.max(m, axis=1, keepdims=True)               # (rows, 1)
        cand = jnp.where(gath[0] == m, gidx[0], bigv)
        for s in range(1, k):
            cand = jnp.minimum(
                cand, jnp.where(gath[s] == m, gidx[s], bigv))
        sel = jnp.min(cand, axis=1, keepdims=True)          # (rows, 1)
        out_v = jnp.where(lane == j, m, out_v)
        out_i = jnp.where(lane == j, sel, out_i)
        for s in range(k):
            gath[s] = jnp.where(gidx[s] == sel, neg, gath[s])
    vals_ref[:] = out_v
    idx_ref[:] = out_i


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, G: int, rows: int):
    """One (rows, G*128) row block -> top-k vals/idx in the first k lanes."""
    neg = jnp.float32(-jnp.inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)

    def tile(g):
        return x_ref[:, g * _LANES:(g + 1) * _LANES].astype(jnp.float32)

    # phase 1: chunk maxima, laid out one chunk per lane (G <= 128)
    cm = jnp.full((rows, _LANES), neg, jnp.float32)
    for g in range(G):
        m = jnp.max(tile(g), axis=1, keepdims=True)         # (rows, 1)
        cm = jnp.where(lane == g, m, cm)

    _select_phases(tile, cm, vals_ref, idx_ref, k=k, G=G, rows=rows,
                   lane=lane)


@functools.partial(jax.jit, static_argnames=("k", "rows"))
def _topk_rows(x: jax.Array, k: int, rows: int = 128):
    """x (R, Vp) f32 with R % rows == 0, Vp % 128 == 0 -> ((R, k), (R, k))."""
    R, Vp = x.shape
    G = Vp // _LANES
    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, G=G, rows=rows),
        grid=(R // rows,),
        in_specs=[pl.BlockSpec((rows, Vp), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((rows, _LANES), lambda i: (i, 0)),
                   pl.BlockSpec((rows, _LANES), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((R, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((R, _LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )(x)
    return vals[:, :k], idx[:, :k]


def _fused_topk_kernel(logp_ref, ctc_ref, vals_ref, idx_ref, scr_ref, *,
                       k: int, G: int, rows: int, n_rep: int, ltw: float,
                       lcw: float):
    """Like `_topk_kernel`, but the scored array is computed on the fly:

        x = logaddexp(ltw + logp, lcw + ctc[row // n_rep])

    i.e. the beam's CTC shallow fusion (`rnnt_search` step) — the fused
    (R, V) array is never materialized in HBM and the (B, V) -> (B*N, V)
    beam-repeat of the CTC row never happens at all.  Scored tiles are
    written to a VMEM scratch in phase 1 and reread in phase 3 (no
    recompute, no HBM round trip).
    """
    neg = jnp.float32(-jnp.inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    wt = jnp.float32(ltw)
    wc = jnp.float32(lcw)

    def tile(g):
        lp = logp_ref[:, g * _LANES:(g + 1) * _LANES].astype(jnp.float32)
        ct = ctc_ref[:, g * _LANES:(g + 1) * _LANES].astype(jnp.float32)
        if n_rep > 1:
            ct = jnp.repeat(ct, n_rep, axis=0)
        return jnp.logaddexp(wt + lp, wc + ct)

    cm = jnp.full((rows, _LANES), neg, jnp.float32)
    for g in range(G):
        t = tile(g)
        scr_ref[:, g * _LANES:(g + 1) * _LANES] = t
        m = jnp.max(t, axis=1, keepdims=True)
        cm = jnp.where(lane == g, m, cm)

    def scr_tile(g):
        return scr_ref[:, g * _LANES:(g + 1) * _LANES]

    _select_phases(scr_tile, cm, vals_ref, idx_ref, k=k, G=G, rows=rows,
                   lane=lane)


@functools.partial(jax.jit,
                   static_argnames=("k", "n_rep", "ltw", "lcw", "rows"))
def _fused_topk_rows(logp, ctc, k, n_rep, ltw, lcw, rows):
    R, Vp = logp.shape
    G = Vp // _LANES
    crows = rows // n_rep
    vals, idx = pl.pallas_call(
        functools.partial(_fused_topk_kernel, k=k, G=G, rows=rows,
                          n_rep=n_rep, ltw=ltw, lcw=lcw),
        grid=(R // rows,),
        in_specs=[pl.BlockSpec((rows, Vp), lambda i: (i, 0)),
                  pl.BlockSpec((crows, Vp), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((rows, _LANES), lambda i: (i, 0)),
                   pl.BlockSpec((rows, _LANES), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((R, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((R, _LANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((rows, Vp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )(logp, ctc)
    return vals[:, :k], idx[:, :k]


def _lcm(a: int, b: int) -> int:
    import math
    return a * b // math.gcd(a, b)


def _joint_topk_kernel(x_ref, w_ref, b_ref, ctc_ref, vals_ref, idx_ref,
                       scr_ref, *, k: int, G: int, rows: int, n_rep: int,
                       ltw: float, lcw: float):
    """Joint output head + log-softmax + CTC fusion + exact top-k, fused.

    Extends `_fused_topk_kernel` one stage further up the beam step: the
    transducer logits themselves are computed IN-KERNEL on the MXU —

        logits = x @ W + b                       (tile-by-tile, f32 acc)
        logp   = logits - logsumexp(logits)      (streaming m/s pass)
        score  = logaddexp(ltw + logp, lcw + ctc[row // n_rep])

    — so neither the (R, V) logits nor the (R, V) fused score array ever
    exists in HBM (the XLA path writes + rereads both between the joint
    dispatch and the top-k).  logit tiles land in a VMEM scratch during
    the matmul sweep and are rescored in place in phase 1.

    Numerics: f32 accumulation off bf16/f32 inputs and a streaming
    logsumexp — same rounding class as the bf16 fused-chain divergence
    documented in NOTES.md (the selection algorithm and tie rules are
    unchanged and exact).
    """
    neg = jnp.float32(-jnp.inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    wt = jnp.float32(ltw)
    wc = jnp.float32(lcw)
    x = x_ref[:]                                            # (rows, D)

    # matmul sweep: logits tiles -> scratch; streaming logsumexp (m, s)
    m = jnp.full((rows, 1), neg, jnp.float32)
    s = jnp.zeros((rows, 1), jnp.float32)
    for g in range(G):
        wg = w_ref[:, g * _LANES:(g + 1) * _LANES]          # (D, 128)
        lg = jax.lax.dot_general(
            x, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        lg = lg + b_ref[:, g * _LANES:(g + 1) * _LANES].astype(jnp.float32)
        scr_ref[:, g * _LANES:(g + 1) * _LANES] = lg
        tm = jnp.max(lg, axis=1, keepdims=True)
        mn = jnp.maximum(m, tm)
        # mn is finite from tile 0 on (every tile has real lanes: the V
        # padding is < one tile wide), so exp(m - mn) is well-defined
        s = s * jnp.exp(m - mn) + jnp.sum(jnp.exp(lg - mn), axis=1,
                                          keepdims=True)
        m = mn
    lse = m + jnp.log(s)

    # phase 1: rescore tiles in place + chunk maxima
    cm = jnp.full((rows, _LANES), neg, jnp.float32)
    for g in range(G):
        lg = scr_ref[:, g * _LANES:(g + 1) * _LANES]
        ct = ctc_ref[:, g * _LANES:(g + 1) * _LANES].astype(jnp.float32)
        if n_rep > 1:
            ct = jnp.repeat(ct, n_rep, axis=0)
        t = jnp.logaddexp(wt + lg - lse, wc + ct)
        scr_ref[:, g * _LANES:(g + 1) * _LANES] = t
        cm = jnp.where(lane == g, jnp.max(t, axis=1, keepdims=True), cm)

    def scr_tile(g):
        return scr_ref[:, g * _LANES:(g + 1) * _LANES]

    _select_phases(scr_tile, cm, vals_ref, idx_ref, k=k, G=G, rows=rows,
                   lane=lane)


@functools.partial(jax.jit,
                   static_argnames=("k", "n_rep", "ltw", "lcw", "rows",
                                    "w_vmem"))
def _joint_topk_rows(x, w, b, ctc, k, n_rep, ltw, lcw, rows,
                     w_vmem: bool = False):
    R, D = x.shape
    Vp = w.shape[1]
    G = Vp // _LANES
    crows = rows // n_rep
    if w_vmem:
        # pin the frame-invariant joint weights in VMEM: inside the beam
        # scan this kernel runs once per frame, and the per-call HBM DMA
        # of W (6.4 MB bf16 at the flagship joint) dominated its cost —
        # measured 2026-08-20 at the bench point (R=256, V=5002, serial
        # scan): 0.2715 -> 0.1825 ms/frame (1.49x), identical outputs.
        # The constraint op must run under jit (it cannot be eager),
        # which this wrapper guarantees; XLA hoists it out of the scan.
        w = pltpu.with_memory_space_constraint(w, pltpu.VMEM)
        b = pltpu.with_memory_space_constraint(b, pltpu.VMEM)
        w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((D, Vp), lambda i: (0, 0))
        b_spec = pl.BlockSpec((1, Vp), lambda i: (0, 0))
    vals, idx = pl.pallas_call(
        functools.partial(_joint_topk_kernel, k=k, G=G, rows=rows,
                          n_rep=n_rep, ltw=ltw, lcw=lcw),
        grid=(R // rows,),
        in_specs=[pl.BlockSpec((rows, D), lambda i: (i, 0)),
                  w_spec,
                  b_spec,
                  pl.BlockSpec((crows, Vp), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((rows, _LANES), lambda i: (i, 0)),
                   pl.BlockSpec((rows, _LANES), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((R, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((R, _LANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((rows, Vp), jnp.float32)],
        # the per-block working set (full W + the logits scratch +
        # pipelining buffers) exceeds Mosaic's default 16 MB scoped-vmem
        # budget at rows=256; the v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, w, b, ctc)
    return vals[:, :k], idx[:, :k]


def topk_w_vmem_enabled() -> bool:
    """Resolved decision: pin the joint W/b in VMEM for this call?

    Default on (for TPU) — the pin is a measured 1.49x on the beam step
    — but `PAFC_TOPK_VMEM=0` disables it without losing the fused
    kernel, in case a wider joint (or a future co-resident pinned
    buffer) crosses the per-program pinned-bytes crash envelope mapped
    in NOTES.md round-4.
    """
    return (os.environ.get("PAFC_TOPK_VMEM", "1") != "0"
            and jax.default_backend() == "tpu")


def joint_top_k_vocab_pallas(x: jax.Array, w: jax.Array, b: jax.Array,
                             ctc: jax.Array, k: int, log_tw: float,
                             log_cw: float, rows: int = 128):
    """Fused joint head + CTC shallow fusion + exact top-k (one dispatch).

    ``x`` is the pre-ffn_out joint activation (B*N, D) — tanh(enc_p +
    pred_p) in the standard transducer joint (`models/joint.py
    joint_projected`, the non-HAT branch); ``w``/``b`` are ffn_out's
    (D, V) kernel and (V,) bias; ``ctc`` is (B, V) log-probs.  Returns
    ((B, N, k) vals, idx) with `top_k_vocab` selection semantics over

        logaddexp(log_tw + log_softmax(x @ w + b), log_cw + ctc_rep).

    Falls back to the unfused XLA ops outside the kernel envelope.
    """
    R, D = x.shape
    V = w.shape[1]
    B = ctc.shape[0]
    Vp = -(-V // _LANES) * _LANES
    # callers may pre-pad ctc to the lane multiple ONCE outside their
    # frame scan (rnnt_search does) instead of paying a pad copy per
    # frame; pad columns are -inf so they are inert either way
    assert ctc.shape[1] in (V, Vp), (ctc.shape, V, Vp)
    n_rep = R // B
    assert B * n_rep == R, (R, B)
    base = _lcm(_ROWS, n_rep)
    # largest multiple of base that divides R (<= rows): batch sizes whose
    # R isn't a multiple of the preferred block (e.g. B=48 beam 8 ->
    # R=384 vs 256) shrink the block instead of silently falling back to
    # the fully unfused XLA path
    rows_eff = max(base, base * (min(rows, R) // base))
    while rows_eff > base and R % rows_eff:
        rows_eff -= base
    if (not supported((R, V), k) or D % _LANES or R % rows_eff
            or x.dtype != w.dtype):  # in-kernel dot needs one dtype
        from paper_accurate_fast_cheap_tpu.decode.rnnt_search import (
            top_k_vocab)
        logits = (x.astype(jnp.float32) @ w.astype(jnp.float32)
                  + b.astype(jnp.float32))
        logp = jax.nn.log_softmax(logits, axis=-1)
        fused = jnp.logaddexp(
            jnp.float32(log_tw) + logp,
            jnp.float32(log_cw)
            + jnp.repeat(ctc[:, :V].astype(jnp.float32), n_rep, axis=0))
        vals, idx = top_k_vocab(fused.reshape(B, n_rep, V), k)
        return vals, idx
    wp, bp, ct = w, b.reshape(1, V), ctc
    if Vp != V:
        # pad columns: w 0 / b -inf -> pad logits are -inf (drop out of
        # both the logsumexp and the top-k); ctc -inf keeps the fused
        # score -inf there
        wp = jnp.pad(wp, ((0, 0), (0, Vp - V)))
        bp = jnp.pad(bp.astype(jnp.float32), ((0, 0), (0, Vp - V)),
                     constant_values=-jnp.inf)
        if ct.shape[1] != Vp:
            ct = jnp.pad(ct.astype(jnp.float32), ((0, 0), (0, Vp - V)),
                         constant_values=-jnp.inf)
    vals, idx = _joint_topk_rows(x, wp, bp, ct, k, n_rep, float(log_tw),
                                 float(log_cw), rows_eff,
                                 w_vmem=topk_w_vmem_enabled())
    return vals.reshape(B, n_rep, k), idx.reshape(B, n_rep, k)


def fused_top_k_vocab_pallas(logp: jax.Array, ctc: jax.Array, k: int,
                             log_tw: float, log_cw: float,
                             rows: int = 128):
    """CTC-fused exact top-k: top_k_vocab(logaddexp(ltw+logp, lcw+ctc')).

    ``logp`` is (B*N, V) (one row per beam), ``ctc`` is (B, V) (one row
    per utterance, repeated across the beam inside the kernel).  Returns
    ((B, N, k) vals, idx) like `top_k_vocab` on the reshaped fused
    array.  Falls back to the unfused XLA ops outside the envelope or
    with non-finite weights handled upstream.
    """
    R, V = logp.shape
    B = ctc.shape[0]
    n_rep = R // B
    assert B * n_rep == R, (R, B)
    # block rows must hold whole beams AND whole (8-sublane) tiles
    base = _lcm(_ROWS, n_rep)
    rows_eff = max(base, base * (min(rows, R) // base))
    if not supported((R, V), k):
        from paper_accurate_fast_cheap_tpu.decode.rnnt_search import (
            top_k_vocab)
        fused = jnp.logaddexp(
            jnp.float32(log_tw) + logp.astype(jnp.float32),
            jnp.float32(log_cw)
            + jnp.repeat(ctc.astype(jnp.float32), n_rep, axis=0))
        vals, idx = top_k_vocab(fused.reshape(B, n_rep, V), k)
        return vals, idx
    Vp = -(-V // _LANES) * _LANES
    lp, ct = logp.astype(jnp.float32), ctc.astype(jnp.float32)
    if Vp != V:
        lp = jnp.pad(lp, ((0, 0), (0, Vp - V)), constant_values=-jnp.inf)
        ct = jnp.pad(ct, ((0, 0), (0, Vp - V)), constant_values=-jnp.inf)
    Rp = -(-R // rows_eff) * rows_eff
    if Rp != R:
        lp = jnp.pad(lp, ((0, Rp - R), (0, 0)), constant_values=-jnp.inf)
        ct = jnp.pad(ct, ((0, (Rp - R) // n_rep), (0, 0)),
                     constant_values=-jnp.inf)
    vals, idx = _fused_topk_rows(lp, ct, k, n_rep, float(log_tw),
                                 float(log_cw), rows_eff)
    if Rp != R:
        vals, idx = vals[:R], idx[:R]
    return vals.reshape(B, n_rep, k), idx.reshape(B, n_rep, k)


def supported(x_shape, k: int, chunk: int = _LANES) -> bool:
    """Same gate as `top_k_vocab`'s two-level path (plus k <= lanes).

    G <= _LANES is load-bearing: every kernel stores the per-chunk maxima
    one-per-lane via `lane == g`, so a vocab wider than 128 chunks
    (V > 16384) would silently drop chunks >= 128 — route those to the
    exact XLA `top_k_vocab` instead.
    """
    V = x_shape[-1]
    G = (V + chunk - 1) // chunk
    return V > 8 * chunk and k < G and 0 < k <= _LANES and G <= _LANES


def top_k_vocab_pallas(x: jax.Array, k: int, rows: int = 128):
    """Drop-in for `rnnt_search.top_k_vocab` on TPU (exact, one dispatch).

    Accepts any (..., V) float input; computes in fp32.  Rows are
    flattened and padded to a multiple of 8, V is padded to a multiple
    of 128 with -inf (pad elements can never win).  Falls back to the
    XLA `top_k_vocab` when the shape is outside the kernel's envelope.
    """
    from paper_accurate_fast_cheap_tpu.decode.rnnt_search import top_k_vocab
    if not supported(x.shape, k):
        return top_k_vocab(x, k)
    lead = x.shape[:-1]
    V = x.shape[-1]
    R = int(np.prod(lead)) if lead else 1
    rows = min(rows, -(-R // _ROWS) * _ROWS)
    xr = x.reshape(R, V).astype(jnp.float32)
    Rp = -(-R // rows) * rows
    Vp = -(-V // _LANES) * _LANES
    if Rp != R or Vp != V:
        xr = jnp.pad(xr, ((0, Rp - R), (0, Vp - V)),
                     constant_values=-jnp.inf)
    vals, idx = _topk_rows(xr, k, rows)
    if Rp != R:
        vals, idx = vals[:R], idx[:R]
    return vals.reshape(lead + (k,)), idx.reshape(lead + (k,))
