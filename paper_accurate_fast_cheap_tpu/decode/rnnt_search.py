"""Transducer decoding: greedy + prefix beam search with CTC fusion.

Parity targets: `wenet/transducer/search/greedy_search.py:6-54`
(basic_greedy_search, frame-synchronous) and
`wenet/transducer/search/prefix_beam_search.py:70-177,428-574`
(`rnnt_beam_search`, the paper's SF decode mode): per frame, per beam —
predictor step on the last token, joint with enc[t], shallow fusion
``log(tw * exp(trans) + cw * exp(ctc[t]))``, top-k expansion (blank keeps
the hypothesis and predictor state, a token extends both), log-add merge of
identical hypotheses, prune to beam.  One emission max per frame.

TPU-first: greedy is a single jitted `lax.scan` over frames (whole batch at
once).  The beam search batches (utterance x beam) through one jitted step
function; only the O(beam) bookkeeping runs on host.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.decode.search import DecodeResult


_STEP_FNS_CACHE: dict = {}


def make_transducer_step_fns(model, params):
    """Build (predictor_step, joint_step, init_state_fn) for the searches.

    The step fns take ``params`` as their FIRST (traced) argument and the
    searches here are called with ``params=params`` so the weights ride as
    program *inputs*.  Closing over a flax param dict instead serializes
    every weight into the lowered HLO as dense literals — a ~400 MB
    program for the flagship at long-form shapes, which breaks remote
    compilation outright (and bloats compile time everywhere else).
    """
    key = (id(model), id(params))
    hit = _STEP_FNS_CACHE.get(key)
    if hit is not None:
        return hit[0]
    predictor_step = jax.jit(lambda p, tok, st: model.apply(
        p, tok, st, method=model.predictor_step))
    _joint_jit = jax.jit(lambda p, e, pr: model.apply(
        p, e, pr, method=model.joint_step))

    def joint_step(p, e, pr):
        return _joint_jit(p, e, pr)

    # Standard (non-HAT) joint: expose the split form the device beam's
    # joint-fused pallas path needs — a batched enc projection (hoisted
    # out of the frame scan) + the pre-vocab-head activation; the vocab
    # head itself runs inside the top-k kernel (ops/topk_pallas.py).
    # Attributes on the plain-function wrapper keep the public 3-tuple
    # signature unchanged for every existing caller.
    try:
        has_ffn_out = "ffn_out" in params["params"]["joint"]
    except (KeyError, TypeError):
        has_ffn_out = False
    if has_ffn_out and hasattr(model, "joint_preact"):
        joint_step.preact = jax.jit(lambda p, ep, pr: model.apply(
            p, ep, pr, method=model.joint_preact))
        joint_step.enc_proj = jax.jit(lambda p, e: model.apply(
            p, e, method=model.joint_enc_proj))

    # Fused single-dispatch predictor step for the standard RNN
    # predictor (embed gather in XLA + `ops/lstm_pallas.py` stacked-LSTM
    # kernel with VMEM-pinned weights).  Exposed as an attribute like
    # `joint_step.preact`; the device beam uses it per frame on TPU —
    # the XLA step re-reads ~14 MB of predictor weights from HBM every
    # frame (0.126 ms/frame at B=32, `bin/scan_op_bench.py`).
    try:
        _pp = params["params"]["predictor"]
        _is_rnn = all(k in _pp for k in ("embed", "lstm_0", "projection"))
    except (KeyError, TypeError):
        _is_rnn = False
    if _is_rnn:
        from paper_accurate_fast_cheap_tpu.ops import lstm_pallas

        _nl = sum(1 for k in _pp if k.startswith("lstm_"))
        _E = _pp["embed"]["embedding"].shape[1]
        _H = _pp["lstm_0"]["hh"].shape[0]
        _O = _pp["projection"]["kernel"].shape[1]

        def _fused_pred(p, tok, st):
            pred = p["params"]["predictor"]
            hs, cs = st
            if not lstm_pallas.supported(
                    _E, _H, _O, tok.shape[0],
                    pred["embed"]["embedding"].dtype):
                return model.apply(p, tok, st,
                                   method=model.predictor_step)
            x = jnp.take(pred["embed"]["embedding"], tok, axis=0)
            layers = tuple(
                (pred[f"lstm_{i}"]["ih"]["kernel"],
                 pred[f"lstm_{i}"]["ih"]["bias"],
                 pred[f"lstm_{i}"]["hh"]) for i in range(_nl))
            out, nhs, ncs = lstm_pallas.lstm_predictor_step(
                x, hs, cs, layers, pred["projection"]["kernel"],
                pred["projection"]["bias"])
            return out, (nhs, ncs)

        predictor_step.fused = jax.jit(_fused_pred)
    init_state_fn = functools.partial(model.apply, params,
                                      method=model.predictor_init_state)
    fns = (predictor_step, joint_step, init_state_fn)
    # keep (model, params) alive so the id-key stays valid; per-batch
    # callers (bin/recognize.decode_batch) rely on stable fn identities
    # for the device-beam program cache.  The fns themselves close over
    # model+params, so each entry pins a full weight tree — cap at 2
    # (one live model + one being swapped in); processes that cycle many
    # models should call `clear_decode_caches()` between loads
    _STEP_FNS_CACHE[key] = (fns, model, params)
    if len(_STEP_FNS_CACHE) > 2:
        _STEP_FNS_CACHE.pop(next(iter(_STEP_FNS_CACHE)))
    return fns


def clear_decode_caches() -> None:
    """Drop every cached decode program and step-fn closure.

    The step-fn and device-beam caches pin the (model, params) trees they
    were built from (needed so their id()-based keys stay valid); a
    process cycling several large models can call this after releasing a
    model to reclaim its host+device memory."""
    _STEP_FNS_CACHE.clear()
    _DEVICE_BEAM_CACHE.clear()


def _bind_steps(predictor_step, joint_step, params):
    """Normalize legacy (params-closed) step fns to the (params, ...) form."""
    if params is None:
        return (lambda _p, tok, st: predictor_step(tok, st),
                lambda _p, e, pr: joint_step(e, pr))
    return predictor_step, joint_step


def basic_greedy_search(
    predictor_step: Callable,   # (tokens (B,), state) -> (out (B, D), state)
    joint_step: Callable,       # (enc_t (B, De), pred (B, Dp)) -> logp (B, V)
    init_state,
    enc_out: jax.Array,         # (B, T, De)
    enc_lens: jax.Array,
    blank_id: int = 0,
    n_steps: int = 1,
    params: Any = None,
) -> List[DecodeResult]:
    """Frame-sync greedy, up to ``n_steps`` symbols per frame (the
    reference's `basic_greedy_search` n_steps arg), fully jitted scan.
    The inner emission loop is unrolled n_steps times per frame.

    With ``params`` given, the step fns take params first (see
    `make_transducer_step_fns`) and the weights stay program inputs."""
    if n_steps > 1:
        return _greedy_multi(predictor_step, joint_step, init_state,
                             enc_out, enc_lens, blank_id, n_steps, params)
    predictor_step, joint_step = _bind_steps(predictor_step, joint_step,
                                             params)
    B, T, _ = enc_out.shape

    def select(emitted, new, old):
        """Per-batch-element select; predictor state convention: leaves are
        (B, ...) for ndim <= 2 or (L, B, ...) for ndim >= 3."""
        if new.ndim >= 3:
            e = emitted.reshape((1, -1) + (1,) * (new.ndim - 2))
        elif new.ndim == 2:
            e = emitted[:, None]
        else:
            e = emitted
        return jnp.where(e, new, old)

    def step(prms, carry, enc_t):
        tokens, state, pred_out = carry
        logp = joint_step(prms, enc_t, pred_out)
        best = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        emitted = best != blank_id
        new_tokens = jnp.where(emitted, best, tokens)
        # advance predictor only where a symbol was emitted
        cand_out, cand_state = predictor_step(prms, new_tokens, state)
        pred_out2 = jnp.where(emitted[:, None], cand_out, pred_out)
        state2 = jax.tree.map(
            lambda new, old: select(emitted, new, old), cand_state, state,
        )
        return (new_tokens, state2, pred_out2), best

    tokens0 = jnp.full((B,), blank_id, jnp.int32)
    pred0, state0 = predictor_step(params, tokens0, init_state)
    run = jax.jit(lambda prms, c, x: jax.lax.scan(
        lambda cc, xx: step(prms, cc, xx), c, x))
    (_, _, _), emits = run(
        params, (tokens0, init_state, pred0), jnp.moveaxis(enc_out, 1, 0)
    )
    emits = np.asarray(jnp.moveaxis(emits, 0, 1))  # (B, T)
    lens = np.asarray(enc_lens)
    results = []
    for b in range(B):
        toks = [int(x) for x in emits[b, : lens[b]] if x != blank_id]
        results.append(DecodeResult(tokens=toks))
    return results


def _greedy_multi(predictor_step, joint_step, init_state, enc_out,
                  enc_lens, blank_id, n_steps, params=None):
    """Greedy with up to n_steps emissions per frame (unrolled inner loop)."""
    predictor_step, joint_step = _bind_steps(predictor_step, joint_step,
                                             params)
    B, T, _ = enc_out.shape

    def select(emitted, new, old):
        if new.ndim >= 3:
            e = emitted.reshape((1, -1) + (1,) * (new.ndim - 2))
        elif new.ndim == 2:
            e = emitted[:, None]
        else:
            e = emitted
        return jnp.where(e, new, old)

    def step(prms, carry, enc_t):
        tokens, state, pred_out = carry
        emits = []
        active = jnp.ones((B,), bool)  # emitting stops at first blank
        for _ in range(n_steps):
            logp = joint_step(prms, enc_t, pred_out)
            best = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            emitted = (best != blank_id) & active
            active = emitted
            out_tok = jnp.where(emitted, best, blank_id)
            new_tokens = jnp.where(emitted, best, tokens)
            cand_out, cand_state = predictor_step(prms, new_tokens, state)
            pred_out = jnp.where(emitted[:, None], cand_out, pred_out)
            state = jax.tree.map(
                lambda new, old: select(emitted, new, old), cand_state,
                state,
            )
            tokens = new_tokens
            emits.append(out_tok)
        return (tokens, state, pred_out), jnp.stack(emits, axis=-1)

    tokens0 = jnp.full((B,), blank_id, jnp.int32)
    pred0, _ = predictor_step(params, tokens0, init_state)
    run = jax.jit(lambda prms, c, x: jax.lax.scan(
        lambda cc, xx: step(prms, cc, xx), c, x))
    _, emits = run(
        params, (tokens0, init_state, pred0), jnp.moveaxis(enc_out, 1, 0)
    )
    emits = np.asarray(jnp.moveaxis(emits, 0, 1))  # (B, T, n_steps)
    lens = np.asarray(enc_lens)
    results = []
    for b in range(B):
        toks = []
        for t in range(lens[b]):
            for s in range(n_steps):
                x = int(emits[b, t, s])
                if x == blank_id:
                    break
                toks.append(x)
        results.append(DecodeResult(tokens=toks))
    return results


def rnnt_beam_search(
    predictor_step: Callable,
    joint_step: Callable,
    init_state_fn: Callable,    # (n) -> predictor state pytree
    enc_out: jax.Array,         # (B, T, De)
    enc_lens: jax.Array,
    ctc_probs: jax.Array,       # (B, T, V) log-probs for fusion
    beam_size: int = 8,
    blank_id: int = 0,
    ctc_weight: float = 0.3,
    transducer_weight: float = 0.7,
    impl: str = "device",
    params: Any = None,
    defer: bool = False,
    unroll: int = 1,
    merge: str = "pairwise",
    topk_impl: str = "auto",
    align_pack: int = 0,
):
    """Batched prefix beam search with CTC shallow fusion.

    ``impl='device'`` (default) runs the whole search as one jitted
    `lax.scan` over frames — fixed beam, hash-keyed prefix merge — host
    touches only the final token arrays.  ``impl='host'`` is the reference
    -faithful per-frame host loop kept as the parity oracle.  Both reproduce
    `prefix_beam_search.py:428-574` exactly: candidates are walked in
    descending score order, duplicate prefixes log-add into the earlier
    occurrence, and the walk stops once `beam_size` distinct prefixes exist
    (later duplicates are dropped, not merged).

    With ``params`` given, the step fns must take params as their first
    argument (`make_transducer_step_fns`) and the weights are threaded
    through the scan as program inputs instead of baked HLO literals.

    ``align_pack=Lmax`` (device impl, ``defer=True`` only) folds the
    top-hypothesis CTC Viterbi alignment (`force_align_device_tokens`,
    first Lmax tokens) INTO the beam's own jitted program and returns
    one packed int32 buffer (`finalize_device_beam_aligned`) instead of
    the carry dict: long-form decode (`bin/recognize_wav --fuse split`)
    then costs one dispatch + one fetch for beam+align+lens combined,
    while the beam still runs as its own program (VMEM-pinned kernels
    stay inside their crash envelope, NOTES.md round-4).
    """
    if impl == "device":
        return _rnnt_beam_search_device(
            predictor_step, joint_step, init_state_fn, enc_out, enc_lens,
            ctc_probs, beam_size, blank_id, ctc_weight, transducer_weight,
            params, defer, unroll, merge, topk_impl, align_pack,
        )
    return _rnnt_beam_search_host(
        predictor_step, joint_step, init_state_fn, enc_out, enc_lens,
        ctc_probs, beam_size, blank_id, ctc_weight, transducer_weight,
        params,
    )


_DEVICE_BEAM_CACHE: dict = {}


def _under_trace() -> bool:
    """True when called inside an active jax trace (jit/vmap/grad).

    Prefers the explicit `jax.core.trace_state_clean()` API; the
    fallback probes whether a fresh constant op stages as a tracer,
    which relies on jax staging constants under the dynamic trace —
    kept only for jax versions without the API.
    """
    clean = getattr(jax.core, "trace_state_clean", None)
    if clean is None:  # jax 0.9 exposes it only under _src
        try:
            from jax._src.core import trace_state_clean as clean
        except ImportError:
            clean = None
    if clean is not None:
        return not clean()
    return isinstance(jnp.zeros(()) + 0, jax.core.Tracer)


def _top_k_iter(x: jax.Array, k: int):
    """Exact top-k over the last axis via k rounds of masked argmax.

    Fast for small/medium last axes; tie order matches the reference's
    stable `np.argsort(-lp)[:N]` (argmax returns the lowest index).  For
    the vocab-sized axis use `top_k_vocab` below.
    """
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        v = jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        x = jnp.where(
            jax.nn.one_hot(i, x.shape[-1], dtype=bool), -jnp.inf, x)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def top_k_vocab(x: jax.Array, k: int, chunk: int = 128):
    """Exact top-k over a large last axis (the vocab), TPU-shaped.

    On this TPU, XLA lowers `lax.top_k` over (64,8,5002) inside the beam
    scan to a full sort (~2.6 ms/frame, 60x the joint matmul) and k
    rounds of masked argmax cost ~5.9 ms/frame; this two-level scheme
    runs at 0.27 ms/frame:

      1. per-128-lane-chunk max (one VPU reduction pass),
      2. top-k CHUNKS by max (tiny, k rounds over ~V/128 values),
      3. gather those k chunks and top-k the k*128 survivors.

    Exactness: every global top-k element is the max of no chunk that
    ranks below the k-th chunk — if its chunk were outside the top-k
    chunks, k other chunk maxima (k distinct elements) would strictly
    exceed it, contradicting membership in the top-k.  Chunk ids are
    sorted ascending before the gather so that among exactly-equal
    values the lowest global index wins, matching the reference's stable
    `np.argsort(-lp)[:N]` (`prefix_beam_search.py:516-529`).  The one
    divergence: if the k-th and (k+1)-th values are exactly equal floats
    in different chunks AND their chunk maxima tie at the selection
    boundary, the kept index set may differ from the reference's — the
    kept *values* are still identical (continuous log-probs never tie in
    practice; all--inf dead-beam rows return -inf everywhere either way).
    """
    V = x.shape[-1]
    G = (V + chunk - 1) // chunk
    # k >= G would make _top_k_iter over the G chunk-maxima return
    # duplicate chunk ids once every chunk is masked (argmax of all -inf
    # is 0), and the duplicated chunk's elements could then win top-k
    # twice; the direct path is exact (and no slower: k*chunk >= V)
    if V <= 8 * chunk or k >= G:
        return _top_k_iter(x, k)
    pad = G * chunk - V
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=-jnp.inf)
    xc = x.reshape(x.shape[:-1] + (G, chunk))
    cmax = xc.max(axis=-1)
    _, gidx = _top_k_iter(cmax, k)               # (..., k) chunk ids
    gidx = jnp.sort(gidx, axis=-1)               # ascending => stable ties
    sel = jnp.take_along_axis(xc, gidx[..., None], axis=-2)
    sel = sel.reshape(x.shape[:-1] + (k * chunk,))
    vals, loc = _top_k_iter(sel, k)
    chunk_of = jnp.take_along_axis(gidx, loc // chunk, axis=-1)
    idx = chunk_of * chunk + (loc % chunk)
    return vals, idx.astype(jnp.int32)


def _select_rows(mask_bn: jax.Array, new, old):
    """Per-(flat beam) select honoring the predictor state convention:
    leaves (n, ...) for ndim <= 2, (L, n, ...) for ndim >= 3."""
    if new.ndim >= 3:
        m = mask_bn.reshape((1, -1) + (1,) * (new.ndim - 2))
    elif new.ndim == 2:
        m = mask_bn[:, None]
    else:
        m = mask_bn
    return jnp.where(m, new, old)


def _gather_state(state, sel):
    """Gather predictor-state beams by flat index (same convention)."""
    return jax.tree.map(
        lambda s: jnp.take(s, sel, axis=1) if s.ndim >= 3
        else (jnp.take(s, sel, axis=0) if s.ndim >= 1 else s),
        state,
    )


def _rnnt_beam_search_device(
    predictor_step, joint_step, init_state_fn, enc_out, enc_lens,
    ctc_probs, beam_size, blank_id, ctc_weight, transducer_weight,
    params=None, defer=False, unroll=1, merge="pairwise",
    topk_impl="auto", align_pack=0,
):
    """Fully on-device prefix beam search (one jitted scan over frames).

    Prefix identity is tracked with two incremental 32-bit polynomial
    hashes + prefix length (collision odds over <=N^2 candidates/frame are
    negligible), so the duplicate-merge needs only an (N^2 x N^2) scalar
    equality matrix per utterance instead of token-array compares.

    ``topk_impl``: on TPU 'auto' prefers 'pallas_joint' (joint head +
    log-softmax + CTC fusion + top-k in ONE Pallas dispatch,
    `ops/topk_pallas.joint_top_k_vocab_pallas`) when the split joint fns
    are available, else 'pallas' ;  elsewhere 'xla'.  Numerics:
    'pallas' and 'xla' are bit-exact drop-ins for each other;
    'pallas_joint' computes the logits in-kernel (f32 MXU accumulation +
    streaming logsumexp) so its scores can differ from the XLA path by
    float rounding — selection/tie semantics are unchanged, and
    hypotheses matched exactly in every on-chip A/B (NOTES.md).  Force
    'pallas' for bit-exactness vs 'xla'.
    """
    enc_out = jnp.asarray(enc_out)
    ctc_probs = jnp.asarray(ctc_probs)
    B, T, _ = enc_out.shape
    N = beam_size
    NK = N * N
    L = T  # <=1 emission per frame
    NEG = jnp.float32(-jnp.inf)
    P1 = jnp.uint32(2654435761)
    P2 = jnp.uint32(2246822519)
    log_tw = (float(np.log(transducer_weight))
              if transducer_weight > 0 else -np.inf)
    log_cw = float(np.log(ctc_weight)) if ctc_weight > 0 else -np.inf
    lens_dev = jnp.asarray(enc_lens, jnp.int32)
    # cache identity must come from the CALLER's fns: _bind_steps makes
    # fresh wrappers per call in the legacy (params-closed) form
    orig_steps = (predictor_step, joint_step)
    predictor_step, joint_step = _bind_steps(predictor_step, joint_step,
                                             params)
    # joint-fused requires the split joint fns (make_transducer_step_fns
    # attributes, non-HAT joint) and params riding as program inputs
    preact_fn = getattr(orig_steps[1], "preact", None)
    can_jf = preact_fn is not None and params is not None
    # fused pallas predictor step (VMEM-pinned LSTM weights): same
    # gating idea — only on TPU, only with params as program inputs.
    # NOT under an outer trace: inside a caller's enclosing jit (the
    # fused recognize_wav/bench chain) the pinned-weight program killed
    # the TPU worker at runtime (2026-08-20; the beam's own jit runs it
    # fine — crash log in NOTES.md round-4 section).
    _fp = getattr(orig_steps[0], "fused", None)
    _outer_trace = _under_trace()
    _pf = os.environ.get("PAFC_PRED_FUSED", "1")  # 0 | 1 | force
    pred_fused = (_fp is not None and params is not None and _pf != "0"
                  and (not _outer_trace or _pf == "force")
                  and jax.default_backend() == "tpu")
    if pred_fused:
        predictor_step = _fp
    if topk_impl == "auto":
        topk_impl = ("pallas_joint" if can_jf else "pallas"
                     ) if jax.default_backend() == "tpu" else "xla"
    if topk_impl == "pallas_joint" and not can_jf:
        topk_impl = "pallas"
    if topk_impl == "pallas_joint":
        from paper_accurate_fast_cheap_tpu.ops.topk_pallas import (
            joint_top_k_vocab_pallas)
        topk_fn = None
        fused_top_k_vocab_pallas = None
        # hoist the joint's enc projection out of the frame scan: ONE
        # batched (B, T, De) @ (De, J) MXU matmul instead of T small ones
        enc_out = orig_steps[1].enc_proj(params, enc_out)
        # pre-pad the CTC posteriors to the kernel's lane multiple ONCE
        # (-inf pad columns are inert) — otherwise the kernel wrapper
        # pays a (B, V) pad copy every frame inside the scan
        _V = ctc_probs.shape[-1]
        _Vp = -(-_V // 128) * 128
        if _Vp != _V:
            # keep the input dtype (bf16 halves the per-frame read)
            ctc_probs = jnp.pad(
                ctc_probs, ((0, 0), (0, 0), (0, _Vp - _V)),
                constant_values=-jnp.inf)
    elif topk_impl == "pallas":
        from paper_accurate_fast_cheap_tpu.ops.topk_pallas import (
            fused_top_k_vocab_pallas)
        topk_fn = None  # the fused kernel scores + selects in one pass
    else:
        topk_fn = top_k_vocab

    state_init = init_state_fn(B * N)
    tok0 = jnp.full((B * N,), blank_id, jnp.int32)
    # carry holds the state AFTER consuming each beam's last token (here the
    # leading blank), so emissions step the predictor from the right state
    pred0, state0 = predictor_step(params, tok0, state_init)

    carry0 = dict(
        hyps=jnp.zeros((B, N, L), jnp.int32),
        hyp_len=jnp.zeros((B, N), jnp.int32),
        scores=jnp.full((B, N), -jnp.inf).at[:, 0].set(0.0),
        h1=jnp.zeros((B, N), jnp.uint32),
        h2=jnp.zeros((B, N), jnp.uint32),
        last=jnp.full((B, N), blank_id, jnp.int32),
        pred_out=pred0,
        state=state0,
    )

    jidx = jnp.arange(NK)

    def step(prms, lens_dev, carry, xs):
        enc_t, ctc_t, t = xs          # (B, De), (B, V), scalar
        active = t < lens_dev          # (B,)

        enc_rep = jnp.repeat(enc_t, N, axis=0)          # (B*N, De|J)
        if topk_impl == "pallas_joint":
            # joint head + log-softmax + CTC fusion + top-k in ONE
            # kernel — neither the (B*N, V) logits nor the fused score
            # array ever exists in HBM (ops/topk_pallas.py)
            x_act = preact_fn(prms, enc_rep, carry["pred_out"])
            ffo = prms["params"]["joint"]["ffn_out"]
            vals, toks = joint_top_k_vocab_pallas(
                x_act, ffo["kernel"], ffo["bias"], ctc_t, N,
                log_tw, log_cw)                         # (B, N, N)
        elif topk_fn is None:
            logp = joint_step(prms, enc_rep, carry["pred_out"])
            # pallas: CTC fusion + exact top-k in ONE kernel — the fused
            # (B*N, V) array never touches HBM (ops/topk_pallas.py)
            vals, toks = fused_top_k_vocab_pallas(
                logp, ctc_t, N, log_tw, log_cw)         # (B, N, N)
        else:
            logp = joint_step(prms, enc_rep, carry["pred_out"])
            fused = jnp.logaddexp(
                log_tw + logp, log_cw + jnp.repeat(ctc_t, N, axis=0)
            ).reshape(B, N, -1)
            vals, toks = topk_fn(fused, N)              # (B, N, N)
        c_score = (carry["scores"][:, :, None] + vals).reshape(B, NK)
        # candidate j = (beam j//N, expansion j%N): the source index is a
        # STATIC broadcast pattern, so "gathers" by it are broadcasts —
        # no take_along_axis (the bookkeeping soup was 0.104 ms/frame of
        # the step before this restructure; bin/scan_op_bench.py)
        c_src = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, N)
        ).reshape(NK)
        c_src = jnp.broadcast_to(c_src, (B, NK))
        c_tok = toks.reshape(B, NK).astype(jnp.int32)
        c_adv = c_tok != blank_id
        tk = (c_tok + 1).astype(jnp.uint32)

        def rep_beam(a):
            return jnp.broadcast_to(a[:, :, None], (B, N, N)).reshape(B, NK)

        src_h1 = rep_beam(carry["h1"])
        src_h2 = rep_beam(carry["h2"])
        src_len = rep_beam(carry["hyp_len"])
        c_h1 = jnp.where(c_adv, src_h1 * P1 + tk, src_h1)
        c_h2 = jnp.where(c_adv, src_h2 * P2 + tk * P1, src_h2)
        c_len = src_len + c_adv.astype(jnp.int32)

        if merge == "pairwise":
            # sort-free walk: the walk order (score desc, candidate index
            # asc — exactly stable argsort of -score) is a strict total
            # order, so everything the sorted walk derives reduces to
            # pairwise comparisons over the (NK x NK) candidate matrix.
            # XLA fuses these into a few VPU passes; the sorted variant
            # pays a stable sort + 7 sorted gathers per frame.  The one
            # theoretical divergence vs 'sort': when two DISTINCT
            # prefixes tie on exact merged float score, the final top_k
            # breaks ties by candidate index here vs walk position there
            # (same caveat class as `top_k_vocab` chunk-boundary ties).
            eq = (
                (c_h1[:, :, None] == c_h1[:, None, :])
                & (c_h2[:, :, None] == c_h2[:, None, :])
                & (c_len[:, :, None] == c_len[:, None, :])
            )                                           # (B, NK, NK)
            # before[b, j, i]: candidate j precedes i in the walk
            sc_j, sc_i = c_score[:, :, None], c_score[:, None, :]
            before = (sc_j > sc_i) | (
                (sc_j == sc_i) & (jidx[:, None] < jidx[None, :])[None]
            )
            is_first = ~jnp.any(eq & before, axis=1)    # (B, NK)
            firsts_before = jnp.sum(
                (is_first[:, :, None] & before).astype(jnp.int32), axis=1)
            # the walk stops once N distinct prefixes exist: a candidate
            # is inside the walk window iff fewer than N firsts precede it
            in_win = firsts_before < N                  # (B, NK)
            contrib = jnp.where(
                eq & in_win[:, None, :], c_score[:, None, :], NEG
            )
            merged = jax.nn.logsumexp(contrib, axis=-1)
            final = jnp.where(is_first & in_win, merged, NEG)

            top_scores, top_pos = jax.lax.top_k(final, N)   # (B, N)
            ok = top_scores > NEG
            # n_src/n_adv are derivable from top_pos/n_tok (c_src is the
            # static j//N pattern); the three data gathers ride ONE
            # packed take_along_axis instead of five
            n_src = top_pos // N
            packed = jnp.stack([
                c_tok,
                jax.lax.bitcast_convert_type(c_h1, jnp.int32),
                jax.lax.bitcast_convert_type(c_h2, jnp.int32),
                c_len,
            ], axis=-1)                                  # (B, NK, 4)
            sel4 = jnp.take_along_axis(packed, top_pos[:, :, None], axis=1)
            n_tok = sel4[..., 0]
            n_h1 = jax.lax.bitcast_convert_type(sel4[..., 1], jnp.uint32)
            n_h2 = jax.lax.bitcast_convert_type(sel4[..., 2], jnp.uint32)
            n_len = sel4[..., 3]
            n_adv = (n_tok != blank_id) & ok
        else:
            # walk candidates in descending score order
            order = jnp.argsort(-c_score, axis=-1, stable=True)
            s_score = jnp.take_along_axis(c_score, order, axis=1)
            s_src = jnp.take_along_axis(c_src, order, axis=1)
            s_tok = jnp.take_along_axis(c_tok, order, axis=1)
            s_adv = jnp.take_along_axis(c_adv, order, axis=1)
            s_h1 = jnp.take_along_axis(c_h1, order, axis=1)
            s_h2 = jnp.take_along_axis(c_h2, order, axis=1)
            s_len = jnp.take_along_axis(c_len, order, axis=1)

            eq = (
                (s_h1[:, :, None] == s_h1[:, None, :])
                & (s_h2[:, :, None] == s_h2[:, None, :])
                & (s_len[:, :, None] == s_len[:, None, :])
            )                                           # (B, NK, NK)
            eq_before = eq & (jidx[None, :] <= jidx[:, None])[None]
            first_idx = jnp.argmax(eq_before, axis=-1)  # first equal pos
            is_first = first_idx == jidx[None, :]
            urank = jnp.cumsum(is_first.astype(jnp.int32), axis=-1)
            reached = urank >= N
            p_pos = jnp.where(
                jnp.any(reached, axis=-1), jnp.argmax(reached, axis=-1),
                NK - 1,
            )                                           # (B,)
            in_win = jidx[None, :] <= p_pos[:, None]    # (B, NK)
            contrib = jnp.where(
                eq & in_win[:, None, :], s_score[:, None, :], NEG
            )
            merged = jax.nn.logsumexp(contrib, axis=-1)  # (B, NK)
            final = jnp.where(is_first & in_win, merged, NEG)

            top_scores, top_pos = jax.lax.top_k(final, N)   # (B, N)
            ok = top_scores > NEG
            n_src = jnp.take_along_axis(s_src, top_pos, axis=1)
            n_tok = jnp.take_along_axis(s_tok, top_pos, axis=1)
            n_adv = jnp.take_along_axis(s_adv, top_pos, axis=1) & ok
            n_h1 = jnp.take_along_axis(s_h1, top_pos, axis=1)
            n_h2 = jnp.take_along_axis(s_h2, top_pos, axis=1)
            n_len = jnp.take_along_axis(s_len, top_pos, axis=1)

        hyps_g = jnp.take_along_axis(
            carry["hyps"], n_src[:, :, None], axis=1
        )                                               # (B, N, L)
        write_pos = n_len - n_adv.astype(jnp.int32)
        wmask = (
            (jnp.arange(L)[None, None, :] == write_pos[:, :, None])
            & n_adv[:, :, None]
        )
        new_hyps = jnp.where(wmask, n_tok[:, :, None], hyps_g)
        last_g = jnp.take_along_axis(carry["last"], n_src, axis=1)
        new_last = jnp.where(n_adv, n_tok, last_g)

        # predictor reorder + step (advance only where a token was emitted)
        sel = (jnp.arange(B, dtype=jnp.int32)[:, None] * N + n_src
               ).reshape(-1)
        adv_flat = n_adv.reshape(-1)
        state_g = _gather_state(carry["state"], sel)
        pred_g = jnp.take(carry["pred_out"], sel, axis=0)
        cand_out, cand_state = predictor_step(prms, new_last.reshape(-1),
                                              state_g)
        pred_new = jnp.where(adv_flat[:, None], cand_out, pred_g)
        state_new = jax.tree.map(
            lambda nw, od: _select_rows(adv_flat, nw, od),
            cand_state, state_g,
        )

        # frozen where the utterance already ended
        am = active
        amn = jnp.repeat(am, N)
        new_carry = dict(
            hyps=jnp.where(am[:, None, None], new_hyps, carry["hyps"]),
            hyp_len=jnp.where(am[:, None], n_len, carry["hyp_len"]),
            scores=jnp.where(am[:, None], top_scores, carry["scores"]),
            h1=jnp.where(am[:, None], n_h1, carry["h1"]),
            h2=jnp.where(am[:, None], n_h2, carry["h2"]),
            last=jnp.where(am[:, None], new_last, carry["last"]),
            pred_out=jnp.where(amn[:, None], pred_new, carry["pred_out"]),
            state=jax.tree.map(
                lambda nw, od: _select_rows(amn, nw, od),
                state_new, carry["state"],
            ),
        )
        return new_carry, None

    xs = (
        jnp.moveaxis(enc_out, 1, 0),
        jnp.moveaxis(ctc_probs, 1, 0),
        jnp.arange(T, dtype=jnp.int32),
    )
    # the jitted scan is cached per (step fns, shapes): re-tracing the
    # ~300-op body every call costs seconds — with long-form windowed
    # decode calling this per window, the retrace would dominate
    # key includes the RESOLVED fused-predictor and top-k VMEM-pin
    # decisions: both are env/backend-dependent (PAFC_PRED_FUSED /
    # PAFC_TOPK_VMEM read per call), so an A/B script flipping the env
    # between calls must not reuse the scan compiled for the other path
    from paper_accurate_fast_cheap_tpu.ops.topk_pallas import (
        topk_w_vmem_enabled)
    key = (id(orig_steps[0]), id(orig_steps[1]), params is None, B, T, N,
           ctc_probs.shape[-1], enc_out.shape[-1], blank_id,
           round(log_tw, 8), round(log_cw, 8),
           str(enc_out.dtype), str(ctc_probs.dtype), unroll, merge,
           topk_impl, pred_fused, topk_w_vmem_enabled(), align_pack)
    # Under an OUTER trace (e.g. the fused recognize_wav chain jits this
    # whole search) every jnp op above — including constants like
    # `jidx = jnp.arange(NK)` — is staged as a tracer of that trace.  A
    # cache entry built here would capture those tracers in `step`'s
    # closure and poison any later same-key call (UnexpectedTracerError),
    # so tracing callers bypass the cache: their enclosing program is
    # compiled (and cached) as a whole anyway.
    tracing = _under_trace()
    cached = None if tracing else _DEVICE_BEAM_CACHE.get(key)
    if cached is None:
        # unroll>1 amortizes per-iteration loop overhead of the tiny
        # (~300-op, no-matmul-bound) step body — the scan's serial
        # latency, not its FLOPs, prices the search on TPU
        if align_pack > 0:
            from paper_accurate_fast_cheap_tpu.ops import ctc_utils

            def _run_aligned(prms, c, x, lens):
                carry = jax.lax.scan(
                    lambda cc, xx: step(prms, lens, cc, xx), c, x,
                    unroll=unroll)[0]
                # x[1] is the (T, B, V[p]) CTC log-probs; -inf pad
                # columns (pallas_joint pre-pad) are never indexed by
                # real token ids, so alignment is unaffected
                logp_btv = jnp.moveaxis(x[1], 0, 1)
                path, ok = ctc_utils.force_align_device_tokens(
                    logp_btv, lens,
                    carry["hyps"][:, 0, :align_pack],
                    carry["hyp_len"][:, 0], blank_id=blank_id,
                    unroll=8)
                return pack_device_beam_aligned(carry, path, ok, lens)

            run = jax.jit(_run_aligned)
        else:
            run = jax.jit(lambda prms, c, x, lens: jax.lax.scan(
                lambda cc, xx: step(prms, lens, cc, xx), c, x,
                unroll=unroll)[0])
        # hold the step fns so their id()s stay valid for the cache key
        if not tracing:
            _DEVICE_BEAM_CACHE[key] = (run, orig_steps)
            if len(_DEVICE_BEAM_CACHE) > 16:
                _DEVICE_BEAM_CACHE.pop(next(iter(_DEVICE_BEAM_CACHE)))
    else:
        run = cached[0]
    out = run(params, carry0, xs, lens_dev)
    if defer:
        return out
    if align_pack > 0:
        return finalize_device_beam_aligned(out, beam=N)[0]
    return finalize_device_beam(out)


def pack_device_beam(out) -> jax.Array:
    """Flatten a deferred beam carry into ONE int32 buffer.

    A remote-attached chip pays a host round trip per fetched array;
    `finalize_device_beam` on the raw carry fetches three (hyps,
    hyp_len, scores).  Packing inside the caller's fused decode program
    makes finalize a single fetch.  Recover with
    ``finalize_device_beam(packed, beam=N)`` (the width ``N*L + 2N``
    yields L).  Scores ride bitcast to int32 (exact)."""
    hyps = out["hyps"]
    B, N, L = hyps.shape
    return jnp.concatenate([
        hyps.reshape(B, N * L).astype(jnp.int32),
        out["hyp_len"].astype(jnp.int32),
        jax.lax.bitcast_convert_type(
            out["scores"].astype(jnp.float32), jnp.int32),
    ], axis=1)


def finalize_device_beam(out, beam: int = 0) -> List[DecodeResult]:
    """Materialize a deferred device-beam carry into DecodeResults.

    Split from the search so callers can DISPATCH the next window
    batch's device work before fetching this one's outputs (the fetch
    blocks on the whole chain; overlapping it with the next batch's
    compute hides per-dispatch transport latency in long-form decode).

    Accepts either the raw carry dict (three array fetches) or a
    `pack_device_beam` buffer with ``beam=`` given (one fetch).
    """
    if not isinstance(out, dict):
        if beam <= 0:
            raise ValueError("packed finalize needs beam=N")
        arr = np.asarray(out)                      # the ONE fetch
        B, W = arr.shape
        N = beam
        L = W // N - 2
        hyps = arr[:, : N * L].reshape(B, N, L)
        hyp_len = arr[:, N * L: N * L + N]
        scores = np.ascontiguousarray(
            arr[:, N * L + N:]).view(np.float32)
    else:
        hyps = np.asarray(out["hyps"])
        hyp_len = np.asarray(out["hyp_len"])
        scores = np.asarray(out["scores"])
    B, N = scores.shape
    results = []
    for b in range(B):
        nbest, nscores = [], []
        for j in range(N):
            if not np.isfinite(scores[b, j]):
                continue
            nbest.append([int(x) for x in hyps[b, j, : hyp_len[b, j]]])
            nscores.append(float(scores[b, j]))
        results.append(DecodeResult(
            tokens=nbest[0] if nbest else [],
            score=nscores[0] if nscores else 0.0,
            nbest=nbest, nbest_scores=nscores,
        ))
    return results


def pack_device_beam_aligned(out, path, ok, lens) -> jax.Array:
    """`pack_device_beam` + the top-hypothesis Viterbi path + ok flag +
    enc lens, all in ONE int32 buffer (one host fetch materializes the
    beam, its alignment, and the lengths together).

    Layout per row: [hyps N*L | hyp_len N | scores N (bitcast) |
    path L | ok 1 | len 1]; recover with
    ``finalize_device_beam_aligned(buf, beam=N)`` (L and the hyps L are
    both the frame count T, so ``L = (W - 2N - 2) // (N + 1)``).
    """
    B, N, L = out["hyps"].shape
    assert path.shape == (B, L), (path.shape, (B, L))
    return jnp.concatenate([
        pack_device_beam(out),
        path.astype(jnp.int32),
        ok.astype(jnp.int32)[:, None],
        jnp.asarray(lens, jnp.int32)[:, None],
    ], axis=1)


def finalize_device_beam_aligned(buf, beam: int):
    """Materialize a `pack_device_beam_aligned` buffer (the ONE fetch).

    Returns (results, path (B, T) int32 np, ok (B,) bool np,
    lens (B,) int np).
    """
    arr = np.asarray(buf)
    B, W = arr.shape
    N = beam
    L = (W - 2 * N - 2) // (N + 1)
    assert N * L + 2 * N + L + 2 == W, (W, N, L)
    beam_w = N * L + 2 * N
    results = finalize_device_beam(arr[:, :beam_w], beam=N)
    path = arr[:, beam_w: beam_w + L]
    ok = arr[:, beam_w + L].astype(bool)
    lens = arr[:, beam_w + L + 1]
    return results, path, ok, lens


def _rnnt_beam_search_host(
    predictor_step: Callable,
    joint_step: Callable,
    init_state_fn: Callable,    # (n) -> predictor state pytree
    enc_out: jax.Array,         # (B, T, De)
    enc_lens: jax.Array,
    ctc_probs: jax.Array,       # (B, T, V) log-probs for fusion
    beam_size: int = 8,
    blank_id: int = 0,
    ctc_weight: float = 0.3,
    transducer_weight: float = 0.7,
    params=None,
) -> List[DecodeResult]:
    """Host-loop prefix beam search (parity oracle for the device impl)."""
    enc_out = jnp.asarray(enc_out)
    B, T, De = enc_out.shape
    N = beam_size
    lens = np.asarray(enc_lens)
    predictor_step, joint_step = _bind_steps(predictor_step, joint_step,
                                             params)

    # flat (B*N) state
    state = init_state_fn(B * N)
    tokens = jnp.full((B * N,), blank_id, jnp.int32)
    pred_out, state = predictor_step(params, tokens, state)

    @jax.jit
    def fused_step(prms, enc_t, pred_out, ctc_t):
        # enc_t (B*N, De); ctc_t (B, V) -> fused (B*N, V)
        logp = joint_step(prms, enc_t, pred_out)
        V = logp.shape[-1]
        ctc_rep = jnp.repeat(ctc_t, N, axis=0)
        fused = jnp.logaddexp(
            jnp.log(transducer_weight) + logp,
            jnp.log(ctc_weight) + ctc_rep,
        )
        return fused

    @jax.jit
    def reorder_and_step(prms, state, pred_out, sel, new_tokens, advance):
        """Gather beam entries by sel (B*N,), then predictor-step where
        advance (emitted a token)."""
        state_g = _gather_state(state, sel)
        pred_g = jnp.take(pred_out, sel, axis=0)
        cand_out, cand_state = predictor_step(prms, new_tokens, state_g)
        out = jnp.where(advance[:, None], cand_out, pred_g)
        st = jax.tree.map(
            lambda new, old: _select_rows(advance, new, old),
            cand_state, state_g,
        )
        return out, st

    # host-side beams: per utterance, list of (hyp tuple) + scores
    hyps = [[(blank_id,)] + [None] * (N - 1) for _ in range(B)]
    scores = np.full((B, N), -np.inf)
    scores[:, 0] = 0.0

    for t in range(int(lens.max())):
        enc_t = jnp.repeat(enc_out[:, t], N, axis=0)  # (B*N, De)
        fused = np.asarray(fused_step(params, enc_t, pred_out,
                                      ctc_probs[:, t]))
        V = fused.shape[-1]
        sel = np.zeros((B * N,), np.int64)
        new_tok = np.zeros((B * N,), np.int32)
        advance = np.zeros((B * N,), bool)
        for b in range(B):
            if t >= lens[b]:
                sel[b * N : (b + 1) * N] = b * N + np.arange(N)
                continue
            # reference semantics (prefix_beam_search.py:516-566): per-beam
            # top-K expansion, walk ALL candidates in descending score
            # order, log-add duplicates into the earlier occurrence, stop
            # once beam_size distinct prefixes exist.
            cands = []  # (score, src, adv, tok, hyp)
            for j in range(N):
                if hyps[b][j] is None:
                    continue
                base = scores[b, j]
                lp = fused[b * N + j]
                top = np.argsort(-lp)[:N]
                for u in top:
                    s = base + lp[u]
                    if u == blank_id:
                        cands.append((s, j, False, int(u), hyps[b][j]))
                    else:
                        cands.append(
                            (s, j, True, int(u), hyps[b][j] + (int(u),))
                        )
            cands.sort(key=lambda c: -c[0])
            best = []      # list of [hyp, score, src, adv, tok]
            seen = {}
            for s, src, adv, u, hyp in cands:
                if hyp in seen:
                    e = best[seen[hyp]]
                    e[1] = np.logaddexp(e[1], s)
                else:
                    seen[hyp] = len(best)
                    best.append([hyp, s, src, adv, u])
                    if len(best) >= N:
                        break
            best.sort(key=lambda e: -e[1])
            new_hyps = [None] * N
            for j, (hyp, s, src, adv, u) in enumerate(best):
                new_hyps[j] = hyp
                scores[b, j] = s
                sel[b * N + j] = b * N + src
                new_tok[b * N + j] = u if adv else hyp[-1]
                advance[b * N + j] = adv
            for j in range(len(best), N):
                scores[b, j] = -np.inf
                sel[b * N + j] = b * N
            hyps[b] = new_hyps
        pred_out, state = reorder_and_step(
            params, state, pred_out, jnp.asarray(sel), jnp.asarray(new_tok),
            jnp.asarray(advance),
        )

    results = []
    for b in range(B):
        order = np.argsort(-scores[b])
        nbest, nscores = [], []
        for j in order:
            if hyps[b][j] is None:
                continue
            nbest.append([x for x in hyps[b][j][1:]])  # strip leading blank
            nscores.append(float(scores[b, j]))
        results.append(DecodeResult(
            tokens=nbest[0] if nbest else [],
            score=nscores[0] if nscores else 0.0,
            nbest=nbest, nbest_scores=nscores,
        ))
    return results
