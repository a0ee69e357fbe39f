"""Incremental (true-streaming) recognition sessions.

The reference streams by re-running `forward_chunk_by_chunk` offline
(`wenet/transformer/encoder.py:341-402`); its websocket clients send
whole files.  This module is the online counterpart the TPU stack can
actually serve: a session object that accepts arbitrary-size waveform
pieces, featurizes EXACTLY the frames the whole-file fbank would produce
(sample-domain windowing, same contract as `bin/recognize_wav`), runs
the causal encoder chunk-by-chunk with carried state
(wkv/token-shift/conv caches — `decode/streaming.py` semantics), and
emits incremental CTC-greedy partial hypotheses with blank/duplicate
collapse carried across chunk boundaries.

All device programs are static-shape: one encoder-chunk program and one
(padded) tail program per session configuration, reused across sessions.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PartialResult:
    text: str
    tokens: List[int]
    # per-token audio-time (s) of the encoder frame that emitted it —
    # the greedy-CTC peak position, same timing the offline CTM path
    # reports (`bin/recognize_wav` / `recognize_wav2.py:523-552`)
    times: List[float] = dataclasses.field(default_factory=list)
    final: bool = False


class StreamingSession:
    """One utterance's incremental decode (causal encoders only)."""

    def __init__(self, model, params, tokenizer, featurize,
                 decoding_chunk_size: int = 16, subsampling: int = 4,
                 context: int = 7, frame_shift: int = 160,
                 frame_length: int = 400, blank_id: int = 0,
                 _program_cache: Optional[dict] = None):
        self._tokenizer = tokenizer
        self._featurize = featurize
        self._params = params
        self._blank = blank_id
        self._c = decoding_chunk_size
        self._sub = subsampling
        self._ctx = context
        self._shift = frame_shift
        self._flen = frame_length
        # encoder window geometry (decode/streaming.py:33-39)
        self._win_frames = (decoding_chunk_size - 1) * subsampling + context
        self._stride_frames = subsampling * decoding_chunk_size
        self._win_samples = (self._win_frames - 1) * frame_shift \
            + frame_length

        self._samples = np.zeros((0,), np.float32)
        self._abs_start = 0          # absolute frame id of _samples[0]
        self._state = None
        self._offset = 0
        self._prev_tok = blank_id    # greedy collapse across chunks
        self._tokens: List[int] = []
        self._token_frames: List[int] = []   # absolute encoder frame ids
        # encoder frame -> seconds (ds `subsampling` x 10 ms fbank shift)
        self._frame_sec = subsampling * frame_shift / 16000.0
        self._done = False

        cache = _program_cache if _program_cache is not None else {}
        key = (id(model), decoding_chunk_size)
        if key not in cache:
            def enc_chunk(p, f, l, state, offset):
                def run(m, f, l, state, offset):
                    enc, el, st = m.encoder(
                        f, l, streaming_state=state, return_state=True,
                        offset=offset, deterministic=True)
                    logp = m.ctc(enc, deterministic=True)
                    return (jax.nn.log_softmax(logp, axis=-1), el, st)

                return model.apply(p, f, l, state, offset, method=run)

            cache[key] = jax.jit(enc_chunk)
        self._enc_chunk = cache[key]

    # -- audio in ---------------------------------------------------------
    def accept_waveform(self, samples: np.ndarray) -> PartialResult:
        """Feed float32 samples in [-1, 1]; returns the partial so far."""
        if self._done:
            raise RuntimeError("session already finalized")
        self._samples = np.concatenate(
            [self._samples, np.asarray(samples, np.float32)])
        while self._try_chunk(flush=False):
            pass
        return self.partial()

    def finalize(self) -> PartialResult:
        """Flush the (zero-padded) tail window and close the session."""
        if not self._done:
            while self._try_chunk(flush=False):
                pass
            self._try_chunk(flush=True)
            self._done = True
        out = self.partial()
        out.final = True
        return out

    def partial(self) -> PartialResult:
        text, _ = self._tokenizer.detokenize(self._tokens)
        return PartialResult(
            text=text, tokens=list(self._tokens),
            times=[f * self._frame_sec for f in self._token_frames])

    def abort(self) -> None:
        """Discard the session (no device state to free — interface
        parity with the batched adapter's slot release)."""
        self._done = True

    # -- internals --------------------------------------------------------
    def _try_chunk(self, flush: bool) -> bool:
        have = len(self._samples)
        if not flush and have < self._win_samples:
            return False
        if flush:
            # remaining full frames in the buffer (need >= context)
            frames = max(0, (have - self._flen) // self._shift + 1)
            if frames < self._ctx:
                return False
            window = np.zeros((self._win_samples,), np.float32)
            window[:have] = self._samples
            valid = min(frames, self._win_frames)
        else:
            window = self._samples[: self._win_samples]
            valid = self._win_frames
        feats, flens = self._featurize(
            jnp.asarray(window[None]),
            jnp.asarray([(valid - 1) * self._shift + self._flen]),
            train=False)
        logp, el, st = self._enc_chunk(
            self._params, feats, flens, self._state,
            jnp.int32(self._offset))
        n = int(el[0])
        best = np.asarray(jnp.argmax(logp[0, :n], axis=-1))
        for i, t in enumerate(best):
            t = int(t)
            if t != self._blank and t != self._prev_tok:
                self._tokens.append(t)
                self._token_frames.append(self._offset + i)
            self._prev_tok = t
        self._state = st
        self._offset += n
        # advance by stride; keep the overlap tail
        adv = self._stride_frames * self._shift
        self._samples = self._samples[adv:]
        self._abs_start += self._stride_frames
        return not flush


def make_session_factory(model, params, tokenizer, featurize, **kw):
    """Returns ``() -> StreamingSession`` sharing one jitted program
    cache across sessions (serving: one compile, many connections)."""
    cache: dict = {}

    def factory():
        return StreamingSession(model, params, tokenizer, featurize,
                                _program_cache=cache, **kw)

    return factory


class _Slot:
    __slots__ = ("samples", "tokens", "token_frames", "prev_tok",
                 "offset", "flushing", "done", "fresh")

    def __init__(self, blank_id: int):
        self.samples = np.zeros((0,), np.float32)
        self.tokens: List[int] = []
        self.token_frames: List[int] = []
        self.prev_tok = blank_id
        self.offset = 0
        self.flushing = False
        self.done = False
        self.fresh = True      # device state row needs zeroing


class StreamingBatch:
    """Lockstep multi-session streaming: up to ``max_sessions``
    concurrent utterances each advance one encoder window per
    :meth:`step`, in ONE fused device dispatch (fbank + causal encoder
    + CTC log-softmax + per-slot state merge).

    TPU-first rationale: a single :class:`StreamingSession` leaves the
    MXU nearly idle (batch 1) and pays per-dispatch transport for every
    640 ms window (measured 61 ms p50 through the tunnel —
    BENCH_SWEEP.md streaming section), so one chip saturates at ~10
    real-time connections.  Slot-batching amortizes both costs across
    sessions.  The reference's serving runtime decodes each websocket
    connection independently
    (`runtime/core/decoder/asr_decoder.cc` per-connection instances).

    Restricted to recurrent-attention causal encoders (rwkv/mamba):
    their streaming step is position-offset-invariant — all
    cross-window context rides in the carried state — so slots at
    different audio positions share one program with ``offset=0``.
    (MHA streaming needs per-slot absolute key positions,
    `models/conformer.py` pos_ids; use :class:`StreamingSession`.)

    Slot-reset trick: the initial streaming state is all-zeros by
    construction (token-shift lead `models/rwkv.py:119`, conv cache
    `models/convolution.py:68-71`, wkv/ssd state), so a joining session
    reuses a freed slot by zeroing its batch row inside the step
    program — no per-join dispatch, no program respecialization.
    """

    def __init__(self, model, params, tokenizer, featurize,
                 max_sessions: int = 8, decoding_chunk_size: int = 16,
                 subsampling: int = 4, context: int = 7,
                 frame_shift: int = 160, frame_length: int = 400,
                 blank_id: int = 0):
        att = dict(getattr(model, "encoder_conf", None) or {}).get(
            "selfattention_layer_type", "selfattn")
        if att in ("selfattn", "rel_selfattn"):
            raise ValueError(
                "StreamingBatch requires a recurrent-attention encoder "
                "(rwkv/mamba); MHA streaming state is offset-dependent "
                f"— got selfattention_layer_type={att!r}")
        self._tokenizer = tokenizer
        self._params = params
        self._blank = blank_id
        self._B = max_sessions
        self._c = decoding_chunk_size
        self._sub = subsampling
        self._ctx = context
        self._shift = frame_shift
        self._flen = frame_length
        self._win_frames = (decoding_chunk_size - 1) * subsampling + context
        self._stride_frames = subsampling * decoding_chunk_size
        self._win_samples = (self._win_frames - 1) * frame_shift \
            + frame_length
        self._frame_sec = subsampling * frame_shift / 16000.0

        self._slots: List[Optional[_Slot]] = [None] * max_sessions

        B, W = max_sessions, self._win_samples

        def fused_step(p, wave, wlens, state, active, fresh):
            # zero joining slots' state rows (fresh == initial state)
            def _reset(s):
                m = fresh.reshape((B,) + (1,) * (s.ndim - 1))
                return jnp.where(m, jnp.zeros((), s.dtype), s)

            state = jax.tree.map(_reset, state)
            feats, flens = featurize(wave, wlens, train=False)

            def run(m, f, l, st):
                enc, el, new = m.encoder(
                    f, l, streaming_state=st, return_state=True,
                    offset=0, deterministic=True)
                logp = m.ctc(enc, deterministic=True)
                return jax.nn.log_softmax(logp, axis=-1), el, new

            logp, el, new_state = model.apply(p, feats, flens, state,
                                              method=run)

            def _merge(n, o):
                m = active.reshape((B,) + (1,) * (n.ndim - 1))
                return jnp.where(m, n, o)

            return logp, el, jax.tree.map(_merge, new_state, state)

        self._fused_step = jax.jit(fused_step)

        # zero state template via eval_shape (no device work, no trace
        # of a second state=None program variant)
        def _shape_probe(p, wave, wlens):
            feats, flens = featurize(wave, wlens, train=False)

            def run(m, f, l):
                _, _, st = m.encoder(f, l, streaming_state=None,
                                     return_state=True, offset=0,
                                     deterministic=True)
                return st

            return model.apply(p, feats, flens, method=run)

        st_shapes = jax.eval_shape(
            _shape_probe, params,
            jax.ShapeDtypeStruct((B, W), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.int32))
        self._state = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), st_shapes)

    # -- session management ------------------------------------------------
    def open(self) -> int:
        """Allocate a session slot; returns its id.  Raises if full."""
        for i, s in enumerate(self._slots):
            if s is None:
                self._slots[i] = _Slot(self._blank)
                return i
        raise RuntimeError(f"all {self._B} session slots busy")

    def accept_waveform(self, sid: int, samples: np.ndarray) -> None:
        """Buffer float32 samples in [-1, 1] for slot ``sid`` (host-only;
        device work happens in :meth:`step`)."""
        slot = self._require(sid)
        if slot.flushing or slot.done:
            raise RuntimeError("session already finalizing")
        slot.samples = np.concatenate(
            [slot.samples, np.asarray(samples, np.float32)])

    def ready(self, sid: int) -> bool:
        """Does ``sid`` have a window's worth of work for the next step?"""
        slot = self._require(sid)
        return not slot.done and (
            len(slot.samples) >= self._win_samples or slot.flushing)

    def any_ready(self) -> bool:
        return any(s is not None and not s.done
                   and (len(s.samples) >= self._win_samples or s.flushing)
                   for s in self._slots)

    def partial(self, sid: int) -> PartialResult:
        slot = self._require(sid)
        text, _ = self._tokenizer.detokenize(slot.tokens)
        return PartialResult(
            text=text, tokens=list(slot.tokens),
            times=[f * self._frame_sec for f in slot.token_frames],
            final=slot.done)

    def flush(self, sid: int) -> None:
        """Mark end-of-utterance; remaining audio drains through
        subsequent :meth:`step` calls (padded tail window last)."""
        self._require(sid).flushing = True

    def is_done(self, sid: int) -> bool:
        return self._require(sid).done

    def close(self, sid: int) -> PartialResult:
        """Free the slot and return its final result (must be done)."""
        slot = self._require(sid)
        if not slot.done:
            raise RuntimeError("close() before the flush drained; use "
                               "finalize() or step until is_done()")
        out = self.partial(sid)
        self._slots[sid] = None
        return out

    def finalize(self, sid: int) -> PartialResult:
        """Drain remaining windows + the padded tail, close and free the
        slot, return the final result (single-driver convenience; a
        server with its own stepper thread uses flush/is_done/close)."""
        slot = self._require(sid)
        if not slot.done:
            slot.flushing = True
            while not slot.done:
                self.step()
        return self.close(sid)

    # -- the one device dispatch --------------------------------------------
    def step(self) -> dict:
        """Advance every ready slot by one window in a single fused
        dispatch.  Returns {sid: PartialResult} for slots that emitted
        new tokens (plus slots that just finished, final=True)."""
        B, W = self._B, self._win_samples
        wave = np.zeros((B, W), np.float32)
        wlens = np.full((B,), W, np.int32)
        active = np.zeros((B,), bool)
        fresh = np.zeros((B,), bool)
        closing: List[int] = []
        for i, slot in enumerate(self._slots):
            if slot is None or slot.done:
                continue
            have = len(slot.samples)
            if have >= self._win_samples:
                wave[i] = slot.samples[:W]
            elif slot.flushing:
                frames = max(0, (have - self._flen) // self._shift + 1)
                if frames < self._ctx:
                    slot.done = True
                    continue
                wave[i, :have] = slot.samples
                wlens[i] = (min(frames, self._win_frames) - 1) \
                    * self._shift + self._flen
                closing.append(i)
            else:
                continue
            active[i] = True
            fresh[i] = slot.fresh
        if not active.any():
            return {}

        logp, el, self._state = self._fused_step(
            self._params, jnp.asarray(wave), jnp.asarray(wlens),
            self._state, jnp.asarray(active), jnp.asarray(fresh))
        el = np.asarray(el)
        best = np.asarray(jnp.argmax(logp, axis=-1))

        out = {}
        for i, slot in enumerate(self._slots):
            if slot is None or not active[i]:
                continue
            slot.fresh = False
            n_before = len(slot.tokens)
            for j in range(int(el[i])):
                t = int(best[i, j])
                if t != self._blank and t != slot.prev_tok:
                    slot.tokens.append(t)
                    slot.token_frames.append(slot.offset + j)
                slot.prev_tok = t
            slot.offset += int(el[i])
            adv = self._stride_frames * self._shift
            slot.samples = slot.samples[adv:]
            if i in closing:
                slot.done = True
            if len(slot.tokens) > n_before or slot.done:
                out[i] = self.partial(i)
        return out

    def _require(self, sid: int) -> _Slot:
        slot = self._slots[sid]
        if slot is None:
            raise KeyError(f"no open session {sid}")
        return slot


class BatchStreamWorker:
    """Thread-safe facade over :class:`StreamingBatch` for the websocket
    server: connection handlers buffer audio and poll partials; ONE
    stepper thread owns all device dispatches, so N concurrent
    connections cost one fused program step per window instead of N.

    Pull model: handlers read :meth:`partial` after feeding audio (it may
    lag the stepper by a window — fine for partials); :meth:`finalize`
    blocks until the stepper drains the flush."""

    def __init__(self, batch: StreamingBatch):
        import threading

        self._b = batch
        self._cv = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="stream-stepper")
        self._thread.start()

    def open(self) -> int:
        with self._cv:
            return self._b.open()

    def accept_waveform(self, sid: int, wav: np.ndarray) -> None:
        with self._cv:
            self._b.accept_waveform(sid, wav)
            self._cv.notify_all()

    def partial(self, sid: int) -> PartialResult:
        with self._cv:
            return self._b.partial(sid)

    def finalize(self, sid: int) -> PartialResult:
        with self._cv:
            self._b.flush(sid)
            self._cv.notify_all()
            self._cv.wait_for(lambda: self._b.is_done(sid))
            return self._b.close(sid)

    def shutdown(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join()

    def _run(self) -> None:
        while True:
            with self._cv:
                self._cv.wait_for(
                    lambda: self._stop or self._b.any_ready())
                if self._stop:
                    return
                self._b.step()
                # wake finalize() waiters whose flush just drained
                self._cv.notify_all()
