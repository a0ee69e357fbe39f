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
