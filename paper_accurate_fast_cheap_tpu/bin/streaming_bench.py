"""Streaming-decode latency + RTF benchmark CLI.

Measures the true-streaming serving path (`streaming.StreamingSession`:
incremental fbank-exact windows, carried encoder state, greedy-CTC
partials) at the reference's U2 streaming operating points
(`examples/gigaspeech/s0/README.md:53-55` — chunk 8/16, <=480 ms
algorithmic latency) and reports the quantities the reference's latency
harness defines (`tools/latency_metrics.py:206-274`):

- per-window encoder-step compute latency (p50/p90/p99/max),
- streaming RTF (compute seconds per audio second) and its inverse
  (concurrent real-time sessions one chip can sustain),
- emission latency: wall-clock token emission vs the token's own
  audio time (greedy-CTC peak frame) — FirstToken/LastToken/AvgToken
  percentiles via `tools.latency_metrics.latency_report`.

Two measurement modes:
- default (max speed): drives the session as fast as the device allows;
  emission latency is derived analytically as
  ``packet-arrival(window end) + measured per-window compute - token
  audio time`` (exact when RTF < 1: no queueing),
- ``--realtime``: actually paces the feed at real time (sleep between
  packets) and wall-clocks each partial — the honest end-to-end number,
  costs utt_seconds of wall time per utterance.

Works config-only (random params, like `bin/decode_rtf`): latency and
RTF do not depend on the weights.  ``causal: true`` is forced into the
encoder conf — streaming requires a causal conv module.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


class _BenchTokenizer:
    def detokenize(self, ids):
        return " ".join(f"T{i}" for i in ids), [f"T{i}" for i in ids]

    def vocab_size(self):  # pragma: no cover - size set by config
        return 0


def get_args(argv=None):
    p = argparse.ArgumentParser(description="streaming latency benchmark")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="optional; random params if omitted")
    p.add_argument("--chunk", type=int, default=16,
                   help="decoding chunk in encoder frames (ds4: 16 -> "
                        "640 ms stride; the reference's streaming row "
                        "uses 8/16)")
    p.add_argument("--utt_seconds", type=float, default=30.0)
    p.add_argument("--n_utts", type=int, default=5)
    p.add_argument("--piece_ms", type=float, default=100.0,
                   help="simulated packet size (websocket frame)")
    p.add_argument("--realtime", action="store_true",
                   help="pace the feed at real time and wall-clock "
                        "emissions (utt_seconds wall per utterance)")
    p.add_argument("--concurrent", type=int, default=1,
                   help=">1: serve N sessions via StreamingBatch (one "
                        "fused device step advances all N windows); "
                        "reports AGGREGATE streaming RTF")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--json", dest="json_out", default=None,
                   help="also write the report as one JSON line here")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu); the container "
                        "pre-registers the TPU backend so JAX_PLATFORMS "
                        "alone cannot")
    return p.parse_args(argv)


def _percentiles(vals: List[float]):
    a = np.asarray(vals, np.float64)
    return {"p50": float(np.percentile(a, 50)),
            "p90": float(np.percentile(a, 90)),
            "p99": float(np.percentile(a, 99)),
            "max": float(a.max()), "mean": float(a.mean())}


def _run_batched(args, batch, make_wav, piece, stride_sec):
    """Concurrent-session measurement: N identical-rate sessions advance
    in lockstep, one fused dispatch per window round.  Reported RTF is
    AGGREGATE (compute seconds per total audio second across sessions),
    so 1/rtf is the chip's concurrent real-time session capacity."""
    import time

    from paper_accurate_fast_cheap_tpu.tools import latency_metrics

    N = args.concurrent
    piece_sec = piece / 16000.0

    # warmup: compile the one fused step program (+ flush via finalize)
    t0 = time.perf_counter()
    sids = [batch.open() for _ in range(N)]
    for s in sids:
        batch.accept_waveform(s, make_wav()[: batch._win_samples + piece])
    while batch.any_ready():
        batch.step()
    for s in sids:
        batch.finalize(s)
    compile_s = time.perf_counter() - t0
    logging.info("fused step compiled in %.1f s", compile_s)

    step_lat: List[float] = []
    per_utt: List[latency_metrics.UttLatency] = []
    total_compute = 0.0
    total_audio = 0.0

    for _ in range(args.n_utts):
        wavs = [make_wav() for _ in range(N)]
        total_audio += sum(len(w) for w in wavs) / 16000.0
        sids = [batch.open() for _ in range(N)]
        refs = {s: [] for s in sids}
        emits = {s: [] for s in sids}
        ntok = {s: 0 for s in sids}
        utt_steps: List[float] = []
        t_start = time.perf_counter()
        n = len(wavs[0])
        for i in range(0, n, piece):
            if args.realtime:
                tgt = t_start + (i + piece) / 16000.0
                now = time.perf_counter()
                if tgt > now:
                    time.sleep(tgt - now)
            for s, w in zip(sids, wavs):
                batch.accept_waveform(s, w[i: i + piece])
            while batch.any_ready():
                c0 = time.perf_counter()
                out = batch.step()
                dt = time.perf_counter() - c0
                total_compute += dt
                utt_steps.append(dt)
                wall = time.perf_counter() - t_start
                for s, part in out.items():
                    if len(part.tokens) > ntok[s]:
                        if args.realtime:
                            emits[s].extend(
                                [wall] * (len(part.tokens) - ntok[s]))
                        refs[s].extend(part.times[ntok[s]:])
                        ntok[s] = len(part.tokens)
        for s in sids:
            batch.flush(s)
        while not all(batch.is_done(s) for s in sids):
            c0 = time.perf_counter()
            out = batch.step()
            dt = time.perf_counter() - c0
            total_compute += dt
            wall = time.perf_counter() - t_start
            for s, part in out.items():
                if len(part.tokens) > ntok[s]:
                    if args.realtime:
                        emits[s].extend(
                            [wall] * (len(part.tokens) - ntok[s]))
                    refs[s].extend(part.times[ntok[s]:])
                    ntok[s] = len(part.tokens)
        for s in sids:
            batch.close(s)
        step_lat.extend(utt_steps)

        comp = float(np.median(utt_steps)) if utt_steps else 0.0
        for s in sids:
            if not args.realtime:
                emits[s] = []
                for f in [t / (batch._sub * batch._shift / 16000.0)
                          for t in refs[s]]:
                    w = int(f) // args.chunk
                    win_end = ((w + 1) * args.chunk * batch._sub - 1) \
                        * batch._shift + batch._flen
                    arrive = np.ceil(win_end / piece) * piece_sec
                    emits[s].append(arrive + comp)
            per_utt.append(latency_metrics.utterance_latency(
                emits[s], refs[s]))

    rtf = total_compute / total_audio
    report = {
        "metric": "streaming",
        "concurrent": N,
        "chunk": args.chunk,
        "stride_ms": stride_sec * 1000.0,
        "mode": "realtime" if args.realtime else "analytic",
        "window_compute_ms": {k: v * 1000.0 for k, v in
                              _percentiles(step_lat).items()},
        "streaming_rtf": rtf,
        "concurrent_realtime_sessions": int(1.0 / rtf) if rtf > 0 else -1,
        "emission_latency_ms": {
            k: {kk: vv * 1000.0 for kk, vv in d.items()}
            for k, d in latency_metrics.latency_report(per_utt).items()},
        "compile_s": compile_s,
        "n_utts": args.n_utts,
        "utt_seconds": args.utt_seconds,
        "piece_ms": args.piece_ms,
        "device": str(jax.devices()[0]),
    }
    line = json.dumps(report)
    print(line)
    if args.json_out:
        with open(args.json_out, "a", encoding="utf-8") as f:
            f.write(line + "\n")
    return report


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from paper_accurate_fast_cheap_tpu.frontend.pipeline import (
        make_feature_fn,
    )
    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.streaming import (
        make_session_factory,
    )
    from paper_accurate_fast_cheap_tpu.tools import latency_metrics
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    enc_conf = dict(config.get("encoder_conf", {}))
    if not enc_conf.get("causal", False):
        logging.warning("config is not causal — forcing causal: true "
                        "(streaming needs a cached causal conv module)")
        enc_conf["causal"] = True
    config = dict(config, encoder_conf=enc_conf)
    fb = dict(config.get("dataset_conf", {}).get("fbank_conf", {}))
    fb.setdefault("num_mel_bins", 80)
    fb["dither"] = 0.0
    input_dim = fb["num_mel_bins"]
    vocab = config.get("vocab_size_for_bench", 5002)
    model, _ = factory.init_model(config, vocab, input_dim)
    featurize = make_feature_fn(
        {"fbank_conf": fb, "spec_aug": False, "spec_sub": False}, None)

    feats0 = jnp.zeros((1, 64, input_dim))
    params = model.init(jax.random.PRNGKey(0), feats0, jnp.asarray([64]),
                        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]))
    if args.checkpoint:
        from paper_accurate_fast_cheap_tpu.train import checkpointing

        params, _, _ = checkpointing.load_checkpoint(args.checkpoint,
                                                     params)
    if args.bf16:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
    params = jax.device_put(params)

    shift, flen = int(fb.get("frame_shift", 10)) * 16, \
        int(fb.get("frame_length", 25)) * 16
    sub = 4
    sess_factory = make_session_factory(
        model, params, _BenchTokenizer(), featurize,
        decoding_chunk_size=args.chunk, subsampling=sub,
        frame_shift=shift, frame_length=flen)

    stride_sec = args.chunk * sub * shift / 16000.0
    piece = int(args.piece_ms / 1000.0 * 16000)
    n_samples = int(args.utt_seconds * 16000)
    rng = np.random.RandomState(7)

    def make_wav():
        return (rng.randn(n_samples) * 0.1).astype(np.float32)

    if args.concurrent > 1:
        from paper_accurate_fast_cheap_tpu.streaming import StreamingBatch

        batch = StreamingBatch(
            model, params, _BenchTokenizer(), featurize,
            max_sessions=args.concurrent,
            decoding_chunk_size=args.chunk, subsampling=sub,
            frame_shift=shift, frame_length=flen)
        return _run_batched(args, batch, make_wav, piece, stride_sec)

    # ---- warmup: compile the chunk + tail programs -----------------------
    t0 = time.perf_counter()
    s = sess_factory()
    s.accept_waveform(make_wav()[: piece * 20])
    s.finalize()
    compile_s = time.perf_counter() - t0
    logging.info("programs compiled in %.1f s", compile_s)

    # ---- measurement -----------------------------------------------------
    window_lat: List[float] = []          # per-window compute seconds
    per_utt: List[latency_metrics.UttLatency] = []
    total_compute = 0.0
    total_audio = 0.0
    piece_sec = piece / 16000.0

    for u in range(args.n_utts):
        wav = make_wav()
        total_audio += len(wav) / 16000.0
        sess = sess_factory()
        emits: List[float] = []           # wall emission time per token
        refs: List[float] = []            # token audio time
        utt_windows: List[float] = []
        n_tok = 0
        t_start = time.perf_counter()
        for i in range(0, len(wav), piece):
            if args.realtime:
                tgt = t_start + (i + piece) / 16000.0  # packet arrival
                now = time.perf_counter()
                if tgt > now:
                    time.sleep(tgt - now)
            off0 = sess._offset
            c0 = time.perf_counter()
            part = sess.accept_waveform(wav[i: i + piece])
            dt = time.perf_counter() - c0
            total_compute += dt
            wall = time.perf_counter() - t_start
            if sess._offset > off0:       # exactly one window at this rate
                utt_windows.append(dt)
            if len(part.tokens) > n_tok:
                if args.realtime:
                    emits.extend([wall] * (len(part.tokens) - n_tok))
                refs.extend(part.times[n_tok:])
                n_tok = len(part.tokens)
        c0 = time.perf_counter()
        fin = sess.finalize()
        dt = time.perf_counter() - c0
        total_compute += dt
        wall = time.perf_counter() - t_start
        if len(fin.tokens) > n_tok:
            if args.realtime:
                emits.extend([wall] * (len(fin.tokens) - n_tok))
            refs.extend(fin.times[n_tok:])
        window_lat.extend(utt_windows)

        if not args.realtime:
            # analytic emission wall time: the window holding frame f is
            # w = f // chunk; its last sample lands at packet boundary
            # ceil(win_end/piece); add that utterance's median compute
            comp = float(np.median(utt_windows)) if utt_windows else 0.0
            emits = []
            for f in [t / (sub * shift / 16000.0) for t in refs]:
                w = int(f) // args.chunk
                win_end = ((w + 1) * args.chunk * sub - 1) * shift + flen
                arrive = np.ceil(win_end / piece) * piece_sec
                emits.append(arrive + comp)
        per_utt.append(latency_metrics.utterance_latency(emits, refs))

    rtf = total_compute / total_audio
    report = {
        "metric": "streaming",
        "chunk": args.chunk,
        "stride_ms": stride_sec * 1000.0,
        "mode": "realtime" if args.realtime else "analytic",
        "window_compute_ms": {k: v * 1000.0 for k, v in
                              _percentiles(window_lat).items()},
        "streaming_rtf": rtf,
        "concurrent_realtime_sessions": int(1.0 / rtf) if rtf > 0 else -1,
        "emission_latency_ms": {
            k: {kk: vv * 1000.0 for kk, vv in d.items()}
            for k, d in latency_metrics.latency_report(per_utt).items()},
        "compile_s": compile_s,
        "n_utts": args.n_utts,
        "utt_seconds": args.utt_seconds,
        "piece_ms": args.piece_ms,
        "device": str(jax.devices()[0]),
    }
    line = json.dumps(report)
    print(line)
    if args.json_out:
        with open(args.json_out, "a", encoding="utf-8") as f:
            f.write(line + "\n")
    return report


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
