"""Driver benchmark: LONG-FORM DECODE 1/RTF on the flagship model (TPU).

BASELINE.md's north-star metric is end-to-end long-form decode
audio-hours/sec/chip (>=100x realtime per chip), i.e. the product path of
`wenet/bin/recognize_wav2.py:323-351,435-466`: window the audio, run the
encoder full-context per window, and the `rnnt_beam_search` prefix beam
(beam 8, ctc 0.3 / transducer 0.7) over every frame.  This bench runs
exactly that compute (windows -> encoder -> CTC log-probs -> on-device
beam scan, `decode/rnnt_search.py`) on the flagship
conformer12x512-rwkv6-bidirectional transducer at the 9000-frame (90 s)
window point of the paper's LF sweep (`go-LF-dev-one-model-paper.sh:
91-121`), with a blank-dominant joint so emission rates are
speech-realistic (~3 tokens/s) rather than the degenerate ~25/s of a
random-init model.

vs_baseline = (1/RTF) / 100 (the >=100x north-star).  The encoder-only
number (7695x in round 2) lives in BENCH_SWEEP.md.

Prints exactly one JSON line.
"""
import argparse
import functools
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_PROBE_SRC = (
    "import jax, numpy as np;"
    "x = jax.numpy.ones((256, 256));"
    "print(float(np.asarray(x @ x)[0, 0]))"
)


def _wait_for_tpu(budget_s: float) -> bool:
    """Probe the TPU worker with a tiny matmul until it answers.

    The remote worker crashes occasionally and recovers on its own after
    minutes-to-hours (NOTES.md crash log); round 3's driver bench hit a
    dead worker and recorded rc=1 instead of a number.  Probes run in a
    SUBPROCESS so a hung fetch can be abandoned without killing this
    process's runtime state.  Returns True when a probe succeeds.
    """
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                timeout=min(600, max(60, deadline - time.time())),
                capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"# bench: TPU probe {attempt} failed; waiting for worker "
              f"recovery ({int(deadline - time.time())}s left)",
              file=sys.stderr)
        time.sleep(min(120.0, max(0.0, deadline - time.time())))


def main():
    ap = argparse.ArgumentParser()
    # default = the paper's 90 s LF window point at the measured
    # batch frontier (8/32/64 -> 1733/1997/1971x on the v5e: per-frame
    # beam cost saturates at B>=32, see BENCH_SWEEP.md); --batch/--frames
    # let other geometries be re-measured without editing the driver
    # contract (no args => same JSON line)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=9000)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    from __graft_entry__ import FLAGSHIP_ENCODER, VOCAB

    from paper_accurate_fast_cheap_tpu.decode import rnnt_search
    from paper_accurate_fast_cheap_tpu.models import factory

    config = {
        "model": "transducer",
        "encoder": "conformer",
        "encoder_conf": {k: v for k, v in FLAGSHIP_ENCODER.items()
                         if k != "input_size"},
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 640, "output_size": 640,
                           "embed_dropout": 0.1, "hidden_size": 640,
                           "num_layers": 2, "dropout": 0.1},
        "joint_conf": {"join_dim": 640},
        "decoder": None,
        "model_conf": {"ctc_weight": 0.3, "transducer_weight": 0.7,
                       "attention_weight": 0.0},
    }
    model, _ = factory.init_model(config, VOCAB, 80)

    # LF operating point: batch of 90 s windows, beam 8 (paper protocol)
    B, T, BEAM = args.batch, args.frames, 8
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80)
                              ).astype(jnp.bfloat16)
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(jax.random.PRNGKey(1), feats[:1, :256].astype(
        jnp.float32), lens[:1], jnp.ones((1, 4), jnp.int32),
        jnp.asarray([4]))
    # blank-dominant output heads => realistic emission rate (~3-5
    # tokens/s; +9 suppressed emissions entirely, +2.0 gave a degenerate
    # 14/s — calibrated on CPU at this init)
    p = params["params"]
    p["joint"]["ffn_out"]["bias"] = (
        p["joint"]["ffn_out"]["bias"].at[0].add(2.5))
    p["ctc"]["ctc_lo"]["bias"] = (
        p["ctc"]["ctc_lo"]["bias"].at[0].add(2.5))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    predictor_step, joint_step, init_state_fn = \
        rnnt_search.make_transducer_step_fns(model, params)

    # encoder -> ctc log-probs as one jitted program; the beam runs as
    # its own (cached) program.  Two dispatches per iteration instead of
    # one, but the beam's OWN jit may use the VMEM-pinned pallas
    # predictor + joint kernels — pinned-weight kernels inside a single
    # whole-chain program killed the TPU worker at runtime (NOTES.md
    # round-4), so the single-dispatch form now costs MORE than the
    # round trip it saves
    @jax.jit
    def enc_chain(prm, f, l):
        enc, el = model.apply(prm, f, l, method=model.forward_encoder)
        logp = model.apply(prm, enc, method=model.ctc_logprobs)
        return enc, el, logp

    def full_chain(prm, f, l):
        enc, el, logp = enc_chain(prm, f, l)
        return rnnt_search.pack_device_beam(rnnt_search.rnnt_beam_search(
            predictor_step, joint_step, init_state_fn, enc, el, logp,
            beam_size=BEAM, ctc_weight=0.3, transducer_weight=0.7,
            impl="device", params=prm, defer=True))

    def run():
        # finalize fetches the packed beam buffer (ONE host round trip)
        # -> forces real execution of this iteration's chain (relay
        # skips unfetched programs)
        return rnnt_search.finalize_device_beam(
            full_chain(params, feats, lens), beam=BEAM)

    # warmup/compile (through the remote-TPU relay the first
    # block_until_ready can return early; the beam's host reads inside
    # run() already force real completion)
    t0 = time.perf_counter()
    res = run()
    compile_s = time.perf_counter() - t0

    # two-deep software pipeline, same as the product path
    # (`recognize_wav` dispatch/finalize overlap): batch i+1's chain is
    # dispatched before batch i's packed fetch, hiding fetch transport
    # behind device compute.  Every iteration's output IS fetched, so
    # the relay executes every chain (NOTES.md "Gotchas").
    iters = args.iters

    def timed_loop():
        t0 = time.perf_counter()
        stamps = []
        pending = full_chain(params, feats, lens)
        for _ in range(iters - 1):
            nxt = full_chain(params, feats, lens)
            r = rnnt_search.finalize_device_beam(pending, beam=BEAM)
            stamps.append(time.perf_counter())
            pending = nxt
        r = rnnt_search.finalize_device_beam(pending, beam=BEAM)
        stamps.append(time.perf_counter())
        return r, np.diff([t0] + stamps), stamps[-1] - t0

    # the shared tunnel's throughput swings up to ~1.8x WITHIN a session
    # (service-side load: a 2510x and a 1408x run 20 min apart at
    # identical code, 2026-08-20) — run the timed loop twice and report
    # the best median steady iteration as the chip-capability number;
    # every iteration of both loops is fetched/executed
    res, deltas, elapsed = timed_loop()
    res2, deltas2, elapsed2 = timed_loop()
    n_tok = float(np.mean([len(r.tokens) for r in res]))
    audio_per_iter = B * T * 0.01
    audio_seconds = iters * audio_per_iter

    def median_steady(d):
        # the first delta carries the pipeline fill -> excluded when
        # there are enough samples
        s = d[1:] if len(d) > 2 else d
        return float(np.median(s))
    best = min(median_steady(deltas), median_steady(deltas2))
    # HEADLINE = the historical definition (total elapsed / total audio
    # over every fetched iteration of both loops) so BENCH_rXX.json
    # values stay comparable across rounds; the best-median steady
    # iteration (the chip-capability figure under tunnel-load swings)
    # is reported separately in detail (ADVICE r4, medium)
    inv_rtf = 2 * audio_seconds / (elapsed + elapsed2)
    inv_rtf_best = audio_per_iter / best
    deltas = np.concatenate([deltas, deltas2])
    elapsed = elapsed + elapsed2
    print(json.dumps({
        "metric": "lf_decode_1_over_rtf",
        "value": round(inv_rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(inv_rtf / 100.0, 3),
        "detail": {
            "audio_hours_per_sec": round(inv_rtf / 3600.0, 4),
            "batch": B, "window_frames": T, "beam": BEAM,
            "iters": iters, "elapsed_s": round(elapsed, 3),
            "inv_rtf_best_median": round(inv_rtf_best, 2),
            "iter_s": [round(float(d), 3) for d in deltas],
            "mean_tokens_per_window": round(n_tok, 1),
            "compile_s": round(compile_s, 1),
            "mode": "rnnt_beam_search ctc0.3/tw0.7 (recognize_wav path)",
            "model": "conformer12x512-rwkv6-bidirectional transducer",
            "encoder_only_round2": "7695x (BENCH_SWEEP.md)",
            "device": str(jax.devices()[0]),
        },
    }))


def _outer():
    """Probe/retry supervisor: runs the measurement in a subprocess.

    The driver's contract is ONE JSON line on stdout; a transient worker
    crash (it recovers on its own) must not turn into rc=1.  Each attempt
    runs `BENCH_INNER=1 python bench.py ...`; on failure we wait for the
    worker to answer a probe again and retry.  All non-JSON inner output
    is forwarded to stderr.

    Budgets are sized to FIT THE DRIVER WINDOW (~40 min observed: round
    4's driver killed bench.py at ~2400 s with rc=124 while the old
    supervisor was still probing a dead worker).  A probe cannot
    distinguish DEAD from SLOW (2026-08-20: one tiny-matmul probe took
    91 s, the next 316 s, a third blew a 600 s budget — service-side
    load), so the probe here is a short triage only and the measurement
    is attempted EVEN IF it fails; total worst case ≈ 300 s probe +
    1800 s attempt ≈ 2100 s, then a structured failure JSON line
    instead of silence.
    """
    probe_budget = float(os.environ.get("BENCH_PROBE_BUDGET_S", "300"))
    attempt_s = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", "1800"))
    env = dict(os.environ, BENCH_INNER="1")
    t_start = time.time()
    up = _wait_for_tpu(probe_budget)
    if not up:
        print("# bench: triage probe did not answer; attempting the "
              "measurement anyway (slow-tunnel days look identical to "
              "a dead worker)", file=sys.stderr)
    last_rc = None
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env, capture_output=True, text=True,
            # covers a cold remote compile (observed 63-245 s, up to
            # ~23 min once on a bad day).  Killing a client mid-compile
            # is itself a crash trigger, but an unbounded wait broke
            # two rounds of driver benches — bounded is the lesser risk.
            timeout=attempt_s)
    except subprocess.TimeoutExpired as e:
        print("# bench: measurement attempt timed out", file=sys.stderr)
        if e.stderr:
            sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                             else e.stderr.decode(errors="replace"))
        r = None
        last_rc = "timeout"
    if r is not None:
        json_line = None
        for line in (r.stdout or "").splitlines():
            if line.startswith("{") and '"metric"' in line:
                json_line = line
        if r.stderr:
            sys.stderr.write(r.stderr)
        if r.returncode == 0 and json_line:
            print(json_line)
            return
        last_rc = r.returncode
        print(f"# bench: attempt failed (rc={r.returncode})",
              file=sys.stderr)
    print(json.dumps({
        "metric": "lf_decode_1_over_rtf", "value": None,
        "unit": "x_realtime_per_chip", "vs_baseline": None,
        "detail": {"error": "bench_attempt_failed",
                   "probe_answered": bool(up), "last_rc": last_rc,
                   "elapsed_s": round(time.time() - t_start, 1)},
    }))
    sys.exit(1)


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER"):
        main()
    else:
        _outer()
