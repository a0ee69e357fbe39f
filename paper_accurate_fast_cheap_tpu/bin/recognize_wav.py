"""Long-form single-wav decoding CLI -> CTM (+ RTF log).

Parity target: `wenet/bin/recognize_wav2.py` — fbank the whole file
(`:493-520`), window into `--chunk_size` frames x `--batch_size`
(`:323-351`, zero-padded tail), decode each window full-context (`:443-460`),
emit CTM with token->word timing from CTC alignment (`:523-552`, using the
release-missing ctc_align semantics), write `.rtf` timing log (`:481-489`).
"""
from __future__ import annotations

import argparse
import functools
import logging
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="long-form wav decode")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--wav", required=True, help="input wav file")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--mode", default="ctc_greedy_search",
                   choices=["ctc_greedy_search", "ctc_prefix_beam_search",
                            "rnnt_beam_search"])
    p.add_argument("--chunk_size", type=int, default=2051,
                   help="window length in fbank frames")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--beam_size", type=int, default=8)
    p.add_argument("--ctc_weight", type=float, default=0.3)
    p.add_argument("--transducer_weight", type=float, default=0.7)
    # the paper's LF protocol flags (`recognize_wav2.py:365-366,426-429`)
    p.add_argument("--rwkv_r", type=int, default=0,
                   help="rwkv_ctx_len override; the reference recompiles "
                        "its CUDA kernel for this T — the TPU kernel is "
                        "length-agnostic so this only updates the config")
    p.add_argument("--verbatimicity", type=float, default=None,
                   help="cat_embs = [v, 1-v] conditioning (LSL encoders)")
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "fp32"],
                   help="decode compute dtype. bf16 mirrors the paper's "
                        "fp16 LF decode protocol (`recognize_wav2.py` "
                        "--fp16) and is ~50x faster on the MXU; fp32 for "
                        "bit-exact parity checks")
    p.add_argument("--wkv_impl", default=None,
                   choices=["pallas", "chunked"],
                   help="override the WKV kernel path (decode default: "
                        "pallas; chunked = the XLA chunked formulation)")
    p.add_argument("--encoder_context_size", type=int, default=0,
                   help="switch self-attention to LCA with this context")
    p.add_argument("--encoder_global_tokens", type=int, default=0)
    p.add_argument("--encoder_global_tokens_spacing", type=int, default=1)
    p.add_argument("--fuse", default="auto",
                   choices=["auto", "on", "split", "off"],
                   help="fuse the whole per-batch device chain (window "
                        "slice -> fbank -> encoder -> ctc -> beam scan -> "
                        "top-hypothesis Viterbi alignment) into ONE "
                        "dispatched XLA program (rnnt_beam_search only). "
                        "Through a high-latency transport each dispatch "
                        "costs a round trip; fusing removes both the "
                        "inter-program gaps and the beam-fetch -> "
                        "align-dispatch serialization (4.2x steady-state "
                        "on the tunnel-attached v5e). 'auto' (default) "
                        "fuses when eligible and silently falls back "
                        "otherwise; fp32 fused == unfused exactly "
                        "(TPU-verified), bf16 may differ by rounding at "
                        "fusion boundaries")
    p.add_argument("--beam_unroll", type=int, default=1,
                   help="lax.scan unroll factor for the device beam "
                        "(amortizes per-frame loop overhead; compile "
                        "time grows with it)")
    p.add_argument("--beam_merge", default="pairwise",
                   choices=["sort", "pairwise"],
                   help="device-beam duplicate-merge impl (pairwise = "
                        "sort-free walk, see rnnt_search)")
    p.add_argument("--align_max_tokens", type=int, default=0,
                   help="fused-chain alignment state budget (top "
                        "hypothesis longer than this falls back to the "
                        "two-step align). 0 = auto: max(64, chunk/16) "
                        "tokens, ~2.5x real speech rate")
    p.add_argument("--seq_parallel", type=int, default=0,
                   help="shard each window's TIME axis over this many "
                        "devices (sequence-parallel encoder: halo'd ds4 "
                        "frontend + sp WKV/conv; rwkv/mamba models "
                        "only). chunk_size must divide by 4*N. The "
                        "window is decoded as if zero-padded by the "
                        "ds4 right context (6 frames) with unmasked "
                        "full-length semantics — see "
                        "tests/test_sequence_parallel.py for the "
                        "exactness contract")
    return p.parse_args(argv)


def window_batches(wav_len: int, chunk: int, batch: int,
                   frame_shift: int = 160, frame_length: int = 400):
    """Waveform -> batches of fixed-size SAMPLE window offsets, one per
    ``chunk``-frame fbank window + valid sample lengths.

    Windowing happens in the sample domain so the fbank front-end runs
    per batch at ONE static shape — featurizing the whole file first
    compiles a fresh XLA program per distinct audio length (minutes
    through a remote compile service) and serializes a full-length
    feature fetch.  Frame ``i`` of window ``s`` covers samples
    ``[(s+i)*shift, (s+i)*shift + length)`` — exactly the frames the
    whole-file fbank would produce, so hypotheses are bit-identical.

    Only OFFSETS are yielded: the waveform itself is uploaded to the
    device once and windows are sliced there (`_window_slice`) — a
    per-batch (B, win_samples) host upload costs ~20 s through the
    tunnel transport at LF sizes and dominated steady-state RTF.

    The LAST group is padded up to the full ``batch`` rows (length 0 —
    masked everywhere downstream) so every iteration presents one static
    shape to XLA: a ragged tail batch would trigger a full second
    compile of the encoder + beam programs.  ``group`` carries the real
    window start offsets in FRAMES (for CTM timing).
    """
    total_frames = max(0, (wav_len - frame_length) // frame_shift + 1)
    win_samples = (chunk - 1) * frame_shift + frame_length
    starts = list(range(0, max(total_frames, 1), chunk))
    for i in range(0, len(starts), batch):
        group = starts[i : i + batch]
        s0 = np.zeros((batch,), np.int32)
        lens = np.zeros((batch,), np.int32)
        for j, s in enumerate(group):
            s0[j] = s * frame_shift
            lens[j] = max(0, min(win_samples, wav_len - s0[j]))
        yield group, s0, lens


def make_window_slicer(wav: np.ndarray, win_samples: int):
    """Upload the waveform once; return a jitted (starts (B,)) ->
    (B, win_samples) device windower (zero-padded past the end).

    The waveform buffer is a runtime ARGUMENT of the jitted slice, not a
    closure capture: captured concrete arrays become HLO constants, and
    re-baking an hours-long waveform into the program blows the remote
    compiler's request-size limit (HTTP 413 through the relay).  Callers
    that embed the slice inside a larger jit must do the same — use
    ``.func``/``.args[0]`` of the returned partial to thread the buffer
    through as an argument (the fused chain below does)."""
    wav_dev = jnp.asarray(np.pad(wav, (0, win_samples)))

    @jax.jit
    def slice_fn(w, starts):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(w, (s,), (win_samples,))
        )(starts)

    return functools.partial(slice_fn, wav_dev)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    from paper_accurate_fast_cheap_tpu.bin.recognize import (
        build_decode_assets,
    )
    from paper_accurate_fast_cheap_tpu.data.pipeline import (
        _read_audio_bytes,
    )
    from paper_accurate_fast_cheap_tpu.decode import rnnt_search, search
    from paper_accurate_fast_cheap_tpu.ops import ctc_utils
    from paper_accurate_fast_cheap_tpu.utils import jitting
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    enc_conf = dict(config.get("encoder_conf", {}))
    if args.rwkv_r:
        enc_conf["rwkv_ctx_len"] = args.rwkv_r
        logging.info("rwkv_ctx_len override %d (length-agnostic on TPU)",
                     args.rwkv_r)
    if args.wkv_impl:
        enc_conf["wkv_impl"] = args.wkv_impl
    if args.encoder_context_size > 0:
        enc_conf["selfattention_layer_type"] = "limited_rel_selfattn"
        enc_conf["att_context_size"] = [args.encoder_context_size,
                                        args.encoder_context_size]
        enc_conf["global_tokens"] = args.encoder_global_tokens
        enc_conf["global_tokens_spacing"] = \
            args.encoder_global_tokens_spacing
    config = dict(config, encoder_conf=enc_conf)
    tokenizer, model, model_type, params, featurize, dataset_conf = \
        build_decode_assets(config, args.checkpoint)
    if args.precision == "bf16":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
    cat_embs = None
    if args.verbatimicity is not None:
        cat_embs = jnp.asarray(
            [[args.verbatimicity, 1.0 - args.verbatimicity]])

    with open(args.wav, "rb") as f:
        wav, sr = _read_audio_bytes(f.read())
    if sr != 16000:
        from scipy.signal import resample_poly

        g = np.gcd(sr, 16000)
        wav = resample_poly(wav, 16000 // g, sr // g).astype(np.float32)
        sr = 16000
    audio_seconds = len(wav) / sr

    fb = dataset_conf.get("fbank_conf", {})
    frame_shift = int(fb.get("frame_shift", 10)) * (16000 // 1000)
    frame_length = int(fb.get("frame_length", 25)) * (16000 // 1000)
    t_start = time.perf_counter()

    name = os.path.splitext(os.path.basename(args.wav))[0]
    os.makedirs(args.output_dir, exist_ok=True)
    subsample = 4  # conv2d ds4; frame rate after encoder = 0.04 s

    if model_type == "transducer" and args.mode == "rnnt_beam_search":
        predictor_step, joint_step, init_state_fn = \
            rnnt_search.make_transducer_step_fns(model, params)

    if args.seq_parallel > 1:
        if cat_embs is not None:
            raise SystemExit("--seq_parallel with cat_embs not supported")
        n = args.seq_parallel
        if jax.device_count() < n:
            raise SystemExit(f"--seq_parallel {n} needs {n} devices "
                             f"(have {jax.device_count()})")
        if args.chunk_size % (4 * n):
            raise SystemExit(f"--chunk_size must divide by 4*{n}")
        from jax.sharding import Mesh, PartitionSpec as P

        smesh = Mesh(np.array(jax.devices()[:n]), ("seq",))
        sp_config = dict(config)
        sp_enc = dict(sp_config.get("encoder_conf", {}))
        sp_enc["rwkv_conf"] = dict(sp_enc.get("rwkv_conf") or {},
                                   spmd_axis="seq")
        sp_config["encoder_conf"] = sp_enc
        from paper_accurate_fast_cheap_tpu.models import factory as _fac

        sp_model, _ = _fac.init_model(sp_config, tokenizer.vocab_size(),
                                      int(fb.get("num_mel_bins", 80)))

        @functools.partial(jax.shard_map, mesh=smesh,
                           in_specs=(P(), P(None, "seq"), P()),
                           out_specs=(P(None, "seq"), P()),
                           check_vma=False)
        def _sp_fwd(p, f, l):
            return sp_model.apply(p, f, l,
                                  method=sp_model.forward_encoder)

        from jax.sharding import NamedSharding

        # params ride as program inputs: commit them replicated over the
        # sp mesh (a single-device arg is incompatible with the mesh jit);
        # downstream consumers (ctc head, beam) see the sharded encoder
        # output, so they need the replicated copy too
        params = jax.device_put(params, NamedSharding(smesh, P()))
        fwd = functools.partial(jax.jit(_sp_fwd), params)
        logging.info("sequence-parallel decode: T sharded over %d "
                     "devices", n)
    elif cat_embs is not None:
        fwd = functools.partial(jax.jit(
            lambda p, f, l: model.apply(
                p, f, l,
                cat_embs=jnp.broadcast_to(cat_embs,
                                          (f.shape[0], cat_embs.shape[1])),
                method=model.forward_encoder)), params)
    else:
        fwd = jitting.jit_apply(model, params,
                                method=model.forward_encoder)
    ctc_fn = jitting.jit_apply(model, params, method=model.ctc_logprobs)

    ctm_lines = []
    all_text = []
    batch_done = []       # wall clock when each batch's results landed
    batch_audio = []      # decoded audio seconds per batch
    win_samples = (args.chunk_size - 1) * frame_shift + frame_length
    window_slice = make_window_slicer(wav, win_samples)

    fusable = (args.mode == "rnnt_beam_search"
               and model_type == "transducer" and args.seq_parallel <= 1)
    # "on"/"auto": ONE jitted program per batch (window slice -> fbank ->
    # encoder -> ctc -> beam -> align).  "split": the beam runs as its
    # own cached program OUTSIDE the chain jit — only that form may use
    # the VMEM-pinned pallas predictor/joint kernels (pinned kernels
    # inside an enclosing jit killed the TPU worker, NOTES.md round-4),
    # trading one extra dispatch per batch for a ~25% faster beam scan.
    # measured crossover on the 3 h episode (2026-08-20): batch 8 x
    # 200 s windows -> chain 526x vs split 380x (dispatch overhead
    # dominates a narrow beam); batch 64 x 25 s -> split 1754x vs chain
    # 1363x (the pinned kernels win once the beam is wide).  auto picks
    # by batch width.
    _req = args.fuse
    if _req == "auto":
        # split (own-program beam: VMEM-pinned kernels + deferred
        # bucketed align) won BOTH geometry extremes in same-day A/Bs:
        # frontier 64 x 25 s -> 1754x vs chain 1363x (2026-08-20), and
        # protocol 8 x 200 s -> 607-630x vs chain 528-529x (2026-08-21;
        # r4's chain-wins-at-narrow-batch reading was a meter artifact).
        # chain remains for tiny batches where its single dispatch is
        # the only overlap available.
        _req = "split" if args.batch_size >= 8 else "on"
    fuse = "chain" if (_req == "on" and fusable) else (
        "split" if (_req == "split" and fusable) else "off")
    if args.fuse in ("on", "split") and fuse == "off":
        logging.warning("--fuse requires rnnt_beam_search on a "
                        "transducer without --seq_parallel; ignoring")
    if fuse in ("chain", "split"):
        align_lmax = (args.align_max_tokens
                      or max(64, args.chunk_size // 16))
    if fuse == "split":
        def _enc_chain(p, wav_buf, starts, slens_d):
            swins = window_slice.func(wav_buf, starts)
            feats, feat_lens = featurize(swins, slens_d, train=False)
            if args.precision == "bf16":
                feats = feats.astype(jnp.bfloat16)
            enc, enc_lens = fwd.func(p, feats, feat_lens)
            logp = ctc_fn.func(p, enc)
            return enc, enc_lens, logp

        enc_chain = functools.partial(jax.jit(_enc_chain), params)
    if fuse == "chain":
        # params MUST ride as a runtime argument of the fused program:
        # calling the partial-bound `fwd`/`ctc_fn` inside this trace
        # would bake the whole param dict into the HLO as literals
        # (~600 MB fp32 -> HTTP 413 on the remote-compile relay; see
        # utils/jitting.py).  `.func` is the underlying (params, ...)
        # jitted apply.
        def _chain(p, wav_buf, starts, slens_d):
            swins = window_slice.func(wav_buf, starts)
            feats, feat_lens = featurize(swins, slens_d, train=False)
            if args.precision == "bf16":
                feats = feats.astype(jnp.bfloat16)
            enc, enc_lens = fwd.func(p, feats, feat_lens)
            logp = ctc_fn.func(p, enc)
            out = rnnt_search.rnnt_beam_search(
                predictor_step, joint_step, init_state_fn, enc,
                enc_lens, logp, beam_size=args.beam_size,
                ctc_weight=args.ctc_weight,
                transducer_weight=args.transducer_weight,
                params=p, defer=True, unroll=args.beam_unroll,
                merge=args.beam_merge,
            )
            path, ok = ctc_utils.force_align_device_tokens(
                logp, enc_lens, out["hyps"][:, 0, :align_lmax],
                out["hyp_len"][:, 0], unroll=8,
            )
            # ONE packed buffer: beam + align path + ok + lens -> the
            # whole batch materializes in a single fetch
            return logp, rnnt_search.pack_device_beam_aligned(
                out, path, ok, enc_lens)

        chain = functools.partial(jax.jit(_chain), params)

    def finalize(entry):
        """Materialize one dispatched batch: fetch, search-finalize,
        align, CTM."""
        group, slens, enc_lens, logp, payload, aligned_buf = entry
        path = None
        if aligned_buf is not None:
            # fused modes: beam + Viterbi path + ok + lens in ONE fetch
            res, path_np, ok_np, lens_np = \
                rnnt_search.finalize_device_beam_aligned(
                    aligned_buf, beam=args.beam_size)
        else:
            lens_np = np.asarray(enc_lens)
            if args.mode == "rnnt_beam_search":
                res = rnnt_search.finalize_device_beam(
                    payload, beam=args.beam_size)
            elif args.mode == "ctc_greedy_search":
                res = search.ctc_greedy_search(np.asarray(logp), lens_np)
            else:
                res = search.ctc_prefix_beam_search(
                    np.asarray(logp), lens_np, beam_size=args.beam_size)
        # token timing: one batched on-device Viterbi per window batch
        # (the host aligner costs seconds/row at LF window sizes)
        need_align = [b for b, r in enumerate(res)
                      if r.tokens and not (r.times
                                           and len(r.times)
                                           == len(r.tokens))]
        alis = {}
        if need_align and aligned_buf is not None:
            # fused modes already aligned the top hypothesis on device
            fused_rows = [b for b in need_align if ok_np[b]]
            for b in fused_rows:
                alis[b] = [int(x) for x in path_np[b, : lens_np[b]]]
            need_align = [b for b in need_align if not ok_np[b]]
        if need_align:
            batch_ali = ctc_utils.force_align_batch_device(
                logp, lens_np, [res[b].tokens if b in need_align else []
                                for b in range(len(res))])
            alis.update({b: batch_ali[b] for b in need_align})
        for start_frame, r, b in zip(group, res, range(len(res))):
            if not r.tokens:
                continue
            if r.times and len(r.times) == len(r.tokens):
                peaks = r.times
            else:
                spans = ctc_utils.alignment_to_token_spans(alis[b])
                peaks = [s[1] for s in spans]
            offset_sec = start_frame * 0.01
            times = ctc_utils.gen_timestamps_from_peak(
                peaks, max_duration=lens_np[b] * subsample * 0.01,
                frame_rate=subsample * 0.01,
            )
            toks = tokenizer.ids2tokens(r.tokens)
            # merge subword pieces into words at '▁' boundaries for CTM
            words, word_times = _pieces_to_words(toks, times)
            for w, (ts, te) in zip(words, word_times):
                ctm_lines.append(
                    f"{name} 1 {offset_sec + ts:.2f} {te - ts:.2f} {w}"
                )
            text, _ = tokenizer.detokenize(r.tokens)
            all_text.append(text)
        batch_done.append(time.perf_counter())
        batch_audio.append(float(np.sum(slens)) / 16000.0)

    # two-deep software pipeline: dispatch batch i+1's device chain
    # (slice -> fbank -> encoder -> ctc -> beam scan, no host reads)
    # BEFORE finalizing batch i, so per-dispatch transport latency and
    # host-side CTM work overlap with device compute
    pending = None
    for group, s0, slens in window_batches(len(wav), args.chunk_size,
                                           args.batch_size,
                                           frame_shift, frame_length):
        if fuse == "chain":
            logp, buf = chain(
                window_slice.args[0], jnp.asarray(s0),
                jnp.asarray(slens))
            entry = (group, slens, None, logp, None, buf)
        elif fuse == "split":
            enc, enc_lens, logp = enc_chain(
                window_slice.args[0], jnp.asarray(s0),
                jnp.asarray(slens))
            # PAFC_SPLIT_ALIGN_PACK=1 folds the Viterbi align + packing
            # INTO the beam's own cached program (1 fetch/batch).
            # Measured A/B at the protocol point (8 x 200 s windows,
            # 2026-08-21): inline worst-case align COSTS ~1 s/batch
            # (497x packed vs 607-630x deferred; unroll8 502x, Lmax 512
            # 543x) while the deferred bucketed align dispatch overlaps
            # with the next batch's device work and sizes Sp to the
            # ACTUAL hypothesis length — so deferred is the default.
            _ap = (align_lmax if os.environ.get(
                "PAFC_SPLIT_ALIGN_PACK", "0") != "0" else 0)
            buf = rnnt_search.rnnt_beam_search(
                predictor_step, joint_step, init_state_fn, enc,
                enc_lens, logp, beam_size=args.beam_size,
                ctc_weight=args.ctc_weight,
                transducer_weight=args.transducer_weight,
                params=params, defer=True,
                unroll=args.beam_unroll, merge=args.beam_merge,
                align_pack=_ap,
            )
            if _ap:
                entry = (group, slens, None, logp, None, buf)
            else:
                entry = (group, slens, enc_lens, logp, buf, None)
        else:
            swins = window_slice(jnp.asarray(s0))
            feats, feat_lens = featurize(swins, jnp.asarray(slens),
                                         train=False)
            if args.precision == "bf16":
                feats = feats.astype(jnp.bfloat16)
            enc, enc_lens = fwd(feats, feat_lens)
            logp = ctc_fn(enc)
            if args.mode == "rnnt_beam_search":
                payload = rnnt_search.rnnt_beam_search(
                    predictor_step, joint_step, init_state_fn, enc,
                    enc_lens, logp, beam_size=args.beam_size,
                    ctc_weight=args.ctc_weight,
                    transducer_weight=args.transducer_weight,
                    params=params, defer=True,
                    unroll=args.beam_unroll, merge=args.beam_merge,
                )
            else:
                payload = None
            entry = (group, slens, enc_lens, logp, payload, None)
        if pending is not None:
            finalize(pending)
        pending = entry
    if pending is not None:
        finalize(pending)

    elapsed = time.perf_counter() - t_start
    rtf = elapsed / max(audio_seconds, 1e-9)
    # steady-state RTF over post-compile batches: the first window batch
    # carries the XLA compile of the encoder + beam programs (minutes
    # through the remote compile service), which a production decoder
    # amortizes over a whole dataset — `recognize_wav2.py:481-489` logs
    # its .rtf the same way after its CUDA warmup pass.  With the
    # software pipeline, per-batch wall times are the gaps between
    # successive result landings.
    batch_times = [batch_done[0] - t_start] + [
        batch_done[i] - batch_done[i - 1]
        for i in range(1, len(batch_done))]
    if len(batch_done) > 1:
        steady_rtf = ((batch_done[-1] - batch_done[0])
                      / max(sum(batch_audio[1:]), 1e-9))
        # median per-batch RTF is robust to transient tunnel hiccups
        # (observed: one 12 s stall amid 2 s batches); steady_rtf stays
        # the honest mean — diverging median flags a polluted run
        per_batch = sorted(t / max(a, 1e-9) for t, a in
                           zip(batch_times[1:], batch_audio[1:]))
        median_rtf = per_batch[len(per_batch) // 2]
    else:
        steady_rtf = rtf
        median_rtf = rtf
    with open(os.path.join(args.output_dir, name + ".ctm"), "w") as f:
        f.write("\n".join(ctm_lines) + ("\n" if ctm_lines else ""))
    with open(os.path.join(args.output_dir, name + ".txt"), "w") as f:
        f.write(" ".join(all_text) + "\n")
    with open(os.path.join(args.output_dir, name + ".rtf"), "w") as f:
        f.write(f"final_rtf {rtf:.6f} elapsed {elapsed:.3f} "
                f"audio_seconds {audio_seconds:.2f}\n")
        f.write(f"steady_rtf {steady_rtf:.6f}\n")
        f.write(f"median_rtf {median_rtf:.6f}\n")
        f.write("batch_times " +
                " ".join(f"{t:.3f}" for t in batch_times) + "\n")
        f.write("batch_audio " +
                " ".join(f"{a:.1f}" for a in batch_audio) + "\n")
    # device-memory log (`recognize_wav2.py:44-95` GpuMemoryMonitor role)
    from paper_accurate_fast_cheap_tpu.utils.profiling import (
        device_memory_stats,
    )

    stats = device_memory_stats()
    with open(os.path.join(args.output_dir, name + ".vram"), "w") as f:
        for k2, v2 in stats.items():
            f.write(f"{k2} {v2:.1f}\n")
    logging.info("decoded %s: %.1fs audio in %.2fs (RTF %.4f, steady "
                 "%.4f = %.0fx realtime)", name, audio_seconds, elapsed,
                 rtf, steady_rtf, 1.0 / max(steady_rtf, 1e-9))
    return 0


def _pieces_to_words(pieces, times):
    """Merge sentencepiece pieces into words with merged time spans."""
    words, spans = [], []
    cur, ts, te = "", None, None
    for p, (a, b) in zip(pieces, times):
        starts_word = p.startswith("▁")
        text = p.replace("▁", "")
        if starts_word and cur:
            words.append(cur)
            spans.append((ts, te))
            cur, ts = "", None
        if not cur:
            ts = a
        cur += text
        te = b
    if cur:
        words.append(cur)
        spans.append((ts, te))
    # drop empties (pure '▁' pieces)
    out = [(w, s) for w, s in zip(words, spans) if w]
    if not out:
        return [], []
    ws, ss = zip(*out)
    return list(ws), list(ss)


if __name__ == "__main__":
    sys.exit(main())
