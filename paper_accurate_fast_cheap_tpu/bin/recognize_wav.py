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
    p.add_argument("--wkv_impl", default=None,
                   choices=["pallas", "xla"],
                   help="override the WKV kernel path (decode default: "
                        "pallas; xla = the chunked associative-scan "
                        "formulation)")
    p.add_argument("--encoder_context_size", type=int, default=0,
                   help="switch self-attention to LCA with this context")
    p.add_argument("--encoder_global_tokens", type=int, default=0)
    p.add_argument("--encoder_global_tokens_spacing", type=int, default=1)
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


def window_batches(feats: np.ndarray, chunk: int, batch: int):
    """(T, D) -> batches of (batch, chunk, D) windows + valid lengths.

    The LAST group is padded up to the full ``batch`` rows (length 0 —
    masked everywhere downstream) so every iteration presents one static
    shape to XLA: a ragged tail batch would trigger a full second
    compile of the encoder + beam programs (minutes on first use).
    ``group`` carries only the real window start offsets.
    """
    T = feats.shape[0]
    starts = list(range(0, max(T, 1), chunk))
    for i in range(0, len(starts), batch):
        group = starts[i : i + batch]
        out = np.zeros((batch, chunk, feats.shape[1]), np.float32)
        lens = np.zeros((batch,), np.int32)
        for j, s in enumerate(group):
            n = min(chunk, T - s)
            out[j, :n] = feats[s : s + n]
            lens[j] = n
        yield group, out, lens


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

    t_start = time.perf_counter()
    feats, feat_lens = featurize(
        jnp.asarray(wav[None, :]), jnp.asarray([len(wav)]), train=False
    )
    feats_np = np.asarray(feats[0][: int(feat_lens[0])])

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
                                      feats_np.shape[-1])

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
    for group, wins, lens in window_batches(feats_np, args.chunk_size,
                                            args.batch_size):
        enc, enc_lens = fwd(jnp.asarray(wins), jnp.asarray(lens))
        logp = ctc_fn(enc)
        lens_np = np.asarray(enc_lens)
        # rnnt mode never needs the full-vocab posteriors on host — the
        # beam runs on device and timing only reads the hypothesis'
        # columns (gathered below).  At LF shapes the full fetch is
        # (B, T/4, V) ~ 400 MB/window-batch, which dominates wall clock
        # through the device transport.
        logp_np = (None if args.mode == "rnnt_beam_search"
                   else np.asarray(logp))
        if args.mode == "ctc_greedy_search":
            res = search.ctc_greedy_search(logp_np, lens_np)
        elif args.mode == "ctc_prefix_beam_search":
            res = search.ctc_prefix_beam_search(logp_np, lens_np,
                                                beam_size=args.beam_size)
        else:
            res = rnnt_search.rnnt_beam_search(
                predictor_step, joint_step, init_state_fn, enc, enc_lens,
                logp, beam_size=args.beam_size,
                ctc_weight=args.ctc_weight,
                transducer_weight=args.transducer_weight,
                params=params,
            )
        for start_frame, r, b in zip(group, res, range(len(res))):
            if not r.tokens:
                continue
            # token times: decode modes with peak times use them, otherwise
            # force-align the window's CTC posteriors to the hypothesis
            if r.times and len(r.times) == len(r.tokens):
                peaks = r.times
            elif logp_np is None:
                # gather only {blank} + hypothesis columns on device
                # (force_align reads no others); remap ids — alignment
                # structure (incl. same-label skip rules) is preserved
                cols = np.unique(np.asarray([0] + r.tokens, np.int64))
                remap = {int(c): i for i, c in enumerate(cols)}
                sub = np.asarray(jnp.take(
                    logp[b, : int(lens_np[b])], jnp.asarray(cols), axis=-1))
                ali = ctc_utils.force_align(
                    sub, [remap[t] for t in r.tokens], blank_id=remap[0])
                spans = ctc_utils.alignment_to_token_spans(
                    ali, blank_id=remap[0])
                peaks = [s[1] for s in spans]
            else:
                ali = ctc_utils.force_align(
                    logp_np[b, : lens_np[b]], r.tokens)
                spans = ctc_utils.alignment_to_token_spans(ali)
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

    elapsed = time.perf_counter() - t_start
    rtf = elapsed / max(audio_seconds, 1e-9)
    with open(os.path.join(args.output_dir, name + ".ctm"), "w") as f:
        f.write("\n".join(ctm_lines) + ("\n" if ctm_lines else ""))
    with open(os.path.join(args.output_dir, name + ".txt"), "w") as f:
        f.write(" ".join(all_text) + "\n")
    with open(os.path.join(args.output_dir, name + ".rtf"), "w") as f:
        f.write(f"final_rtf {rtf:.6f} elapsed {elapsed:.3f} "
                f"audio_seconds {audio_seconds:.2f}\n")
    # device-memory log (`recognize_wav2.py:44-95` GpuMemoryMonitor role)
    from paper_accurate_fast_cheap_tpu.utils.profiling import (
        device_memory_stats,
    )

    stats = device_memory_stats()
    with open(os.path.join(args.output_dir, name + ".vram"), "w") as f:
        for k2, v2 in stats.items():
            f.write(f"{k2} {v2:.1f}\n")
    logging.info("decoded %s: %.1fs audio in %.2fs (RTF %.4f)", name,
                 audio_seconds, elapsed, rtf)
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
