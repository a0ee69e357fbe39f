"""CTC forced-alignment CLI.

Parity target: the reference's alignment pipeline `tools/alignment.sh`
(its `wenet/bin/alignment.py` binary is absent from the release, like
`decoder.py`; the capability is reconstructed from the harness contract:
raw-list input of {key, wav, txt}, CTC Viterbi alignment, per-token
timing output).  Produces token-level CTM lines (and optional per-frame
best-path dumps) from `ops/ctc_utils.force_align`.

Usage:
  python -m paper_accurate_fast_cheap_tpu.bin.align \
      --config exp/train.yaml --checkpoint exp/avg \
      --input_data data/test/raw.jsonl --output ali.ctm
"""
from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="CTC forced alignment")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input_data", required=True,
                   help="raw jsonl list: {key, wav, txt} per line")
    p.add_argument("--output", required=True, help="CTM output path")
    p.add_argument("--frames_path", default=None,
                   help="optional per-frame best-path dump (key id id ...)")
    p.add_argument("--frame_rate", type=float, default=0.04,
                   help="seconds per encoder frame (ds4 => 0.04)")
    p.add_argument("--max_token_duration", type=float, default=1.0)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    import jax.numpy as jnp

    from paper_accurate_fast_cheap_tpu.bin.recognize import (
        build_decode_assets,
    )
    from paper_accurate_fast_cheap_tpu.data.pipeline import _read_audio_bytes
    from paper_accurate_fast_cheap_tpu.ops import ctc_utils
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    tokenizer, model, model_type, params, featurize, _ = \
        build_decode_assets(config, args.checkpoint)

    n_done = 0
    frames_f = open(args.frames_path, "w") if args.frames_path else None
    with open(args.output, "w") as out:
        for line in open(args.input_data, encoding="utf-8"):
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            key, txt = obj["key"], obj["txt"]
            with open(obj["wav"], "rb") as f:
                wav, sr = _read_audio_bytes(f.read())
            if sr != 16000:
                from scipy.signal import resample_poly

                g = np.gcd(int(sr), 16000)
                wav = resample_poly(wav, 16000 // g, int(sr) // g)
            wav = np.asarray(wav, np.float32)
            tokens, ids = tokenizer.tokenize(txt)
            if not ids:
                logging.warning("%s: empty transcript, skipped", key)
                continue
            feats, feat_lens = featurize(
                jnp.asarray(wav[None]), jnp.asarray([len(wav)]),
                train=False)
            enc, enc_lens = model.apply(
                params, feats, feat_lens, method=model.forward_encoder)
            logp = np.asarray(model.apply(params, enc,
                                          method=model.ctc_logprobs))[0]
            T = int(np.asarray(enc_lens)[0])
            path = ctc_utils.force_align(logp[:T], ids)
            if frames_f:
                frames_f.write(key + " " +
                               " ".join(str(int(t)) for t in path) + "\n")
            # token peaks = first frame of each non-blank run
            peaks = []
            prev = 0
            for t, tok in enumerate(path):
                if tok != 0 and tok != prev:
                    peaks.append(t)
                prev = tok
            times = ctc_utils.gen_timestamps_from_peak(
                peaks, max_duration=T * args.frame_rate,
                frame_rate=args.frame_rate,
                max_token_duration=args.max_token_duration)
            for tok_txt, (beg, end) in zip(tokens, times):
                out.write(f"{key} 1 {beg:.2f} {end - beg:.2f} {tok_txt}\n")
            n_done += 1
    if frames_f:
        frames_f.close()
    logging.info("aligned %d utterances -> %s", n_done, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
