"""Extract Kaldi fbank features from a wav.scp (+ optional segments) into
Kaldi ark/scp files.

Parity target: `tools/compute_fbank_feats.py` (torchaudio kaldi fbank →
`kaldi_io.write_ark_scp`).  TPU-first: features come from the jitted
`frontend.features.fbank` (batched on device when many files share a
shape bucket would be possible, but this offline tool keeps the simple
per-file loop); int16 scaling matches the reference's
`processor.py:361` convention.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="compute fbank ark/scp")
    p.add_argument("wav_scp", help="'key wav_path' per line")
    p.add_argument("out_ark")
    p.add_argument("out_scp")
    p.add_argument("--segments", default=None,
                   help="'key wav_key start end' per line")
    p.add_argument("--num_mel_bins", type=int, default=80)
    p.add_argument("--frame_length", type=int, default=25,
                   help="milliseconds")
    p.add_argument("--frame_shift", type=int, default=10,
                   help="milliseconds")
    p.add_argument("--dither", type=float, default=0.0)
    return p.parse_args(argv)


def load_wav_scp(path):
    out = []
    with open(path, encoding="utf8") as fin:
        for line in fin:
            arr = line.strip().split()
            if not arr:
                continue
            assert len(arr) == 2, line
            out.append((arr[0], arr[1]))
    return out


def load_wav_segments(wav_scp, segments):
    wav_dict = dict(load_wav_scp(wav_scp))
    out = []
    with open(segments, encoding="utf8") as fin:
        for line in fin:
            arr = line.strip().split()
            if not arr:
                continue
            assert len(arr) == 4, line
            out.append((arr[0], wav_dict[arr[1]], float(arr[2]),
                        float(arr[3])))
    return out


def main(argv=None):
    args = get_args(argv)
    import jax

    from paper_accurate_fast_cheap_tpu.data import kaldi_io
    from paper_accurate_fast_cheap_tpu.data.pipeline import _decode_one
    from paper_accurate_fast_cheap_tpu.frontend import features

    if args.segments is None:
        items = [(k, p, None, None) for k, p in load_wav_scp(args.wav_scp)]
    else:
        items = load_wav_segments(args.wav_scp, args.segments)

    rng = jax.random.PRNGKey(0)
    mats = {}
    for key, path, start, end in items:
        sample = {"key": key, "wav": path}
        if start is not None:
            sample["start"], sample["end"] = start, end
        s = _decode_one(sample)
        sr = s["sample_rate"]
        wav = np.asarray(s["wav"], np.float32) * 32768.0
        rng, sub = jax.random.split(rng)
        mat = features.fbank(
            wav,
            num_mel_bins=args.num_mel_bins,
            frame_length=args.frame_length * sr // 1000,
            frame_shift=args.frame_shift * sr // 1000,
            sample_rate=sr,
            dither=args.dither,
            rng=sub if args.dither > 0 else None,
        )
        mats[key] = np.asarray(mat, np.float32)
    kaldi_io.write_ark_scp(args.out_ark, mats, args.out_scp)
    print(f"wrote {len(mats)} feature matrices to {args.out_ark}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
