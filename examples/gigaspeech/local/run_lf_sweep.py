#!/usr/bin/env python
"""Long-form WER chunk-size sweep — one command reproducing the shape of
the reference harness `examples/gigaspeech/s0/local/
go-LF-dev-one-model-paper.sh:90-124` + `gigaspeech_scoring_longform.py`:

  per chunk size in {2000,4000,9000,15000,20000,40000} fbank frames:
    every wav/flac in --wav_dir -> bin/recognize_wav (windows -> CTM/.txt
    + .rtf/.vram logs, with the paper's --rwkv_r / --verbatimicity flags)
  then score each file's hypothesis against <name>.ref_txt in --ref_dir
  (GigaSpeech text filtering) and aggregate a summary.txt per chunk size
  plus a top-level sweep table.
"""
import argparse
import glob
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "../../.."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PAPER_CHUNKS = "2000,4000,9000,15000,20000,40000"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--wav_dir", required=True,
                   help="directory of .wav/.flac episode files")
    p.add_argument("--ref_dir", default=None,
                   help="directory of <name>.ref_txt references "
                        "(default: --wav_dir)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--chunk_sizes", default=PAPER_CHUNKS)
    p.add_argument("--mode", default="rnnt_beam_search")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--beam_size", type=int, default=8)
    p.add_argument("--rwkv_r", type=int, default=0)
    p.add_argument("--verbatimicity", type=float, default=None)
    p.add_argument("--fuse", default=None, choices=["on", "off"],
                   help="forward recognize_wav --fuse (single-dispatch "
                        "device chain) for A/B sweeps")
    p.add_argument("--wkv_impl", default=None,
                   choices=["pallas", "chunked"],
                   help="forward recognize_wav --wkv_impl")
    args = p.parse_args(argv)

    from paper_accurate_fast_cheap_tpu.bin import recognize_wav
    from paper_accurate_fast_cheap_tpu.tools import wer as wer_lib

    wavs = sorted(glob.glob(os.path.join(args.wav_dir, "*.wav"))
                  + glob.glob(os.path.join(args.wav_dir, "*.flac")))
    if not wavs:
        print(f"no wav/flac files in {args.wav_dir}", file=sys.stderr)
        return 1
    ref_dir = args.ref_dir or args.wav_dir

    table = []
    for chunk in [int(c) for c in args.chunk_sizes.split(",")]:
        cdir = os.path.join(args.out_dir, f"chunk{chunk}")
        os.makedirs(cdir, exist_ok=True)
        for wav in wavs:
            argv_one = [
                "--config", args.config, "--checkpoint", args.checkpoint,
                "--wav", wav, "--output_dir", cdir,
                "--mode", args.mode, "--chunk_size", str(chunk),
                "--batch_size", str(args.batch_size),
                "--beam_size", str(args.beam_size),
            ]
            if args.rwkv_r:
                argv_one += ["--rwkv_r", str(args.rwkv_r)]
            if args.verbatimicity is not None:
                argv_one += ["--verbatimicity", str(args.verbatimicity)]
            if args.fuse is not None:
                argv_one += ["--fuse", args.fuse]
            if args.wkv_impl is not None:
                argv_one += ["--wkv_impl", args.wkv_impl]
            recognize_wav.main(argv_one)
        # score: per-file hypothesis text vs .ref_txt, gigaspeech filtering
        per_file = {}
        rtfs = []
        for wav in wavs:
            name = os.path.splitext(os.path.basename(wav))[0]
            hyp_path = os.path.join(cdir, name + ".txt")
            ref_path = os.path.join(ref_dir, name + ".ref_txt")
            if not os.path.exists(ref_path):
                continue
            hyp = open(hyp_path).read().strip() \
                if os.path.exists(hyp_path) else ""
            ref = open(ref_path).read().strip()
            _, per = wer_lib.compute_wer({name: ref}, {name: hyp},
                                         gigaspeech_filter=True)
            per_file[name] = per[name]
            rtf_path = os.path.join(cdir, name + ".rtf")
            if os.path.exists(rtf_path):
                parts = open(rtf_path).read().split()
                if len(parts) >= 2 and parts[0] == "final_rtf":
                    rtfs.append(float(parts[1]))
        summ = wer_lib.longform_summary(per_file)
        if rtfs:
            summ["rtf_mean"] = sum(rtfs) / len(rtfs)
        with open(os.path.join(cdir, "summary.txt"), "w") as f:
            for k, v in summ.items():
                f.write(f"{k} {v}\n")
        table.append((chunk, summ))
        print(f"chunk {chunk}: WER {summ['wer']:.4f} "
              f"(+/- {summ['wer_stdev']:.4f}) over {summ['num_files']} "
              f"files", flush=True)

    with open(os.path.join(args.out_dir, "summary.txt"), "w") as f:
        f.write("chunk_frames wer wer_stdev ins del sub files rtf\n")
        for chunk, s in table:
            f.write(f"{chunk} {s['wer']:.4f} {s['wer_stdev']:.4f} "
                    f"{s['ins_rate']:.4f} {s['del_rate']:.4f} "
                    f"{s['sub_rate']:.4f} {s['num_files']} "
                    f"{s.get('rtf_mean', 0):.4f}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
