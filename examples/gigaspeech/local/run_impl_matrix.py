#!/usr/bin/env python
"""Impl-matrix hypothesis-invariance harness (on-chip QA).

The decode product has a genuine config matrix — WKV {pallas, chunked}
x predictor/top-k VMEM pinning {pinned, unpinned} x dispatch {chain,
split} — and kernels earn silent-wrong-results as their failure mode.
This harness decodes the SAME checkpoint + wav through every cell via
the real `bin/recognize_wav` CLI and asserts TRANSCRIPT-level equality
(WER=0 between cells, not bit equality): the reference's empirical-QA
role (SURVEY.md §4) applied to the kernel zoo.

Checkpoint: by default the accuracy-loop fixture's TRAINED model
(`run_accuracy_loop.py --out <dir>`), whose emissions are structured
(tone-words), not tie-cascade noise — random-init models diverge
wholesale from bf16 tie cascades and prove nothing (NOTES.md r4).

Cells where an axis cannot engage are still run (the env gate resolves
to off) — e.g. pinning never engages inside the chain's enclosing jit
(crash envelope, NOTES.md r4), so {chain, pinned} == {chain, unpinned}
is itself an asserted invariance.

Prints one JSON line; rc=0 iff every cell matches the base transcript.
"""
import argparse
import itertools
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "../../.."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run_recognize(cfg, ckpt, wav, out, cell, cpu, chunk, batch):
    wkv, pin, fuse = cell
    env = dict(os.environ)
    env["PAFC_PRED_FUSED"] = "1" if pin else "0"
    env["PAFC_TOPK_VMEM"] = "1" if pin else "0"
    cli = ["--config", cfg, "--checkpoint", ckpt, "--wav", wav,
           "--output_dir", out, "--mode", "rnnt_beam_search",
           "--chunk_size", str(chunk), "--batch_size", str(batch),
           "--beam_size", "8", "--ctc_weight", "0.3",
           "--transducer_weight", "0.7",
           "--fuse", {"chain": "on"}.get(fuse, fuse),
           "--wkv_impl", wkv]
    if cpu:
        code = ("import jax, sys; "
                "jax.config.update('jax_platforms', 'cpu'); "
                "from paper_accurate_fast_cheap_tpu.bin.recognize_wav "
                "import main; sys.exit(main(sys.argv[1:]) or 0)")
        cmd = [sys.executable, "-c", code] + cli
    else:
        cmd = [sys.executable, "-m",
               "paper_accurate_fast_cheap_tpu.bin.recognize_wav"] + cli
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-3000:])
        raise RuntimeError(f"recognize_wav failed for cell {cell}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fixture", default="/tmp/acc_loop",
                   help="run_accuracy_loop.py --out dir (config.yaml, "
                        "exp/epoch_*, longform/ep0.wav)")
    p.add_argument("--checkpoint", default=None,
                   help="override: explicit checkpoint path")
    p.add_argument("--config", default=None)
    p.add_argument("--wav", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--chunk_size", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=4)
    args = p.parse_args(argv)

    cfg = args.config or os.path.join(args.fixture, "config.yaml")
    wav = args.wav or os.path.join(args.fixture, "longform", "ep0.wav")
    ckpt = args.checkpoint
    if ckpt is None:
        exp = os.path.join(args.fixture, "exp")
        eps = sorted(d for d in os.listdir(exp)
                     if d.startswith("epoch_")
                     and os.path.isdir(os.path.join(exp, d)))
        ckpt = os.path.join(exp, eps[-1])
    out_root = args.out or os.path.join(args.fixture, "impl_matrix")
    os.makedirs(out_root, exist_ok=True)

    cells = list(itertools.product(("pallas", "chunked"),
                                   (True, False), ("chain", "split")))
    name = os.path.splitext(os.path.basename(wav))[0]
    results = {}
    for cell in cells:
        tag = f"{cell[0]}_{'pin' if cell[1] else 'nopin'}_{cell[2]}"
        out = os.path.join(out_root, tag)
        os.makedirs(out, exist_ok=True)
        t0 = time.time()
        run_recognize(cfg, ckpt, wav, out, cell, args.cpu,
                      args.chunk_size, args.batch_size)
        hyp = open(os.path.join(out, name + ".txt")).read().strip()
        results[tag] = hyp
        print(f"# {tag}: {time.time() - t0:.1f}s, "
              f"{len(hyp.split())} words", file=sys.stderr)

    # Invariance contract (calibrated on the first TPU run, 2026-08-21,
    # NOTES.md round-5):
    #  HARD (any violation = bug, rc=1):
    #   1. all four pallas cells identical — the product default family
    #      must be transcript-invariant across pinning AND dispatch
    #      structure;
    #   2. the top-k VMEM pin is bit-neutral: pin vs nopin identical
    #      whenever the fused predictor does NOT engage (chain mode —
    #      the outer-trace gate keeps it off there);
    #   3. fuse chain==split within a (wkv, predictor-path) pair.
    #  SOFT (reported, not asserted): chunked-vs-pallas encoder WER and
    #  the split+pin cell where the fused LSTM predictor (documented
    #  1.5e-4 bf16 class, NOTES.md r4) engages — numerics classes, not
    #  bugs; they shrink to zero on well-trained high-margin models.
    viol = []
    pallas_set = {results[f"pallas_{p}_{f}"] for p in ("pin", "nopin")
                  for f in ("chain", "split")}
    if len(pallas_set) != 1:
        viol.append("pallas family not invariant")
    for wkv in ("pallas", "chunked"):
        if results[f"{wkv}_pin_chain"] != results[f"{wkv}_nopin_chain"]:
            viol.append(f"{wkv}: topk pin not neutral (chain)")
        if (results[f"{wkv}_nopin_chain"]
                != results[f"{wkv}_nopin_split"]):
            viol.append(f"{wkv}: fuse not neutral (nopin)")
    cross = {t: h for t, h in results.items()
             if h != results["pallas_pin_split"]}
    print(json.dumps({
        "metric": "impl_matrix_invariance",
        "cells": len(cells),
        "hard_contract_ok": not viol,
        "violations": viol,
        "distinct_transcripts": len(set(results.values())),
        "cells_differing_from_default": sorted(cross),
        "checkpoint": ckpt,
        "backend": "cpu" if args.cpu else "tpu",
    }))
    return 1 if viol else 0


if __name__ == "__main__":
    sys.exit(main())
