#!/usr/bin/env python
"""Encoder-RTF sweep driver — one subprocess per (model, batch, chunk) so
an OOM/compile failure skips the combo instead of killing the sweep.

Mirrors the reference harness
`examples/gigaspeech/s0/local/go-run-encoder-rtf.single-gpu-3x3-g5.sh:59-107`
(5 runs x batch {1,4,8,10,12,14} x chunk {2k..200k} x 13 model variants on
an A10G); here: configurable runs x batch x chunk over the four attention
families on the one v5e chip, aggregated into BENCH_SWEEP.md via
`tools/rtf_tables.py`.

Usage:
  python examples/gigaspeech/local/run_rtf_sweep.py \
      --out_dir rtf_sweep --runs 1 \
      --batches 1,4,8,14 --chunks 2000,9000,40000,100000
"""
import argparse
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "../../.."))
CONF = os.path.join(REPO, "examples/gigaspeech/conf")

MODELS = {
    "rwkv_bi_12L": "bench_rwkvbi_ds4k31nc_12le.yaml",
    "mha_12L": "bench_mha_ds4k31nc_12le.yaml",
    "mamba2_bi_12L": "bench_mamba_bi_ds4k31nc_12le.yaml",
    "mha_lca256_gt_12L": "bench_mha_lca256_gt_ds4k31nc_12le.yaml",
    # deeper variants mirror the reference's 18/24/30-layer model axis
    # (go-run-encoder-rtf.single-gpu-3x3-g5.sh:59-107)
    "rwkv_bi_18L": "bench_rwkvbi_ds4k31nc_18le.yaml",
    "rwkv_bi_24L": "bench_rwkvbi_ds4k31nc_24le.yaml",
    "rwkv_bi_30L": "bench_rwkvbi_ds4k31nc_30le.yaml",
    "mha_24L": "bench_mha_ds4k31nc_24le.yaml",
}
# full self-attention is O(T^2): cap MHA chunks like the reference caps its
# per-model sweep ranges
CHUNK_CAP = {"mha_12L": 40000, "mha_24L": 40000}
# the remote compile service has taken 7-10 min per fresh mamba program
# (r2 timeouts); give those combos headroom
TIMEOUT_OVERRIDE = {"mamba2_bi_12L": 2400}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="rtf_sweep")
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--batches", default="1,4,8,14")
    p.add_argument("--chunks", default="2000,9000,40000,100000")
    p.add_argument("--models", default=",".join(MODELS))
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--timeout", type=int, default=900)
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    batches = [int(x) for x in args.batches.split(",")]
    chunks = [int(x) for x in args.chunks.split(",")]
    failures = []
    for name in args.models.split(","):
        cfg = os.path.join(CONF, MODELS[name])
        for run in range(args.runs):
            for b in batches:
                for c in chunks:
                    if c > CHUNK_CAP.get(name, 10 ** 9):
                        continue
                    out = os.path.join(
                        args.out_dir, f"{name}_run{run}_b{b}_c{c}.rtf")
                    if os.path.exists(out):
                        continue
                    cmd = [sys.executable, "-m",
                           "paper_accurate_fast_cheap_tpu.bin.encoder_rtf",
                           "--config", cfg, "--batch_size", str(b),
                           "--chunk_size", str(c), "--iters",
                           str(args.iters), "--output", out]
                    print("RUN", name, f"b={b} c={c}", flush=True)
                    try:
                        r = subprocess.run(
                            cmd, cwd=REPO,
                            timeout=TIMEOUT_OVERRIDE.get(name, args.timeout),
                            capture_output=True, text=True)
                        if r.returncode != 0:
                            failures.append((name, b, c,
                                             r.stderr.strip()[-300:]))
                            print("  FAILED", flush=True)
                    except subprocess.TimeoutExpired:
                        failures.append((name, b, c, "timeout"))
                        print("  TIMEOUT", flush=True)
    # aggregate
    sys.path.insert(0, REPO)
    from paper_accurate_fast_cheap_tpu.tools import rtf_tables

    paths = [os.path.join(args.out_dir, f)
             for f in sorted(os.listdir(args.out_dir))
             if f.endswith(".rtf")]
    rows = rtf_tables.aggregate(paths)
    # merge with the cells already recorded in BENCH_SWEEP.md so a
    # partial re-run (new models, new out_dir) never drops prior
    # coverage; a re-measured (model, batch, chunk) cell wins
    new_keys = {(r.get("model"), r.get("batch"), r.get("chunk"))
                for r in rows}
    sweep_md = os.path.join(REPO, "BENCH_SWEEP.md")
    if os.path.exists(sweep_md):
        import re as _re

        with open(sweep_md) as f:
            for line in f:
                m = _re.match(
                    r"\|\s*(\S+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|"
                    r"\s*(\d+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|", line)
                if not m:
                    continue
                key = (m.group(1), int(m.group(2)), int(m.group(3)))
                if key in new_keys:
                    continue
                rows.append({"model": key[0], "batch": key[1],
                             "chunk": key[2],
                             "inv_rtf_mean": float(m.group(4)),
                             "inv_rtf_std": float(m.group(5)),
                             "n": int(m.group(6))})
    rows.sort(key=lambda r: (str(r.get("model")), r.get("batch") or 0,
                             r.get("chunk") or 0))
    lines = [
        "# BENCH_SWEEP — encoder RTF sweep (single v5e chip)",
        "",
        "Driver: `examples/gigaspeech/local/run_rtf_sweep.py` (mirrors the",
        "reference `local/go-run-encoder-rtf.single-gpu-3x3-g5.sh:59-107`).",
        "Metric: 1/RTF = x realtime; higher is better.  MFU estimate =",
        "achieved encoder FLOP/s over 197 TFLOP/s bf16 peak.",
        "",
    ]
    lines.append("| model | batch | chunk | 1/RTF mean | std | runs |")
    lines.append("|---|---|---|---|---|---|")
    for r in rows:
        lines.append(
            f"| {r.get('model', '?')} | {r.get('batch')} | {r.get('chunk')}"
            f" | {r.get('inv_rtf_mean', 0):.0f} | {r.get('inv_rtf_std', 0):.0f}"
            f" | {r.get('n', 0)} |")
    if failures:
        lines += ["", "## Skipped/failed combos", ""]
        for name, b, c, why in failures:
            lines.append(f"- {name} b={b} c={c}: {why.splitlines()[-1] if why else 'failed'}")
    md = "\n".join(lines) + "\n"
    # curated non-table sections (methodology notes, decode/train tables)
    # live in docs/bench_sweep_appendix.md so re-running the sweep never
    # destroys them
    appendix = os.path.join(REPO, "docs/bench_sweep_appendix.md")
    if os.path.exists(appendix):
        with open(appendix) as f:
            md += "\n" + f.read()
    with open(os.path.join(REPO, "BENCH_SWEEP.md"), "w") as f:
        f.write(md)
    print(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
