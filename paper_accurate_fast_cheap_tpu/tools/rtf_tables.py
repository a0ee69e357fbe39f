"""RTF sweep aggregation.

Parity target: `tools/rtf/get-rtf-tables.py` — parse the `.rtf` files
written by `bin/encoder_rtf.py` / `bin/recognize_wav.py` and print
mean +/- std tables per (model, chunk, batch).
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

import numpy as np


def parse_rtf_file(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2 and parts[0] in (
                "final_rtf", "minutes_audio_per_sec", "elapsed",
                "audio_seconds", "max_cpu_ram_mb",
            ):
                out[parts[0]] = float(parts[1])
            if len(parts) >= 2 and parts[0] == "model":
                out["model"] = parts[1]
            m = re.match(r"batch (\d+) chunk (\d+)", line)
            if m:
                out["batch"] = int(m.group(1))
                out["chunk"] = int(m.group(2))
    return out


def aggregate(paths):
    groups = collections.defaultdict(list)
    for p in paths:
        d = parse_rtf_file(p)
        if "final_rtf" not in d:
            continue
        key = (d.get("model", ""), d.get("batch", 0), d.get("chunk", 0))
        groups[key].append(d["final_rtf"])
    rows = []
    for (model, batch, chunk), vals in sorted(groups.items()):
        arr = np.asarray(vals)
        inv = 1.0 / arr
        rows.append({
            "model": model, "batch": batch, "chunk": chunk,
            "runs": len(vals), "n": len(vals),
            "rtf_mean": float(arr.mean()), "rtf_std": float(arr.std()),
            "inv_rtf_mean": float(inv.mean()),
            "inv_rtf_std": float(inv.std()),
        })
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description="aggregate .rtf sweep files")
    p.add_argument("glob", help="e.g. 'exp/rtf/*.rtf'")
    args = p.parse_args(argv)
    rows = aggregate(glob.glob(args.glob))
    print(f"{'batch':>6} {'chunk':>8} {'runs':>5} {'RTF mean':>12} "
          f"{'std':>10} {'1/RTF':>10}")
    for r in rows:
        print(f"{r['batch']:>6} {r['chunk']:>8} {r['runs']:>5} "
              f"{r['rtf_mean']:>12.6f} {r['rtf_std']:>10.6f} "
              f"{r['inv_rtf_mean']:>10.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
