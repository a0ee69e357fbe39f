"""Encoder-only RTF benchmark CLI.

Parity target: `wenet/bin/encoder-rtf.py:285-555` — encoder + CTC-head hot
loop over long windows with warmup, wall-clock RTF, minutes-of-audio/sec and
peak-memory reporting; output format compatible with
`tools/rtf/get-rtf-tables.py` aggregation.
"""
from __future__ import annotations

import argparse
import logging
import resource
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="encoder RTF benchmark")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="optional; random params if omitted")
    p.add_argument("--chunk_size", type=int, default=9000,
                   help="frames per window")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--output", default=None, help="write .rtf file here")
    # sweep mode (`local/go-run-encoder-rtf.single-gpu-3x3-g5.sh:59-107`)
    p.add_argument("--sweep_batches", default=None,
                   help="comma list, e.g. 1,4,8,14")
    p.add_argument("--sweep_chunks", default=None,
                   help="comma list, e.g. 2000,9000,40000")
    p.add_argument("--sweep_runs", type=int, default=1)
    p.add_argument("--sweep_dir", default=None,
                   help="directory for sweep .rtf files")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.sweep_batches or args.sweep_chunks:
        import os

        batches = [int(x) for x in
                   (args.sweep_batches or str(args.batch_size)).split(",")]
        chunks = [int(x) for x in
                  (args.sweep_chunks or str(args.chunk_size)).split(",")]
        out_dir = args.sweep_dir or "rtf_sweep"
        os.makedirs(out_dir, exist_ok=True)
        for run in range(args.sweep_runs):
            for b in batches:
                for c in chunks:
                    out = os.path.join(out_dir,
                                       f"run{run}_b{b}_c{c}.rtf")
                    run_once(args, batch=b, chunk=c, output=out)
        from paper_accurate_fast_cheap_tpu.tools import rtf_tables

        rows = rtf_tables.aggregate(
            [os.path.join(out_dir, f) for f in os.listdir(out_dir)
             if f.endswith(".rtf")])
        for r in rows:
            print(r)
        return 0
    return run_once(args, args.batch_size, args.chunk_size, args.output)


def run_once(args, batch, chunk, output=None):
    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    input_dim = config.get("dataset_conf", {}).get(
        "fbank_conf", {}).get("num_mel_bins", 80)
    vocab = config.get("vocab_size_for_bench", 5002)
    model, model_type = factory.init_model(config, vocab, input_dim)

    B, T = batch, chunk
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, input_dim))
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(jax.random.PRNGKey(1), feats[:1, :256], lens[:1],
                        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]))
    if args.checkpoint:
        from paper_accurate_fast_cheap_tpu.train import checkpointing

        params, _, _ = checkpointing.load_checkpoint(args.checkpoint,
                                                     params)
    if args.bf16:
        feats = feats.astype(jnp.bfloat16)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    def fwd(p, f, l):
        enc, enc_lens = model.apply(p, f, l, method=model.forward_encoder)
        return model.apply(p, enc, method=model.ctc_logprobs), enc_lens

    jfwd = jax.jit(fwd)
    compile_t0 = time.perf_counter()
    for _ in range(max(args.warmup, 1)):
        out = jfwd(params, feats, lens)
        float(np.asarray(out[0][0, 0, 0]))  # force full execution
    compile_s = time.perf_counter() - compile_t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = jfwd(params, feats, lens)
    float(np.asarray(out[0][0, 0, 0]))
    elapsed = time.perf_counter() - t0

    audio_seconds = args.iters * B * T * 0.01
    rtf = elapsed / audio_seconds
    minutes_per_sec = (audio_seconds / 60.0) / elapsed
    max_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    from paper_accurate_fast_cheap_tpu.utils.profiling import (
        device_memory_stats,
    )

    dev_mb = device_memory_stats().get("peak_bytes_in_use_mb", 0.0)
    import os as _os

    lines = [
        f"model {_os.path.splitext(_os.path.basename(args.config))[0]}",
        f"final_rtf {rtf:.8f}",
        f"minutes_audio_per_sec {minutes_per_sec:.3f}",
        f"batch {B} chunk {T} iters {args.iters}",
        f"warmup_plus_compile_s {compile_s:.2f}",
        f"max_cpu_ram_mb {max_rss_mb:.1f}",
        f"max_vram_mb {dev_mb:.1f}",
        f"device {jax.devices()[0]}",
    ]
    report = "\n".join(lines)
    print(report)
    if output:
        with open(output, "w") as f:
            f.write(report + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
