"""Decode-path RTF benchmark CLI (encoder + search, end to end).

The encoder benchmark (`bin/encoder_rtf.py`) covers the reference's
`wenet/bin/encoder-rtf.py` hot path; this CLI additionally measures the
full decode modes at the paper's short-form operating point — decode mode
`rnnt_beam_search`, beam 8, batch 64 (`local/go-SF-dev-one-model-paper.sh:
16-41`) — so the headline RTF describes the product, not just the
encoder.  Modes: ctc_greedy_search (jitted argmax path),
rnnt_beam_search (the on-device jitted-scan prefix beam,
`decode/rnnt_search.py:195`).

Output format matches `bin/encoder_rtf.py` (.rtf files aggregatable by
`tools/rtf_tables.py`).
"""
from __future__ import annotations

import argparse
import functools
import logging
import resource
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="decode RTF benchmark")
    p.add_argument("--config", required=True,
                   help="transducer model config yaml")
    p.add_argument("--checkpoint", default=None,
                   help="optional; random params if omitted")
    p.add_argument("--mode", default="rnnt_beam_search",
                   choices=["ctc_greedy_search", "rnnt_beam_search"])
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--chunk_size", type=int, default=3000,
                   help="frames per utterance (3000 = 30 s short-form)")
    p.add_argument("--beam_size", type=int, default=8)
    p.add_argument("--ctc_weight", type=float, default=0.3)
    p.add_argument("--transducer_weight", type=float, default=0.7)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--output", default=None, help="write .rtf file here")
    p.add_argument("--beam_unroll", type=int, default=1,
                   help="lax.scan unroll for the device beam (per-frame "
                        "loop-overhead amortization A/B)")
    p.add_argument("--beam_merge", default="pairwise",
                   choices=["sort", "pairwise"],
                   help="device-beam duplicate-merge impl (pairwise = "
                        "sort-free walk, see rnnt_search)")
    p.add_argument("--fuse", default="off", choices=["on", "off"],
                   help="dispatch encoder+ctc+beam as ONE program per "
                        "iteration (mirrors recognize_wav --fuse)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    from paper_accurate_fast_cheap_tpu.decode import rnnt_search, search
    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    input_dim = config.get("dataset_conf", {}).get(
        "fbank_conf", {}).get("num_mel_bins", 80)
    vocab = config.get("vocab_size_for_bench", 5002)
    model, model_type = factory.init_model(config, vocab, input_dim)
    if args.mode == "rnnt_beam_search" and model_type != "transducer":
        raise SystemExit("rnnt_beam_search needs a transducer config")

    B, T = args.batch_size, args.chunk_size
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, input_dim))
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(jax.random.PRNGKey(1), feats[:1, :256], lens[:1],
                        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]))
    if args.checkpoint:
        from paper_accurate_fast_cheap_tpu.train import checkpointing

        params, _, _ = checkpointing.load_checkpoint(args.checkpoint,
                                                     params)
        # numpy-fallback restores re-upload per dispatch; commit once
        params = jax.device_put(params)
    if args.bf16:
        feats = feats.astype(jnp.bfloat16)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    @jax.jit
    def enc_ctc(p, f, l):
        enc, enc_lens = model.apply(p, f, l, method=model.forward_encoder)
        return enc, model.apply(p, enc, method=model.ctc_logprobs), enc_lens

    # steps jitted ONCE (fresh closures per call would recompile every iter)
    predictor_step, joint_step, init_state_fn = \
        rnnt_search.make_transducer_step_fns(model, params)

    def _search(p, enc, enc_lens, logp, defer):
        # thread p (the traced jit argument under fused_chain) into the
        # beam — passing the concrete module-level params here would bake
        # the full weight set into the fused HLO as literals (the
        # HTTP-413 remote-compile failure, NOTES.md round-3 LF section)
        return rnnt_search.rnnt_beam_search(
            predictor_step, joint_step, init_state_fn, enc, enc_lens,
            logp, beam_size=args.beam_size,
            ctc_weight=args.ctc_weight,
            transducer_weight=args.transducer_weight, impl="device",
            params=p, defer=defer, unroll=args.beam_unroll,
            merge=args.beam_merge)

    @jax.jit
    def fused_chain(p, f, l):
        enc, logp, enc_lens = enc_ctc(p, f, l)
        # packed: finalize costs ONE host fetch instead of three
        return rnnt_search.pack_device_beam(
            _search(p, enc, enc_lens, logp, defer=True))

    def run():
        if args.mode != "ctc_greedy_search" and args.fuse == "on":
            return rnnt_search.finalize_device_beam(
                fused_chain(params, feats, lens), beam=args.beam_size)
        enc, logp, enc_lens = enc_ctc(params, feats, lens)
        if args.mode == "ctc_greedy_search":
            res = search.ctc_greedy_search(np.asarray(logp),
                                           np.asarray(enc_lens))
        else:
            res = _search(params, enc, enc_lens, logp, defer=False)
        return res

    compile_t0 = time.perf_counter()
    for _ in range(max(args.warmup, 1)):
        res = run()
    compile_s = time.perf_counter() - compile_t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        res = run()
    elapsed = time.perf_counter() - t0

    n_tok = int(np.mean([len(r.tokens) for r in res]))
    audio_seconds = args.iters * B * T * 0.01
    rtf = elapsed / audio_seconds
    minutes_per_sec = (audio_seconds / 60.0) / elapsed
    max_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    from paper_accurate_fast_cheap_tpu.utils.profiling import (
        device_memory_stats,
    )

    dev_mb = device_memory_stats().get("peak_bytes_in_use_mb", 0.0)
    import os as _os

    name = _os.path.splitext(_os.path.basename(args.config))[0]
    lines = [
        f"model {name}.decode_{args.mode}",
        f"final_rtf {rtf:.8f}",
        f"minutes_audio_per_sec {minutes_per_sec:.3f}",
        f"batch {B} chunk {T} iters {args.iters}",
        f"beam {args.beam_size} mean_tokens {n_tok}",
        f"fuse {args.fuse} beam_unroll {args.beam_unroll}",
        f"warmup_plus_compile_s {compile_s:.2f}",
        f"max_cpu_ram_mb {max_rss_mb:.1f}",
        f"max_vram_mb {dev_mb:.1f}",
        f"device {jax.devices()[0]}",
    ]
    report = "\n".join(lines)
    print(report)
    if args.output:
        with open(args.output, "w") as f:
            f.write(report + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
