"""Beam-search-only microbenchmark (no encoder) for merge/unroll A/Bs.

The device beam (`decode/rnnt_search.py`) prices the product's decode
RTF (NOTES.md round-3 findings: ~0.7-0.8 ms/frame vs 0.04 ms for the
joint matmul), so its knobs — duplicate-merge impl, scan unroll — need
on-chip A/Bs.  Compiling the full decode_rtf program (12-layer encoder +
beam) per variant costs minutes through the remote compile service; this
harness compiles ONLY the beam scan over random posteriors, cutting the
per-variant compile to the ~50-op step body.  Timing consumes every
iteration's outputs (the relay skips unfetched dispatches — NOTES.md
"Gotchas"): each iter feeds the previous beam's top score back into the
logits, forcing serial execution.

Mirrors the operating point of `local/go-SF-dev-one-model-paper.sh:16-41`
(batch 64, beam 8, 30 s utterances -> 750 post-ds4 frames).
"""
from __future__ import annotations

import argparse
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="beam-only RTF microbench")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--frames", type=int, default=750,
                   help="post-subsampling frames (750 = 30 s at ds4)")
    p.add_argument("--vocab", type=int, default=5002)
    p.add_argument("--enc_dim", type=int, default=512)
    p.add_argument("--pred_dim", type=int, default=512)
    p.add_argument("--beam_size", type=int, default=8)
    p.add_argument("--merge", default="sort", choices=["sort", "pairwise"])
    p.add_argument("--unroll", type=int, default=1)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--platform", default=None,
                   help="force jax platform (e.g. cpu)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from paper_accurate_fast_cheap_tpu.decode import rnnt_search

    B, T, V, De, H = (args.batch_size, args.frames, args.vocab,
                      args.enc_dim, args.pred_dim)
    key = jax.random.PRNGKey(0)
    enc = jax.random.normal(key, (B, T, De), jnp.bfloat16)
    # blank-dominant CTC posteriors (speech-realistic emission rate)
    ctc = jax.random.normal(jax.random.PRNGKey(1), (B, T, V))
    ctc = jax.nn.log_softmax(ctc.at[..., 0].add(4.0))
    lens = jnp.full((B,), T, jnp.int32)

    # minimal predictor/joint with the flagship's shapes: one embedding
    # step + a bilinear joint, exactly the per-frame work class of
    # models/predictor.py + models/joint.py
    E = jax.random.normal(jax.random.PRNGKey(2), (V, H), jnp.bfloat16)
    W = (jax.random.normal(jax.random.PRNGKey(3), (H, H), jnp.bfloat16)
         * 0.02)
    A = jax.random.normal(jax.random.PRNGKey(4), (De, V), jnp.bfloat16)
    Bm = jax.random.normal(jax.random.PRNGKey(5), (H, V), jnp.bfloat16)

    def predictor_step(params, tokens, state):
        s = jnp.tanh(state @ params["W"] + params["E"][tokens])
        return s, s

    def joint_step(params, enc_t, pred):
        z = (enc_t @ params["A"] + pred @ params["Bm"]).astype(jnp.float32)
        return jax.nn.log_softmax(z)

    params = {"E": E, "W": W, "A": A, "Bm": Bm}

    def run(feed):
        out = rnnt_search.rnnt_beam_search(
            predictor_step, joint_step,
            lambda n: jnp.zeros((n, H), jnp.bfloat16),
            enc + feed, lens, ctc, beam_size=args.beam_size,
            blank_id=0, ctc_weight=0.3, transducer_weight=0.7,
            impl="device", params=params, defer=True,
            unroll=args.unroll, merge=args.merge,
        )
        return out

    feed = jnp.bfloat16(0.0)
    for _ in range(args.warmup):
        out = run(feed)
        feed = (out["scores"][0, 0] * 0).astype(jnp.bfloat16)
    # HOST read: through the relay, dispatch returns immediately and
    # unfetched programs may never execute — the fetch both forces the
    # warmup chain and fences the timed region (NOTES.md "Gotchas")
    float(feed)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(feed)
        feed = (out["scores"][0, 0] * 0).astype(jnp.bfloat16)  # serial dep
    float(feed)  # forces the whole chained sequence before t1
    elapsed = time.perf_counter() - t0

    audio_s = B * T * 0.04 * args.iters  # ds4 frames -> 40 ms each
    per_frame_ms = elapsed / (args.iters * T) * 1e3
    print(f"merge={args.merge} unroll={args.unroll} B={B} T={T} "
          f"beam={args.beam_size}: {elapsed/args.iters*1e3:.1f} ms/iter, "
          f"{per_frame_ms:.3f} ms/frame, 1/RTF={audio_s/elapsed:.0f}x")


if __name__ == "__main__":
    main()
