"""Per-component timing of the device-beam scan body.

`bin/beam_bench.py` prices the WHOLE beam step (~0.46 ms/frame at the
SF point); this harness prices each sub-block in ISOLATION inside its
own serial `lax.scan`, so one chip session attributes the per-frame cost
across: scan overhead floor, joint matmul + log_softmax, CTC fusion,
vocab top-k (`decode/rnnt_search.top_k_vocab`), the pairwise duplicate
merge, the predictor-state gather, and the predictor step.  Every body
consumes its carry (serial dependency) and the timed region is fenced by
a host read, so relay lazy-execution cannot skip work (NOTES.md
"Gotchas").

The sum of components won't exactly equal the full step (XLA fuses
across block boundaries there), but the ranking tells us what to attack.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed_scan(body, carry0, T, warmup, iters):
    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=T)[0])
    c = carry0
    for _ in range(warmup):
        c = run(c)
    jax.block_until_ready(c)
    c0 = c
    t0 = time.perf_counter()
    for _ in range(iters):
        c = run(c)
    jax.block_until_ready(c)
    dt = time.perf_counter() - t0
    del c0
    return dt / (iters * T) * 1e3  # ms per frame


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--frames", type=int, default=750)
    p.add_argument("--vocab", type=int, default=5002)
    p.add_argument("--enc_dim", type=int, default=512)
    p.add_argument("--pred_dim", type=int, default=512)
    p.add_argument("--beam_size", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--platform", default=None)
    p.add_argument("--only", default=None,
                   help="comma list of component names to run")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from paper_accurate_fast_cheap_tpu.decode.rnnt_search import top_k_vocab

    B, T, V, De, H, N = (args.batch_size, args.frames, args.vocab,
                         args.enc_dim, args.pred_dim, args.beam_size)
    NK = N * N
    BN = B * N
    k0 = jax.random.PRNGKey(0)
    A = jax.random.normal(k0, (De, V), jnp.bfloat16) * 0.02
    Bm = jax.random.normal(jax.random.PRNGKey(1), (H, V), jnp.bfloat16) * 0.02
    E = jax.random.normal(jax.random.PRNGKey(2), (V, H), jnp.bfloat16) * 0.02
    W = jax.random.normal(jax.random.PRNGKey(3), (H, H), jnp.bfloat16) * 0.02
    enc = jax.random.normal(jax.random.PRNGKey(4), (BN, De), jnp.bfloat16)
    ctc_row = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(5), (BN, V)))
    jidx = jnp.arange(NK)

    comps = {}

    def noop(c, _):
        return c + 1, None
    comps["noop"] = (noop, jnp.zeros((8, 128), jnp.float32))

    def joint(c, _):
        z = ((enc + c[0, 0].astype(jnp.bfloat16)) @ A
             + (E[0] * 0 + 1.0) @ Bm).astype(jnp.float32)
        z = jax.nn.log_softmax(z)
        return c + z[:1, :8], None
    comps["joint"] = (joint, jnp.zeros((1, 8), jnp.float32))

    def fuse(c, _):
        f = jnp.logaddexp(ctc_row + c[0, 0], ctc_row - 1.0)
        return c + f[:1, :8], None
    comps["fuse"] = (fuse, jnp.zeros((1, 8), jnp.float32))

    def topk_body(c, _):
        x = (ctc_row + c[0, 0]).reshape(B, N, V)
        vals, _idx = top_k_vocab(x, N)  # idx dropped; vals carry the dep
        return c + vals.reshape(B, NK)[:1, :8].astype(jnp.float32), None
    comps["topk"] = (topk_body, jnp.zeros((1, 8), jnp.float32))

    def lax_topk_body(c, _):
        x = (ctc_row + c[0, 0]).reshape(B, N, V)
        vals, idx = jax.lax.top_k(x, N)
        return c + vals.reshape(B, NK)[:1, :8], None
    comps["lax_topk"] = (lax_topk_body, jnp.zeros((1, 8), jnp.float32))

    def approx_topk_body(c, _):
        x = (ctc_row + c[0, 0]).reshape(B, N, V)
        vals, idx = jax.lax.approx_max_k(x, N)
        return c + vals.reshape(B, NK)[:1, :8], None
    comps["approx_topk"] = (approx_topk_body, jnp.zeros((1, 8), jnp.float32))

    from paper_accurate_fast_cheap_tpu.ops.topk_pallas import (
        top_k_vocab_pallas)

    def pallas_topk_body(c, _):
        x = (ctc_row + c[0, 0]).reshape(B, N, V)
        vals, _idx = top_k_vocab_pallas(x, N)
        return c + vals.reshape(B, NK)[:1, :8].astype(jnp.float32), None
    comps["pallas_topk"] = (pallas_topk_body, jnp.zeros((1, 8), jnp.float32))

    c_score0 = jax.random.normal(jax.random.PRNGKey(6), (B, NK))
    c_h1_0 = jax.random.randint(
        jax.random.PRNGKey(7), (B, NK), 0, 1 << 20).astype(jnp.uint32)

    def merge(c, _):
        c_score = c_score0 + c[0, 0]
        c_h1 = c_h1_0
        c_len = (c_h1 % 7).astype(jnp.int32)
        eq = ((c_h1[:, :, None] == c_h1[:, None, :])
              & (c_len[:, :, None] == c_len[:, None, :]))
        sc_j, sc_i = c_score[:, :, None], c_score[:, None, :]
        before = (sc_j > sc_i) | (
            (sc_j == sc_i) & (jidx[:, None] < jidx[None, :])[None])
        is_first = ~jnp.any(eq & before, axis=1)
        firsts_before = jnp.sum(
            (is_first[:, :, None] & before).astype(jnp.int32), axis=1)
        in_win = firsts_before < N
        contrib = jnp.where(eq & in_win[:, None, :], c_score[:, None, :],
                            -jnp.inf)
        merged = jax.nn.logsumexp(contrib, axis=-1)
        final = jnp.where(is_first & in_win, merged, -jnp.inf)
        top_scores, top_pos = jax.lax.top_k(final, N)
        return c + top_scores[:1, :].astype(jnp.float32), None
    comps["merge"] = (merge, jnp.zeros((1, N), jnp.float32))

    state0 = (jnp.zeros((2, BN, H), jnp.bfloat16),
              jnp.zeros((2, BN, H), jnp.bfloat16))
    sel0 = jax.random.randint(jax.random.PRNGKey(8), (BN,), 0, BN)

    def gather(c, _):
        sel = (sel0 + c[1][0, 0, 0].astype(jnp.int32)) % BN
        g = jax.tree.map(lambda s: jnp.take(s, sel, axis=1), (c[1], c[2]))
        adv = (sel % 2).astype(bool)
        g = jax.tree.map(
            lambda nw: jnp.where(adv[None, :, None], nw, nw * 0.5), g)
        return (c[0] + 1, g[0], g[1]), None
    comps["gather"] = (gather,
                       (jnp.zeros((), jnp.int32),
                        jnp.ones((2, BN, H), jnp.bfloat16), state0[1]))

    def pred(c, _):
        s = jnp.tanh(c @ W + E[0][None, :])
        return s, None
    comps["pred"] = (pred, jnp.zeros((BN, H), jnp.bfloat16))

    # hypothesis-buffer maintenance: beam reorder gather + masked token
    # write on the (B, N, L) token carry — the step's largest buffer
    L = T

    def hypbuf(c, _):
        hyps, tick = c
        n_src = ((sel0[: B * N].reshape(B, N)
                  + tick) % N).astype(jnp.int32)
        n_tok = (n_src + tick) % V
        n_len = (tick % L) * jnp.ones((B, N), jnp.int32)
        hyps_g = jnp.take_along_axis(hyps, n_src[:, :, None], axis=1)
        wmask = jnp.arange(L)[None, None, :] == n_len[:, :, None]
        new = jnp.where(wmask, n_tok[:, :, None], hyps_g)
        return (new, tick + 1), None
    comps["hypbuf"] = (hypbuf, (jnp.zeros((B, N, L), jnp.int32),
                                jnp.int32(0)))

    # scalar bookkeeping soup: candidate hash/len/src construction, the
    # walk-window gathers, and the end-of-step carry selects on (B, N)
    def bookkeep(c, _):
        scores, h1, h2, hyp_len, last, tick = c
        c_score = (scores[:, :, None]
                   + jnp.arange(N, dtype=jnp.float32)[None, None, :]
                   ).reshape(B, NK) - 0.01
        c_src = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, N)).reshape(NK)
        c_src = jnp.broadcast_to(c_src, (B, NK))
        c_tok = ((c_src + tick) % V).astype(jnp.int32)
        c_adv = c_tok != 0
        tk = (c_tok + 1).astype(jnp.uint32)
        src_h1 = jnp.take_along_axis(h1, c_src, axis=1)
        src_h2 = jnp.take_along_axis(h2, c_src, axis=1)
        src_len = jnp.take_along_axis(hyp_len, c_src, axis=1)
        c_h1 = jnp.where(c_adv, src_h1 * jnp.uint32(2654435761) + tk,
                         src_h1)
        c_h2 = jnp.where(c_adv, src_h2 * jnp.uint32(2246822519)
                         + tk * jnp.uint32(2654435761), src_h2)
        c_len = src_len + c_adv.astype(jnp.int32)
        top_scores, top_pos = jax.lax.top_k(c_score, N)
        n_src = jnp.take_along_axis(c_src, top_pos, axis=1)
        n_tok = jnp.take_along_axis(c_tok, top_pos, axis=1)
        n_adv = jnp.take_along_axis(c_adv, top_pos, axis=1)
        n_h1 = jnp.take_along_axis(c_h1, top_pos, axis=1)
        n_h2 = jnp.take_along_axis(c_h2, top_pos, axis=1)
        n_len = jnp.take_along_axis(c_len, top_pos, axis=1)
        am = (jnp.arange(B) < B)[:, None]
        return ((jnp.where(am, top_scores, scores),
                 jnp.where(am, n_h1, h1), jnp.where(am, n_h2, h2),
                 jnp.where(am, n_len, hyp_len),
                 jnp.where(am, jnp.where(n_adv, n_tok, last), last),
                 tick + 1), None)
    comps["bookkeep"] = (bookkeep,
                         (jnp.zeros((B, N), jnp.float32),
                          jnp.zeros((B, N), jnp.uint32),
                          jnp.zeros((B, N), jnp.uint32),
                          jnp.zeros((B, N), jnp.int32),
                          jnp.zeros((B, N), jnp.int32), jnp.int32(0)))

    names = (args.only.split(",") if args.only else list(comps))
    results = {}
    for name in names:
        body, carry0 = comps[name]
        ms = _timed_scan(body, carry0, T, args.warmup, args.iters)
        results[name] = ms
        print(f"{name:12s}: {ms:.4f} ms/frame")
    total = sum(v for k, v in results.items() if k not in
                ("noop", "lax_topk", "approx_topk"))
    print(f"{'sum(core)':12s}: {total:.4f} ms/frame "
          "(noop/lax_topk/approx_topk excluded)")


if __name__ == "__main__":
    main()
