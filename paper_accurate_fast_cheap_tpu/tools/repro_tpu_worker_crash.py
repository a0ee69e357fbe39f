"""Minimal repros for the TPU-worker crash classes observed in rounds 2-4.

(Round 4 added ``--case pinned_outer_jit`` — VMEM-pinned pallas weights
under an enclosing jit; see that case's docstring and NOTES.md.)

ISSUE NOTE (round 3).  Three distinct programs have killed the remote TPU
worker process ("TPU worker process crashed or restarted", tunnel dead for
50 min - 3.5 h).  No device logs are reachable through the relay, so the
root cause cannot be pinned beyond the program shapes; this script freezes
each failing program as a one-flag repro so the crash can be triaged the
moment a debuggable TPU (or a libtpu with logs) is available.  None of
these programs is on any default path today:

1. ``--case v7_encoder``: the WKV v7 single-pass kernel
   (`ops/wkv6_pallas.py:_kernel_v7`) run 24x inside the flagship encoder
   at B=8, T=9000.  Standalone v7 at the same shape PASSES; only the
   24-instance composition crashed (round 2, once; hung on retry).
   Suspects: VMEM pressure from the carried-state scratch
   (vmem_limit_bytes is raised to 100 MB) interacting with XLA's
   scheduling of 24 back-to-back Mosaic calls.  v5 two-pass remains the
   default (`wkv6_pallas(..., generation=5)`).

2. ``--case pallas_lf``: the v5 kernel at long-form shapes on REAL data —
   (4, 20000) windows from a decoded waveform crashed the worker twice
   while the IDENTICAL program on zeros passed (round 3).  Data-dependent
   crash at T>8192; chunked-XLA on the same tensors passes.  LF decode
   pins `--wkv_impl chunked` (bin/recognize_wav.py); pallas stays default
   only for T<=8192 (the tested SF envelope).

3. ``--case sort_topk``: the retired full-sort beam — `lax.top_k` over
   (64, 8, 5002) inside a 3000-step scan, whose output materialization
   killed the worker once (round 3, 3.5 h outage).  The product beam now
   uses the exact two-level chunked top-k (`decode/rnnt_search.top_k_vocab`)
   and no full vocab sort exists on any decode path.

Common thread: all three are large Mosaic/sort-heavy programs near the
memory system's edge on this tunnel-attached v5 lite part.  WARNING: a
successful repro COSTS THE CHIP — recovery has taken 50 min to 3.5 h.
Run only when that price is acceptable:

    python -m paper_accurate_fast_cheap_tpu.tools.repro_tpu_worker_crash \
        --case v7_encoder --i-accept-worker-loss
"""
from __future__ import annotations

import argparse
import sys
import time


def _require_tpu():
    import jax

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        sys.exit("repro requires the TPU backend (crashes are TPU-only)")
    return dev


def case_v7_encoder():
    # The round-2 crash was the flagship encoder (24 bidirectional WKV
    # calls = 12 blocks x 2 directions) with version=7 at B=8, T=9000
    # (pre-dating the T>8192 pallas->chunked gate in models/rwkv.py).
    # Reproduce the program shape directly — 24 back-to-back v7 Mosaic
    # calls with interleaved projections — bypassing the gate.
    import jax
    import jax.numpy as jnp

    from paper_accurate_fast_cheap_tpu.ops.wkv6_pallas import wkv6_pallas

    B, T, H, N = 8, 2250, 8, 64  # post-ds4 length of the 9000-frame window
    D = H * N
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    x0 = jax.random.normal(keys[0], (B, T, D), jnp.bfloat16)
    proj = jax.random.normal(keys[1], (24, D, 4 * D), jnp.bfloat16) * 0.02
    u = jax.random.normal(keys[2], (H, N), jnp.bfloat16) * 0.1

    @jax.jit
    def run(x, pr, uu):
        for i in range(24):
            rkvw = (x @ pr[i]).reshape(B, T, 4, H, N)
            r, k, v = rkvw[:, :, 0], rkvw[:, :, 1], rkvw[:, :, 2]
            w = -jnp.abs(rkvw[:, :, 3].astype(jnp.float32)) - 0.5
            y = wkv6_pallas(r.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32), w, uu.astype(jnp.float32),
                            version=7)
            x = x + y.reshape(B, T, D).astype(jnp.bfloat16)
        return x

    out = run(x0, proj, u)
    print("v7_encoder survived:", float(out.sum()))


def case_pallas_lf():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from paper_accurate_fast_cheap_tpu.ops.wkv6_pallas import wkv6_pallas

    B, T, H, N = 4, 20000, 8, 64
    # REAL-ish data mattered: zeros passed, decoded audio crashed.  Use
    # wide-dynamic-range values shaped like post-projection activations.
    rng = np.random.RandomState(0)
    mk = lambda scale: jnp.asarray(
        (rng.randn(B, T, H, N) * scale).astype(np.float32))
    r, k, v = mk(1.0), mk(0.5), mk(4.0)
    w = jnp.asarray(-np.abs(rng.randn(B, T, H, N) * 2.0 + 2.0)
                    .astype(np.float32))
    u = jnp.asarray((rng.randn(H, N) * 0.1).astype(np.float32))
    y = jax.jit(wkv6_pallas)(r, k, v, w, u)
    print("pallas_lf survived:", float(y.sum()))


def case_sort_topk():
    import jax
    import jax.numpy as jnp
    from jax import lax

    B, BEAM, V, STEPS = 64, 8, 5002, 3000
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, BEAM, V),
                           jnp.float32)

    @jax.jit
    def run(x):
        def body(carry, _):
            vals, idx = lax.top_k(carry, BEAM)
            nxt = carry * 0.999 + jnp.sum(vals, -1, keepdims=True) * 1e-6
            return nxt, idx
        return lax.scan(body, x, None, length=STEPS)

    final, idxs = run(x0)
    print("sort_topk survived:", float(final.sum()), idxs.shape)


def case_pinned_outer_jit():
    # Round-4 crash (#5/#6 of the log, REPEATED): a pallas kernel whose
    # weights are VMEM-pinned via `with_memory_space_constraint`, traced
    # inside an ENCLOSING jit alongside a large encoder program, kills
    # the worker at runtime — the identical kernel run as its own jitted
    # program passes (the product beam runs it that way; bench.py and
    # `recognize_wav --fuse split` moved to the two-dispatch form for
    # exactly this reason).  Recovery was minutes (not hours) both
    # times.  This rebuilds the retired single-dispatch chain with the
    # fused predictor forced on under the outer trace.
    import os

    os.environ["PAFC_PRED_FUSED"] = "force"
    import sys as _sys
    import pathlib

    root = str(pathlib.Path(__file__).resolve().parents[2])
    if root not in _sys.path:
        _sys.path.insert(0, root)
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import FLAGSHIP_ENCODER, VOCAB
    from paper_accurate_fast_cheap_tpu.decode import rnnt_search
    from paper_accurate_fast_cheap_tpu.models import factory

    config = {
        "model": "transducer", "encoder": "conformer",
        "encoder_conf": {k: v for k, v in FLAGSHIP_ENCODER.items()
                         if k != "input_size"},
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 640, "output_size": 640,
                           "embed_dropout": 0.1, "hidden_size": 640,
                           "num_layers": 2, "dropout": 0.1},
        "joint_conf": {"join_dim": 640},
        "decoder": None,
        "model_conf": {"ctc_weight": 0.3, "transducer_weight": 0.7,
                       "attention_weight": 0.0},
    }
    model, _ = factory.init_model(config, VOCAB, 80)
    B, T = 32, 9000
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80)
                              ).astype(jnp.bfloat16)
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(jax.random.PRNGKey(1),
                        feats[:1, :256].astype(jnp.float32), lens[:1],
                        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    ps, js, init = rnnt_search.make_transducer_step_fns(model, params)

    @jax.jit
    def full_chain(prm, f, l):
        enc, el = model.apply(prm, f, l, method=model.forward_encoder)
        logp = model.apply(prm, enc, method=model.ctc_logprobs)
        return rnnt_search.pack_device_beam(rnnt_search.rnnt_beam_search(
            ps, js, init, enc, el, logp, beam_size=8, ctc_weight=0.3,
            transducer_weight=0.7, impl="device", params=prm,
            defer=True))

    res = rnnt_search.finalize_device_beam(
        full_chain(params, feats, lens), beam=8)
    print("pinned_outer_jit survived:", len(res))


def case_pinned_bisect(pinned_mb: float, buffers: int,
                       with_encoder: bool):
    # Round-5 bisect instrument for the pinned_outer_jit envelope: the
    # joint-W pin ALONE (6.4 MB, 2 buffers) survived the enclosing jit
    # while the fused-LSTM pack (~14 MB, +1 buffer) killed the worker —
    # so the boundary is somewhere in pinned BYTES or pinned BUFFER
    # COUNT per program.  This builds `buffers` VMEM-pinned bf16
    # weights totalling `pinned_mb` MB, feeds them to a toy pallas
    # matmul kernel traced INSIDE an enclosing jit (optionally next to
    # a large XLA matmul chain approximating the encoder's footprint),
    # and fetches the result.  Bisect by calling with increasing sizes:
    # each crash costs minutes of worker recovery (this class recovered
    # fast both times, NOTES.md round-4).
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = 512
    per = pinned_mb * 1024 * 1024 / buffers
    H = max(128, int(per / (D * 2)) // 128 * 128)  # bf16 cols per buffer
    total_mb = buffers * D * H * 2 / 1024 / 1024
    print(f"pinned_bisect: {buffers} buffers x ({D},{H}) bf16 = "
          f"{total_mb:.1f} MB pinned, with_encoder={with_encoder}",
          flush=True)

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        acc = jnp.zeros((x_ref.shape[0], H), jnp.float32)
        for w_ref in refs[:-1]:
            acc += jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(jnp.bfloat16)

    ws = [jax.random.normal(jax.random.PRNGKey(i), (D, H)
                            ).astype(jnp.bfloat16) * 0.02
          for i in range(buffers)]
    big = jax.random.normal(jax.random.PRNGKey(99), (4096, D)
                            ).astype(jnp.bfloat16)

    def pinned_call(x, ws):
        ws = [pltpu.with_memory_space_constraint(w, pltpu.VMEM)
              for w in ws]
        return pl.pallas_call(
            kernel,
            grid=(x.shape[0] // 256,),
            in_specs=[pl.BlockSpec((256, D), lambda i: (i, 0))]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ws),
            out_specs=pl.BlockSpec((256, H), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], H),
                                           jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, *ws)

    @jax.jit
    def enclosing(big, ws):
        z = big
        if with_encoder:
            # ~an encoder's worth of XLA matmul traffic in the SAME
            # program, so the pinned kernel competes with XLA's own
            # VMEM allocations (the suspected crash ingredient)
            for _ in range(12):
                z = jnp.tanh(z @ jnp.ones((D, D), jnp.bfloat16) * 0.01)
        y = pinned_call(z[:4096], ws)
        return y.sum()

    import numpy as np
    v = float(np.asarray(enclosing(big, ws)))
    print(f"pinned_bisect survived: {v:.4f} "
          f"({total_mb:.1f} MB / {buffers} buffers)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True,
                    choices=["v7_encoder", "pallas_lf", "sort_topk",
                             "pinned_outer_jit", "pinned_bisect"])
    ap.add_argument("--pinned_mb", type=float, default=10.0,
                    help="pinned_bisect: total pinned MB")
    ap.add_argument("--buffers", type=int, default=2,
                    help="pinned_bisect: number of pinned buffers")
    ap.add_argument("--no_encoder", action="store_true",
                    help="pinned_bisect: drop the co-resident XLA chain")
    ap.add_argument("--i-accept-worker-loss", action="store_true")
    args = ap.parse_args()
    if not args.i_accept_worker_loss:
        sys.exit("refusing: pass --i-accept-worker-loss (recovery takes "
                 "50 min - 3.5 h if the repro succeeds)")
    _require_tpu()
    t0 = time.time()
    if args.case == "pinned_bisect":
        case_pinned_bisect(args.pinned_mb, args.buffers,
                           not args.no_encoder)
    else:
        {"v7_encoder": case_v7_encoder,
         "pallas_lf": case_pallas_lf,
         "sort_topk": case_sort_topk,
         "pinned_outer_jit": case_pinned_outer_jit}[args.case]()
    print(f"done in {time.time() - t0:.1f}s (no crash this run)")


if __name__ == "__main__":
    main()
