"""Training-step throughput benchmark CLI.

The reference reports no training-throughput numbers; production cost is
set by the jitted train-step time.  This measures the FULL step (forward
+ backward + clip + optimizer) on synthetic batches of a given
(batch, frames, label) shape and reports steps/s, audio-hours ingested
per hour of compute, and frames/s — the training analog of
`bin/encoder_rtf.py`.

Usage:
  python -m paper_accurate_fast_cheap_tpu.bin.train_bench \
      --config examples/gigaspeech/conf/rwkvbi_ds4k31nc_12le_trans_shortform.yaml \
      --batch_size 16 --frames 1500 --label_len 40
"""
from __future__ import annotations

import functools
import argparse
import logging
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="train-step throughput bench")
    p.add_argument("--config", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--frames", type=int, default=1500,
                   help="feature frames per utterance (1500 = 15 s)")
    p.add_argument("--label_len", type=int, default=40)
    p.add_argument("--accum_grad", type=int, default=None,
                   help="override config accum_grad")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bf16 params end-to-end (no fp32 master; "
                        "measures the raw bf16 ceiling)")
    p.add_argument("--mixed_precision", action="store_true", default=False,
                   help="bf16 compute over fp32 master weights "
                        "(config `dtype: bf16`, the production mode)")
    p.add_argument("--output", default=None)
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="dotted config override, e.g. "
                        "--set encoder_conf.rwkv_conf.wkv_impl=chunked_ad "
                        "(repeatable; lets A/B runs share one yaml)")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                   help="force a jax platform (the container pre-registers "
                        "the remote TPU backend; 'cpu' benches locally)")
    p.add_argument("--profile", action="store_true", default=False,
                   help="decompose the step: time forward-only and "
                        "forward+backward as chained on-device loops "
                        "(relay-safe, see encoder_rtf) and report "
                        "forward / backward / optimizer+clip splits")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.train import schedulers
    from paper_accurate_fast_cheap_tpu.train import train_step as ts
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    if args.overrides:
        from paper_accurate_fast_cheap_tpu.utils.config import (
            override_config,
        )

        config = override_config(config, args.overrides)
    input_dim = config.get("dataset_conf", {}).get(
        "fbank_conf", {}).get("num_mel_bins", 80)
    vocab = config.get("vocab_size_for_bench", 5002)
    model, model_type = factory.init_model(config, vocab, input_dim)

    B, T, U = args.batch_size, args.frames, args.label_len
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (B, T, input_dim))
    lens = jnp.full((B,), T, jnp.int32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (B, U), 1, vocab)
    llens = jnp.full((B,), U, jnp.int32)
    params = model.init(jax.random.PRNGKey(2), feats[:1, :256], lens[:1],
                        labels[:1, :4], jnp.asarray([4]))
    if args.bf16:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    optim_conf = config.get("optim_conf", {})
    sched = schedulers.SCHEDULERS[config.get("scheduler", "warmuplr")](
        optim_conf.get("lr", 1e-3),
        config.get("scheduler_conf", {}).get("warmup_steps", 25000),
    )
    optimizer = ts.make_optimizer(
        config.get("optim", "adam"), sched,
        weight_decay=optim_conf.get("weight_decay", 0.0),
        grad_clip=config.get("grad_clip", 5.0),
    )

    def loss_fn(p, batch, step_rng):
        out = model.apply(p, *batch, deterministic=False,
                          rngs={"dropout": step_rng})
        return out["loss"], {}

    if args.mixed_precision:
        loss_fn = ts.wrap_mixed_precision(loss_fn)

    accum = args.accum_grad or config.get("accum_grad", 1)
    step_fn = jax.jit(ts.make_train_step(
        loss_fn, optimizer, accum_steps=accum,
        clip_hard_maxvalue=config.get("clip_hard_maxvalue", 0.0),
    ))
    state = ts.init_train_state(params, optimizer)
    batch = (feats, lens, labels, llens)
    if accum > 1:
        if B % accum:
            raise SystemExit(f"batch_size {B} not divisible by "
                             f"accum_grad {accum}")
        batch = jax.tree.map(
            lambda x: x.reshape((accum, B // accum) + x.shape[1:]), batch)

    compile_t0 = time.perf_counter()
    for i in range(max(args.warmup, 1)):
        state, loss, _ = step_fn(state, batch, jax.random.PRNGKey(10 + i))
        loss_v = float(loss)
    compile_s = time.perf_counter() - compile_t0
    assert np.isfinite(loss_v), loss_v

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, loss, _ = step_fn(state, batch, jax.random.PRNGKey(100 + i))
    float(loss)  # drain
    elapsed = time.perf_counter() - t0

    profile_lines = []
    if args.profile:
        # stage decomposition with relay-honest chained loops (the
        # transport skips dispatches whose outputs are never fetched —
        # NOTES.md; each loop carries a scalar derived from the stage's
        # real outputs back into the inputs, so one dispatch + one fetch
        # forces exactly n executions)
        def perturb(b, s):
            return tuple(
                x + s.astype(x.dtype) if jnp.issubdtype(x.dtype,
                                                        jnp.floating) else x
                for x in b)

        mb = (jax.tree.map(lambda x: x[0], batch) if accum > 1 else batch)

        def fwd_once(p, s, rng):
            loss, _ = loss_fn(p, perturb(mb, s), rng)
            return loss.astype(jnp.float32) * 1e-30

        def grad_once(p, s, rng):
            (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, perturb(mb, s), rng)
            gsum = sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))
            return (loss.astype(jnp.float32) + gsum.astype(jnp.float32)
                    ) * 1e-30

        @functools.partial(jax.jit, static_argnames=("which",))
        def timed(p, n, which):
            fn = fwd_once if which == "fwd" else grad_once
            return jax.lax.fori_loop(
                0, n,
                lambda i, s: fn(p, s, jax.random.PRNGKey(0)),
                jnp.float32(0))

        stage_ms = {}
        for which in ("fwd", "grad"):
            float(timed(state.params, max(args.warmup, 1), which))
            t0 = time.perf_counter()
            float(timed(state.params, args.iters, which))
            stage_ms[which] = ((time.perf_counter() - t0)
                               / args.iters * 1e3 * accum)
        full_ms = elapsed / args.iters * 1e3
        profile_lines = [
            f"profile_forward_ms {stage_ms['fwd']:.2f}",
            f"profile_backward_ms {stage_ms['grad'] - stage_ms['fwd']:.2f}",
            f"profile_fwd_plus_bwd_ms {stage_ms['grad']:.2f}",
            "profile_optimizer_clip_accum_ms "
            f"{max(full_ms - stage_ms['grad'], 0.0):.2f}",
            "profile_note per-optimizer-step (microbatch times x "
            f"accum={accum}); grad loop adds one |g| reduction",
        ]

    steps_per_s = args.iters / elapsed
    # batch_size is the TOTAL utterances per optimizer step (split into
    # accum microbatches when accum > 1)
    audio_s_per_step = B * T * 0.01
    audio_hours_per_hour = steps_per_s * audio_s_per_step
    frames_per_s = steps_per_s * B * T
    import os as _os

    name = _os.path.splitext(_os.path.basename(args.config))[0]
    lines = [
        f"model {name}.train_step ({model_type}, {n_params/1e6:.1f}M params)",
        f"step_time_ms {elapsed/args.iters*1e3:.2f}",
        f"steps_per_sec {steps_per_s:.3f}",
        f"audio_hours_per_compute_hour {audio_hours_per_hour:.1f}",
        f"frames_per_sec {frames_per_s:.0f}",
        f"batch {B} frames {T} labels {U} accum {accum}",
        "precision " + ("bf16" if args.bf16 else
                        "mixed_bf16" if args.mixed_precision else "fp32"),
        f"final_loss {loss_v:.3f}",
        f"warmup_plus_compile_s {compile_s:.2f}",
        f"device {jax.devices()[0]}",
    ] + profile_lines
    report = "\n".join(lines)
    print(report)
    if args.output:
        with open(args.output, "w") as f:
            f.write(report + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
