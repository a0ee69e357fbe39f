"""Training CLI.

Parity target: `wenet/bin/train.py` + the arg groups of
`wenet/utils/train_utils.py:45-197` (config, data lists, model_dir,
checkpoint resume, override_config).  Multi-host TPU: `--multichip` shards
the batch over a data mesh (`jax.distributed` initialization is implicit
under TPU runtimes; torchrun/DDP has no equivalent here).

Usage:
  python -m paper_accurate_fast_cheap_tpu.bin.train \
      --config conf/train.yaml --train_data shards.txt --cv_data cv.txt \
      --data_type shard --model_dir exp/run1
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="train an ASR model")
    p.add_argument("--config", required=True)
    p.add_argument("--train_data", required=True)
    p.add_argument("--cv_data", default=None)
    p.add_argument("--data_type", default="shard",
                   choices=["raw", "shard", "zip_shard"])
    p.add_argument("--model_dir", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir to resume from")
    p.add_argument("--override_config", action="append", default=[])
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--multichip", action="store_true",
                   help="shard batches over all local devices")
    p.add_argument("--pp_stages", type=int, default=0,
                   help="pipeline-parallel: shard the encoder block "
                        "stack over this many devices (GPipe schedule, "
                        "parallel/pp_encoder.py); grads are exact vs "
                        "sequential. Dropout inside the pipelined "
                        "blocks is disabled")
    p.add_argument("--pp_microbatches", type=int, default=None,
                   help="microbatches for --pp_stages (default = stages)")
    # multi-HOST launch (the torchrun/ssh_launcher equivalent,
    # `run-pipeline-v3.sh:129-150`, `tools/ssh_launcher.py`): run one
    # process per host with the same coordinator address; on a TPU pod
    # slice `--dist_auto` needs no other flags (jax reads the metadata)
    p.add_argument("--dist_auto", action="store_true",
                   help="jax.distributed.initialize() with pod autodetect")
    p.add_argument("--dist_coordinator", default=None,
                   help="coordinator host:port (every process passes the "
                        "same value)")
    p.add_argument("--dist_num_processes", type=int, default=None)
    p.add_argument("--dist_process_id", type=int, default=None)
    p.add_argument("--print_model", action="store_true")
    # wandb system-of-record (`train_utils.py:506-544`, `checkpoint.py:
    # 266-291`); all gated on wandb importability
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--wandb_project", default=None)
    p.add_argument("--load_from_wandb", default=None,
                   help="wandb project to resume from (latest optimizer-"
                        "bearing snapshot artifact)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )
    if args.dist_auto or args.dist_coordinator:
        # must run before any other jax use in this process
        import jax as _jax

        if args.dist_auto:
            _jax.distributed.initialize()
        else:
            _jax.distributed.initialize(
                coordinator_address=args.dist_coordinator,
                num_processes=args.dist_num_processes,
                process_id=args.dist_process_id,
            )
        logging.info(
            "jax.distributed: process %d/%d, %d global devices",
            _jax.process_index(), _jax.process_count(),
            _jax.device_count())

    from paper_accurate_fast_cheap_tpu.data import pipeline as data_pipeline
    from paper_accurate_fast_cheap_tpu.frontend import cmvn as cmvn_lib
    from paper_accurate_fast_cheap_tpu.frontend.pipeline import (
        make_feature_fn,
    )
    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.parallel import mesh as mesh_lib
    from paper_accurate_fast_cheap_tpu.text.tokenizers import init_tokenizer
    from paper_accurate_fast_cheap_tpu.train import (
        checkpointing,
        executor as executor_lib,
        schedulers,
        train_step as ts,
    )
    from paper_accurate_fast_cheap_tpu.utils.config import (
        load_config,
        override_config,
        save_config,
    )

    config = override_config(load_config(args.config),
                             args.override_config)
    tokenizer = init_tokenizer(config)
    vocab_size = tokenizer.vocab_size()

    cmvn_stats = None
    if config.get("cmvn") == "global_cmvn":
        cc = config.get("cmvn_conf", {})
        cmvn_stats = cmvn_lib.load_cmvn(cc["cmvn_file"],
                                        cc.get("is_json_cmvn", True))

    dataset_conf = config.get("dataset_conf", {})
    input_dim = dataset_conf.get("fbank_conf", {}).get("num_mel_bins", 80)
    model, model_type = factory.init_model(config, vocab_size, input_dim)
    featurize = make_feature_fn(dataset_conf, cmvn_stats)

    # init params from one synthetic batch shape
    rng = jax.random.PRNGKey(args.seed)
    feats0 = jnp.zeros((2, 128, input_dim))
    lens0 = jnp.full((2,), 128, jnp.int32)
    labels0 = jnp.ones((2, 8), jnp.int32)
    llens0 = jnp.full((2,), 8, jnp.int32)
    params = model.init(rng, feats0, lens0, labels0, llens0)
    if args.print_model:
        n = sum(x.size for x in jax.tree.leaves(params))
        print(f"model: {model_type}, params: {n/1e6:.2f} M")

    optim_conf = config.get("optim_conf", {})
    sched_name = config.get("scheduler", "warmuplr")
    sched = schedulers.SCHEDULERS[sched_name](
        optim_conf.get("lr", 1e-3),
        config.get("scheduler_conf", {}).get("warmup_steps", 25000),
    )
    trainable_mask = None
    rl = config.get("restrict_learning")
    if rl:
        trainable_mask = ts.restrict_learning_mask(
            params, exclude=rl.get("exclude"), include=rl.get("include")
        )
    optimizer = ts.make_optimizer(
        config.get("optim", "adam"), sched,
        weight_decay=optim_conf.get("weight_decay", 0.0),
        grad_clip=config.get("grad_clip", 5.0),
    )

    def loss_fn(p, batch, step_rng):
        out = model.apply(p, *batch, deterministic=False,
                          rngs={"dropout": step_rng})
        metrics = {k: v for k, v in out.items() if k != "loss"}
        return out["loss"], metrics

    if args.pp_stages:
        from jax.sharding import Mesh

        from paper_accurate_fast_cheap_tpu.parallel import pp_encoder

        if jax.device_count() < args.pp_stages:
            raise SystemExit(
                f"--pp_stages {args.pp_stages} needs that many devices "
                f"(have {jax.device_count()})")
        pp_mesh = Mesh(np.array(jax.devices()[:args.pp_stages]),
                       ("stage",))
        enc_conf_pp = factory.encoder_conf_from_yaml(
            config.get("encoder_conf", {}), input_dim)
        loss_fn = pp_encoder.make_pp_loss_fn(
            model, enc_conf_pp, pp_mesh,
            n_microbatches=args.pp_microbatches)
        logging.info("pipeline parallelism: %d stages over %s",
                     args.pp_stages, pp_mesh.devices)

    # mixed precision: config `dtype: bf16` (the reference's deepspeed
    # config key; its AMP analog is train_utils.py use_amp) runs the
    # forward/backward with bf16-cast params over fp32 master weights
    train_dtype = str(config.get("dtype", "fp32")).lower()
    if train_dtype in ("bf16", "bfloat16"):
        loss_fn = ts.wrap_mixed_precision(loss_fn)
        logging.info("mixed precision: bf16 compute over fp32 master")
    elif train_dtype not in ("fp32", "float32"):
        raise SystemExit(f"unsupported dtype {train_dtype!r} "
                         "(fp32 or bf16)")

    step_fn = ts.make_train_step(
        loss_fn, optimizer,
        accum_steps=config.get("accum_grad", 1),
        clip_hard_maxvalue=config.get("clip_hard_maxvalue", 0.0),
        trainable_mask=trainable_mask,
    )
    state = ts.init_train_state(params, optimizer)

    start_epoch = 0
    if args.load_from_wandb and not args.checkpoint:
        from paper_accurate_fast_cheap_tpu.train.metrics_logger import (
            download_checkpoint_from_wandb,
        )

        fetched = download_checkpoint_from_wandb(args.load_from_wandb)
        if fetched:
            args.checkpoint = fetched
            logging.info("resuming from wandb snapshot %s", fetched)
        else:
            logging.warning("--load_from_wandb: no snapshot found "
                            "(or wandb unavailable); fresh start")
    if args.checkpoint:
        params, opt, info = checkpointing.load_checkpoint(
            args.checkpoint, state.params, state.opt_state
        )
        state = ts.TrainState(
            jnp.asarray(info.get("step", 0), jnp.int32), params,
            opt if opt is not None else state.opt_state,
        )
        start_epoch = int(info.get("epoch", -1)) + 1

    if args.multichip and jax.device_count() > 1:
        mesh = mesh_lib.make_mesh()
        repl = mesh_lib.replicated(mesh)
        dsh = mesh_lib.data_sharding(mesh)
        state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        jit_step = jax.jit(
            step_fn,
            in_shardings=(repl, (dsh, dsh, dsh, dsh), repl),
            out_shardings=(repl, repl, repl),
        )
    else:
        jit_step = jax.jit(step_fn)

    @jax.jit
    def eval_loss(p, batch):
        out = model.apply(p, *batch, deterministic=True)
        return out["loss"], out

    os.makedirs(args.model_dir, exist_ok=True)
    save_config(config, os.path.join(args.model_dir, "train.yaml"))

    from paper_accurate_fast_cheap_tpu.train.metrics_logger import (
        MetricsLogger,
    )

    logger = MetricsLogger(os.path.join(args.model_dir, "logs"),
                           use_wandb=args.use_wandb,
                           wandb_config={"project": args.wandb_project,
                                         "config": config})
    if args.use_wandb:
        # run provenance: code tree + data lists + tokenizer files
        tok_conf = config.get("tokenizer_conf", {})
        logger.log_run_artifacts(
            code_dir=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            data_lists=[args.train_data, args.cv_data],
            tokenizer_files=[tok_conf.get("symbol_table_path"),
                             tok_conf.get("bpe_path")],
        )
    snap_conf = config.get("snapshot_saving_conf", {})
    ex = executor_lib.Executor(
        jit_step, eval_loss, featurize,
        model_dir=args.model_dir,
        log_interval=config.get("log_interval", 100),
        save_interval=snap_conf.get("save_interval", 0),
        save_optimizer_every=snap_conf.get("save_optimizer_every", 10),
        use_named_snapshots=snap_conf.get("use_named_snapshots", False),
        seed=args.seed,
        metrics_logger=logger,
    )
    ex.step = int(state.step)

    num_epochs = args.num_epochs or config.get("max_epoch", 1)

    def train_batches(epoch):
        return data_pipeline.build_dataset(
            args.data_type, args.train_data, tokenizer, dataset_conf,
            partition=True, mode="train", seed=args.seed + epoch,
        )

    def cv_batches():
        if args.cv_data is None:
            return iter(())
        cv_conf = dict(dataset_conf)
        cv_conf["speed_perturb"] = False
        cv_conf["spec_aug"] = False
        cv_conf["shuffle"] = False
        return data_pipeline.build_dataset(
            args.data_type, args.cv_data, tokenizer, cv_conf,
            partition=False, mode="cv",
        )

    for epoch in range(start_epoch, num_epochs):
        state = ex.train_epoch(state, train_batches(epoch), epoch,
                               cv_batches=cv_batches, lr_of_step=sched)
        cv_loss = ex.cv(state.params, cv_batches()) if args.cv_data else None
        logging.info("epoch %d done, cv_loss=%s", epoch, cv_loss)
        ex.save_epoch(state, epoch, cv_loss)
    return 0


if __name__ == "__main__":
    sys.exit(main())
