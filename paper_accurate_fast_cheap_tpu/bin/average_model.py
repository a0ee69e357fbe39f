"""Checkpoint averaging CLI.

Parity target: `wenet/bin/average_model.py` — average the val-best N or the
last N epoch checkpoints into one (`:15-50`).
"""
from __future__ import annotations

import argparse
import logging
import sys

import jax
import jax.numpy as jnp


def get_args(argv=None):
    p = argparse.ArgumentParser(description="average checkpoints")
    p.add_argument("--src_path", required=True, help="model dir")
    p.add_argument("--dst_path", required=True, help="output checkpoint dir")
    p.add_argument("--num", type=int, default=5)
    p.add_argument("--val_best", action="store_true",
                   help="pick by lowest cv_loss instead of last N")
    p.add_argument("--config", required=True,
                   help="train.yaml (to build the params template)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.text.tokenizers import init_tokenizer
    from paper_accurate_fast_cheap_tpu.train import checkpointing
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    tokenizer = init_tokenizer(config)
    input_dim = config.get("dataset_conf", {}).get(
        "fbank_conf", {}).get("num_mel_bins", 80)
    model, _ = factory.init_model(config, tokenizer.vocab_size(), input_dim)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, input_dim)),
        jnp.asarray([64]), jnp.ones((1, 4), jnp.int32), jnp.asarray([4]),
    )

    if args.val_best:
        paths = checkpointing.select_best_checkpoints(args.src_path,
                                                      args.num)
    else:
        paths = [p for p in checkpointing.list_checkpoints(args.src_path)
                 if "epoch_" in p][-args.num:]
    if not paths:
        logging.error("no checkpoints found in %s", args.src_path)
        return 1
    logging.info("averaging %d checkpoints: %s", len(paths), paths)
    avg = checkpointing.average_checkpoints(paths, template)
    checkpointing.save_checkpoint(
        args.dst_path, avg,
        info={"averaged_from": paths, "tag": "average"})
    return 0


if __name__ == "__main__":
    sys.exit(main())
