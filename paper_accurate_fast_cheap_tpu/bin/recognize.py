"""Short-form batch decoding CLI.

Parity target: `wenet/bin/recognize.py` — shard/raw list decode over modes
{ctc_greedy_search, ctc_prefix_beam_search, attention_rescoring,
rnnt_beam_search} (`:67-81`), test-conf surgery (no augmentation, static
batch, dither 0, `:210-253`), writes `result_dir/<mode>/text`
(`:387-393`).
"""
from __future__ import annotations

import argparse
import functools
import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

SUPPORTED_MODES = [
    "ctc_greedy_search",
    "ctc_prefix_beam_search",
    "attention_rescoring",
    "rnnt_beam_search",
]


def get_args(argv=None):
    p = argparse.ArgumentParser(description="batch decode")
    p.add_argument("--config", required=True, help="train.yaml")
    p.add_argument("--test_data", required=True)
    p.add_argument("--data_type", default="shard",
                   choices=["raw", "shard", "zip_shard"])
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--result_dir", required=True)
    p.add_argument("--modes", nargs="+", default=["ctc_greedy_search"],
                   choices=SUPPORTED_MODES)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--beam_size", type=int, default=8)
    p.add_argument("--ctc_weight", type=float, default=0.3)
    p.add_argument("--transducer_weight", type=float, default=0.7)
    p.add_argument("--rescore_ctc_weight", type=float, default=0.3)
    p.add_argument("--reverse_weight", type=float, default=0.0)
    p.add_argument("--blank_penalty", type=float, default=0.0)
    return p.parse_args(argv)


def build_decode_assets(config, checkpoint, input_dim=80):
    """Load tokenizer/model/params for decoding; shared with recognize_wav."""
    from paper_accurate_fast_cheap_tpu.frontend import cmvn as cmvn_lib
    from paper_accurate_fast_cheap_tpu.frontend.pipeline import (
        make_feature_fn,
    )
    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.text.tokenizers import init_tokenizer
    from paper_accurate_fast_cheap_tpu.train import checkpointing

    tokenizer = init_tokenizer(config)
    vocab_size = tokenizer.vocab_size()
    cmvn_stats = None
    if config.get("cmvn") == "global_cmvn":
        cc = config.get("cmvn_conf", {})
        cmvn_stats = cmvn_lib.load_cmvn(cc["cmvn_file"],
                                        cc.get("is_json_cmvn", True))
    dataset_conf = dict(config.get("dataset_conf", {}))
    # test-conf surgery: no augmentation, dither off
    dataset_conf["spec_aug"] = False
    dataset_conf["spec_sub"] = False
    dataset_conf["speed_perturb"] = False
    fb = dict(dataset_conf.get("fbank_conf", {}))
    fb["dither"] = 0.0
    dataset_conf["fbank_conf"] = fb
    input_dim = fb.get("num_mel_bins", input_dim)

    # decode path: prefer the fused Pallas wkv kernel (forward-only)
    config = dict(config)
    enc_conf = dict(config.get("encoder_conf", {}))
    enc_conf.setdefault("wkv_impl", "pallas")
    config["encoder_conf"] = enc_conf
    model, model_type = factory.init_model(config, vocab_size, input_dim)
    feats0 = jnp.zeros((1, 64, input_dim))
    params0 = model.init(jax.random.PRNGKey(0), feats0,
                         jnp.asarray([64]), jnp.ones((1, 4), jnp.int32),
                         jnp.asarray([4]))
    params, _, _ = checkpointing.load_checkpoint(checkpoint, params0)
    # cross-platform restores fall back to NUMPY leaves ("placement
    # happens lazily"): a jit called with host-numpy weights re-uploads
    # the whole param set on EVERY dispatch — ~4 s/call for the flagship
    # through the remote-TPU relay (measured, NOTES.md r3).  Commit the
    # tree to device once, here, for every decode CLI.
    params = jax.device_put(params)
    featurize = make_feature_fn(dataset_conf, cmvn_stats)
    return tokenizer, model, model_type, params, featurize, dataset_conf


def decode_batch(model, model_type, params, feats, feat_lens, args, sos,
                 eos):
    """Run all requested modes on one device batch of features."""
    from paper_accurate_fast_cheap_tpu.decode import rnnt_search, search

    results = {}
    enc, enc_lens = model.apply(params, feats, feat_lens,
                                method=model.forward_encoder)
    logp = model.apply(params, enc, method=model.ctc_logprobs)
    logp_np = np.asarray(logp)
    lens_np = np.asarray(enc_lens)
    for mode in args.modes:
        if mode == "ctc_greedy_search":
            results[mode] = search.ctc_greedy_search(logp_np, lens_np)
        elif mode == "ctc_prefix_beam_search":
            results[mode] = search.ctc_prefix_beam_search(
                logp_np, lens_np, beam_size=args.beam_size)
        elif mode == "attention_rescoring":
            nbest = search.ctc_prefix_beam_search(
                logp_np, lens_np, beam_size=args.beam_size)

            def dec_apply(e, l, ys, yl, rys, rw):
                return model.apply(params, e, l, ys, yl, rys, rw,
                                   method=model.decoder_forward)

            results[mode] = search.attention_rescoring(
                dec_apply, enc, enc_lens, nbest, sos, eos,
                ctc_weight=args.rescore_ctc_weight,
                reverse_weight=args.reverse_weight,
            )
        elif mode == "rnnt_beam_search":
            assert model_type == "transducer", \
                "rnnt_beam_search needs a transducer model"
            predictor_step, joint_step, init_state_fn = \
                rnnt_search.make_transducer_step_fns(model, params)
            results[mode] = rnnt_search.rnnt_beam_search(
                predictor_step, joint_step, init_state_fn, enc, enc_lens,
                logp, beam_size=args.beam_size,
                ctc_weight=args.ctc_weight,
                transducer_weight=args.transducer_weight,
                params=params,
            )
    return results


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    from paper_accurate_fast_cheap_tpu.data import pipeline as dp
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    tokenizer, model, model_type, params, featurize, dataset_conf = \
        build_decode_assets(config, args.checkpoint)
    special = config.get("tokenizer_conf", {}).get("special_tokens", {})
    sos = special.get("<sos>", tokenizer.vocab_size() - 1)
    eos = special.get("<eos>", tokenizer.vocab_size() - 1)

    dataset_conf = dict(dataset_conf)
    dataset_conf["batch_conf"] = {"batch_type": "static",
                                  "batch_size": args.batch_size}
    dataset_conf["shuffle"] = False

    files = {}
    for mode in args.modes:
        d = os.path.join(args.result_dir, mode)
        os.makedirs(d, exist_ok=True)
        files[mode] = open(os.path.join(d, "text"), "w", encoding="utf-8")
    try:
        for batch in dp.build_dataset(args.data_type, args.test_data,
                                      tokenizer, dataset_conf,
                                      partition=False, mode="test"):
            feats, feat_lens = featurize(
                jnp.asarray(batch["wavs"]), jnp.asarray(batch["wav_lens"]),
                train=False,
            )
            results = decode_batch(model, model_type, params, feats,
                                   feat_lens, args, sos, eos)
            for mode, res in results.items():
                for key, r in zip(batch["keys"], res):
                    text, _ = tokenizer.detokenize(r.tokens)
                    files[mode].write(f"{key} {text}\n")
                    logging.info("%s %s: %s", mode, key, text)
    finally:
        for f in files.values():
            f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
