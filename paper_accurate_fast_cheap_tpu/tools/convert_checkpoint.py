"""Convert a WeNet/reference torch checkpoint to this framework's params.

Maps the reference's state_dict names (conformer + RWKV-bi + transducer, the
paper's flagship: `wenet/transformer/encoder.py`, `wenet/rwkv_v6/`,
`wenet/transducer/`) onto our flax parameter tree so users of the PyTorch
reference can bring trained models across.  Layout rules:

  torch Linear weight (out, in)      -> flax Dense kernel (in, out)
  torch Conv2d (O, I, H, W)          -> flax Conv (H, W, I, O)
  torch Conv1d (O, I, K)             -> flax Conv (K, I, O)
  torch depthwise Conv1d (C, 1, K)   -> flax Conv fgc=C (K, 1, C)
  torch LSTM weight_ih_l{k} (4H, E)  -> LSTMLayer ih kernel (E, 4H)
    (same i,f,g,o gate order; bias_ih + bias_hh fold into one bias)
  RWKV time_* tensors                -> squeezed to our shapes

Run with --checkpoint model.pt (torch CPU load) or feed a state-dict via
`convert_state_dict` programmatically.
"""
from __future__ import annotations

import argparse
import logging
import re
import sys
from typing import Any, Dict

import numpy as np

log = logging.getLogger(__name__)


def _dense(sd, prefix, dst, bias=True):
    dst["kernel"] = np.asarray(sd[prefix + ".weight"]).T
    if bias and prefix + ".bias" in sd:
        dst["bias"] = np.asarray(sd[prefix + ".bias"])


def _norm(sd, prefix, dst):
    dst["scale"] = np.asarray(sd[prefix + ".weight"])
    dst["bias"] = np.asarray(sd[prefix + ".bias"])


def _tmix(sd, prefix, dst):
    for name in ("time_maa_x", "time_maa_r", "time_maa_k", "time_maa_v",
                 "time_maa_w"):
        dst[name] = np.asarray(sd[f"{prefix}.{name}"]).reshape(-1)
    dst["time_maa_rkvw_w1"] = np.asarray(sd[f"{prefix}.time_maa_rkvw_w1"])
    dst["time_maa_rkvw_w2"] = np.asarray(sd[f"{prefix}.time_maa_rkvw_w2"])
    dst["time_decay"] = np.asarray(sd[f"{prefix}.time_decay"]).reshape(-1)
    dst["time_decay_w1"] = np.asarray(sd[f"{prefix}.time_decay_w1"])
    dst["time_decay_w2"] = np.asarray(sd[f"{prefix}.time_decay_w2"])
    dst["time_faaaa"] = np.asarray(sd[f"{prefix}.time_faaaa"])
    for name in ("receptance", "key", "value", "output"):
        _dense(sd, f"{prefix}.{name}", dst[name], bias=False)
    _norm(sd, f"{prefix}.ln_x", dst["ln_x"])


def _mamba2(sd, prefix, dst):
    """mamba_ssm Mamba2 state dict -> our Mamba2Block params
    (`mamba2_bidirectional.py:72-101` wraps two of these)."""
    _dense(sd, f"{prefix}.in_proj", dst["in_proj"], bias=False)
    dst["conv1d"]["kernel"] = np.asarray(
        sd[f"{prefix}.conv1d.weight"]).transpose(2, 1, 0)
    if f"{prefix}.conv1d.bias" in sd:
        dst["conv1d"]["bias"] = np.asarray(sd[f"{prefix}.conv1d.bias"])
    for nm in ("dt_bias", "A_log", "D"):
        dst[nm] = np.asarray(sd[f"{prefix}.{nm}"])
    dst["norm"]["scale"] = np.asarray(sd[f"{prefix}.norm.weight"])
    _dense(sd, f"{prefix}.out_proj", dst["out_proj"], bias=False)


def convert_state_dict(sd: Dict[str, Any], params: Dict[str, Any],
                       strict: bool = False) -> Dict[str, Any]:
    """sd: torch state_dict (tensor or ndarray values); params: our
    initialized param tree ({'params': {...}}).  Returns updated tree."""
    import jax

    p = jax.tree.map(np.asarray, params)["params"]
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc = p["encoder"]

    # --- subsampling (`subsampling.py:172-227`)
    if "encoder.embed.conv.0.weight" in sd:
        enc["embed"]["Conv_0"]["kernel"] = sd[
            "encoder.embed.conv.0.weight"].transpose(2, 3, 1, 0)
        enc["embed"]["Conv_0"]["bias"] = sd["encoder.embed.conv.0.bias"]
        enc["embed"]["Conv_1"]["kernel"] = sd[
            "encoder.embed.conv.2.weight"].transpose(2, 3, 1, 0)
        enc["embed"]["Conv_1"]["bias"] = sd["encoder.embed.conv.2.bias"]
        # the reference flattens conv output channel-major (c, f)
        # (`x.transpose(1,2).view(b, t, c*f)`); ours is freq-major (f, c):
        # permute the Linear's input rows accordingly
        w_out = sd["encoder.embed.out.0.weight"]          # (odim, c*f)
        odim = w_out.shape[0]
        c = enc["embed"]["Conv_1"]["kernel"].shape[-1]
        f = w_out.shape[1] // c
        w_perm = w_out.reshape(odim, c, f).transpose(0, 2, 1).reshape(
            odim, f * c)
        enc["embed"]["Dense_0"]["kernel"] = w_perm.T
        if "encoder.embed.out.0.bias" in sd:
            enc["embed"]["Dense_0"]["bias"] = sd["encoder.embed.out.0.bias"]

    # --- encoder blocks
    n_layers = len([k for k in enc if k.startswith("layer_")])
    for i in range(n_layers):
        src = f"encoder.encoders.{i}"
        layer = enc[f"layer_{i}"]
        for ours, theirs in (("norm_ff", "norm_ff"),
                             ("norm_mha", "norm_mha"),
                             ("norm_ff_macaron", "norm_ff_macaron"),
                             ("norm_conv", "norm_conv"),
                             ("norm_final", "norm_final")):
            if ours in layer:
                _norm(sd, f"{src}.{theirs}", layer[ours])
        for ours, theirs in (("feed_forward", "feed_forward"),
                             ("feed_forward_macaron",
                              "feed_forward_macaron")):
            if ours in layer:
                _dense(sd, f"{src}.{theirs}.w_1",
                       layer[ours]["Dense_0"])
                _dense(sd, f"{src}.{theirs}.w_2",
                       layer[ours]["Dense_1"])
        if "conv_module" in layer:
            cm = layer["conv_module"]
            # pointwise convs are kernel-1 Conv1d == Dense
            cm["Dense_0"]["kernel"] = sd[
                f"{src}.conv_module.pointwise_conv1.weight"][:, :, 0].T
            cm["Dense_0"]["bias"] = sd[
                f"{src}.conv_module.pointwise_conv1.bias"]
            cm["Conv_0"]["kernel"] = sd[
                f"{src}.conv_module.depthwise_conv.weight"].transpose(
                2, 1, 0)
            cm["Conv_0"]["bias"] = sd[
                f"{src}.conv_module.depthwise_conv.bias"]
            _norm(sd, f"{src}.conv_module.norm", cm["LayerNorm_0"])
            cm["Dense_1"]["kernel"] = sd[
                f"{src}.conv_module.pointwise_conv2.weight"][:, :, 0].T
            cm["Dense_1"]["bias"] = sd[
                f"{src}.conv_module.pointwise_conv2.bias"]
        # rwkv attention (params attach under encoder/RWKVAttention_i)
        att_key = f"RWKVAttention_{i}"
        if att_key in enc:
            att = enc[att_key]
            if "tmix_rev" in att:
                _tmix(sd, f"{src}.self_attn.rwkv_wrapper_forward"
                      ".tmix_block", att["tmix"])
                _tmix(sd, f"{src}.self_attn.rwkv_wrapper_backward"
                      ".tmix_block", att["tmix_rev"])
            else:
                _tmix(sd, f"{src}.self_attn.tmix_block", att["tmix"])
        # MHA / rel-pos MHA / limited-context (LCA) attention
        for att_key in (f"MultiHeadedAttention_{i}",
                        f"RelPositionMultiHeadedAttention_{i}",
                        f"LimitedRelPositionAttention_{i}"):
            if att_key not in enc:
                continue
            att = enc[att_key]
            for lin in ("linear_q", "linear_k", "linear_v", "linear_out",
                        "linear_pos", "global_q", "global_k", "global_v"):
                if lin in att and f"{src}.self_attn.{lin}.weight" in sd:
                    _dense(sd, f"{src}.self_attn.{lin}", att[lin])
            for pb in ("pos_bias_u", "pos_bias_v"):
                if pb in att and f"{src}.self_attn.{pb}" in sd:
                    att[pb] = np.asarray(sd[f"{src}.self_attn.{pb}"])
        # mamba attention (`mamba_att_wrapper.py:35`: self_attn.mamba)
        att_key = f"MambaAttention_{i}"
        if att_key in enc:
            att = enc[att_key]
            if "mamba_bwd" in att:
                _mamba2(sd, f"{src}.self_attn.mamba.mamba_forward",
                        att["mamba_fwd"])
                _mamba2(sd, f"{src}.self_attn.mamba.mamba_backward",
                        att["mamba_bwd"])
            else:
                _mamba2(sd, f"{src}.self_attn.mamba", att["mamba_fwd"])
    if "after_norm" in enc:
        _norm(sd, "encoder.after_norm", enc["after_norm"])

    # --- ctc
    if "ctc" in p and "ctc.ctc_lo.weight" in sd:
        _dense(sd, "ctc.ctc_lo", p["ctc"]["ctc_lo"])

    # --- attention decoder
    if "decoder" in p:
        for side, ours_side in (("left_decoder", "left_decoder"),
                                ("right_decoder", "right_decoder")):
            if ours_side not in p["decoder"]:
                continue
            dd = p["decoder"][ours_side]
            emb_key = f"decoder.{side}.embed.0.weight"
            if emb_key not in sd:
                continue
            dd["embed"]["embedding"] = sd[emb_key]
            _norm(sd, f"decoder.{side}.after_norm", dd["after_norm"])
            if "output_layer" in dd:
                _dense(sd, f"decoder.{side}.output_layer",
                       dd["output_layer"])
            nd = len([k for k in dd if k.startswith("layer_")])
            for j in range(nd):
                sdj = f"decoder.{side}.decoders.{j}"
                dl = dd[f"layer_{j}"]
                for ours, theirs in (("norm1", "norm1"),
                                     ("norm2", "norm2"),
                                     ("norm3", "norm3")):
                    _norm(sd, f"{sdj}.{theirs}", dl[ours])
                for blk, tb in (("self_attn", "self_attn"),
                                ("src_attn", "src_attn")):
                    for lin in ("linear_q", "linear_k", "linear_v",
                                "linear_out"):
                        _dense(sd, f"{sdj}.{tb}.{lin}", dl[blk][lin])
                _dense(sd, f"{sdj}.feed_forward.w_1",
                       dl["feed_forward"]["Dense_0"])
                _dense(sd, f"{sdj}.feed_forward.w_2",
                       dl["feed_forward"]["Dense_1"])

    # --- transducer predictor / joint
    if "predictor" in p and "predictor.embed.weight" in sd:
        pd = p["predictor"]
        pd["embed"]["embedding"] = sd["predictor.embed.weight"]
        nl = len([k for k in pd if k.startswith("lstm_")])
        for l in range(nl):
            lstm = pd[f"lstm_{l}"]
            w_ih = sd[f"predictor.rnn.weight_ih_l{l}"]
            w_hh = sd[f"predictor.rnn.weight_hh_l{l}"]
            b = (sd[f"predictor.rnn.bias_ih_l{l}"]
                 + sd[f"predictor.rnn.bias_hh_l{l}"])
            lstm["ih"]["kernel"] = w_ih.T
            lstm["ih"]["bias"] = b
            lstm["hh"] = w_hh.T
        _dense(sd, "predictor.projection", pd["projection"])
    if "joint" in p:
        jt = p["joint"]
        for ours, theirs in (("enc_ffn", "joint.enc_ffn"),
                             ("pred_ffn", "joint.pred_ffn"),
                             ("ffn_out", "joint.ffn_out")):
            if ours in jt and theirs + ".weight" in sd:
                _dense(sd, theirs, jt[ours])

    if strict:
        pass  # full-coverage check is a follow-up
    return {"params": p}


def main(argv=None):
    p = argparse.ArgumentParser(description="convert wenet checkpoint")
    p.add_argument("--checkpoint", required=True, help="torch .pt file")
    p.add_argument("--config", required=True, help="our train.yaml")
    p.add_argument("--output", required=True, help="orbax checkpoint dir")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import torch

    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.text.tokenizers import init_tokenizer
    from paper_accurate_fast_cheap_tpu.train import checkpointing
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    tokenizer = init_tokenizer(config)
    input_dim = config.get("dataset_conf", {}).get(
        "fbank_conf", {}).get("num_mel_bins", 80)
    model, _ = factory.init_model(config, tokenizer.vocab_size(), input_dim)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, input_dim)),
        jnp.asarray([64]), jnp.ones((1, 4), jnp.int32), jnp.asarray([4]))
    ckpt = torch.load(args.checkpoint, map_location="cpu")
    sd = ckpt.get("model0", ckpt.get("state_dict", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}
    new_params = convert_state_dict(sd, params)
    checkpointing.save_checkpoint(args.output, new_params,
                                  info={"tag": "converted"})
    logging.info("wrote %s", args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
