"""WeNet->JAX checkpoint converter mapping mechanics."""
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.models.asr_model import ASRModel
from paper_accurate_fast_cheap_tpu.tools.convert_checkpoint import (
    convert_state_dict,
)


def _fake_ref_state_dict(rng, d=32, ff=64, vocab=10, mels=23):
    """Reference-named tensors for a 1-block conformer rwkv-bi + bidecoder."""
    sd = {}
    f = lambda *s: rng.randn(*s).astype(np.float32)
    sd["encoder.embed.conv.0.weight"] = f(d, 1, 3, 3)
    sd["encoder.embed.conv.0.bias"] = f(d)
    sd["encoder.embed.conv.2.weight"] = f(d, d, 3, 3)
    sd["encoder.embed.conv.2.bias"] = f(d)
    fdim = (((mels - 1) // 2 - 1) // 2) * d
    sd["encoder.embed.out.0.weight"] = f(d, fdim)
    sd["encoder.embed.out.0.bias"] = f(d)
    src = "encoder.encoders.0"
    for n in ("norm_ff", "norm_mha", "norm_ff_macaron", "norm_conv",
              "norm_final"):
        sd[f"{src}.{n}.weight"] = f(d)
        sd[f"{src}.{n}.bias"] = f(d)
    for n in ("feed_forward", "feed_forward_macaron"):
        sd[f"{src}.{n}.w_1.weight"] = f(ff, d)
        sd[f"{src}.{n}.w_1.bias"] = f(ff)
        sd[f"{src}.{n}.w_2.weight"] = f(d, ff)
        sd[f"{src}.{n}.w_2.bias"] = f(d)
    sd[f"{src}.conv_module.pointwise_conv1.weight"] = f(2 * d, d, 1)
    sd[f"{src}.conv_module.pointwise_conv1.bias"] = f(2 * d)
    sd[f"{src}.conv_module.depthwise_conv.weight"] = f(d, 1, 31)
    sd[f"{src}.conv_module.depthwise_conv.bias"] = f(d)
    sd[f"{src}.conv_module.norm.weight"] = f(d)
    sd[f"{src}.conv_module.norm.bias"] = f(d)
    sd[f"{src}.conv_module.pointwise_conv2.weight"] = f(d, d, 1)
    sd[f"{src}.conv_module.pointwise_conv2.bias"] = f(d)
    for direction in ("forward", "backward"):
        pre = f"{src}.self_attn.rwkv_wrapper_{direction}.tmix_block"
        for n in ("time_maa_x", "time_maa_r", "time_maa_k", "time_maa_v",
                  "time_maa_w"):
            sd[f"{pre}.{n}"] = f(1, 1, d)
        sd[f"{pre}.time_maa_rkvw_w1"] = f(d, 128)
        sd[f"{pre}.time_maa_rkvw_w2"] = f(4, 32, d)
        sd[f"{pre}.time_decay"] = f(1, 1, d)
        sd[f"{pre}.time_decay_w1"] = f(d, 64)
        sd[f"{pre}.time_decay_w2"] = f(64, d)
        sd[f"{pre}.time_faaaa"] = f(2, d // 2)
        for n in ("receptance", "key", "value", "output"):
            sd[f"{pre}.{n}.weight"] = f(d, d)
        sd[f"{pre}.ln_x.weight"] = f(d)
        sd[f"{pre}.ln_x.bias"] = f(d)
    sd["encoder.after_norm.weight"] = f(d)
    sd["encoder.after_norm.bias"] = f(d)
    sd["ctc.ctc_lo.weight"] = f(vocab, d)
    sd["ctc.ctc_lo.bias"] = f(vocab)
    for side in ("left_decoder", "right_decoder"):
        sd[f"decoder.{side}.embed.0.weight"] = f(vocab, d)
        sd[f"decoder.{side}.after_norm.weight"] = f(d)
        sd[f"decoder.{side}.after_norm.bias"] = f(d)
        sd[f"decoder.{side}.output_layer.weight"] = f(vocab, d)
        sd[f"decoder.{side}.output_layer.bias"] = f(vocab)
        dj = f"decoder.{side}.decoders.0"
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{dj}.{n}.weight"] = f(d)
            sd[f"{dj}.{n}.bias"] = f(d)
        for blk in ("self_attn", "src_attn"):
            for lin in ("linear_q", "linear_k", "linear_v", "linear_out"):
                sd[f"{dj}.{blk}.{lin}.weight"] = f(d, d)
                sd[f"{dj}.{blk}.{lin}.bias"] = f(d)
        sd[f"{dj}.feed_forward.w_1.weight"] = f(ff, d)
        sd[f"{dj}.feed_forward.w_1.bias"] = f(ff)
        sd[f"{dj}.feed_forward.w_2.weight"] = f(d, ff)
        sd[f"{dj}.feed_forward.w_2.bias"] = f(d)
    return sd


def test_convert_state_dict_places_weights():
    rng = np.random.RandomState(0)
    model = ASRModel(
        vocab_size=10,
        encoder_conf=dict(
            input_size=23, output_size=32, attention_heads=2,
            linear_units=64, num_blocks=1,
            selfattention_layer_type="rwkv_tmix60_bidirectional",
            dropout_rate=0.0,
        ),
        decoder_conf=dict(attention_heads=2, linear_units=64, num_blocks=1,
                          r_num_blocks=1, dropout_rate=0.0),
        ctc_weight=0.5, reverse_weight=0.3, sos=9, eos=9,
    )
    feats = jnp.zeros((1, 40, 23))
    params = model.init(jax.random.PRNGKey(0), feats, jnp.asarray([40]),
                        jnp.ones((1, 3), jnp.int32), jnp.asarray([3]))
    sd = _fake_ref_state_dict(rng)
    new = convert_state_dict(sd, params)
    p = new["params"]
    # dense transpose
    np.testing.assert_array_equal(
        p["ctc"]["ctc_lo"]["kernel"], sd["ctc.ctc_lo.weight"].T)
    # depthwise conv layout (K, 1, C)
    assert p["encoder"]["layer_0"]["conv_module"]["Conv_0"][
        "kernel"].shape == (31, 1, 32)
    # rwkv tmix placed into fwd and rev
    np.testing.assert_array_equal(
        p["encoder"]["RWKVAttention_0"]["tmix"]["time_decay"],
        sd["encoder.encoders.0.self_attn.rwkv_wrapper_forward."
           "tmix_block.time_decay"].reshape(-1))
    np.testing.assert_array_equal(
        p["encoder"]["RWKVAttention_0"]["tmix_rev"]["key"]["kernel"],
        sd["encoder.encoders.0.self_attn.rwkv_wrapper_backward."
           "tmix_block.key.weight"].T)
    # model still runs with converted params
    out = model.apply(new, feats, jnp.asarray([40]),
                      jnp.ones((1, 3), jnp.int32), jnp.asarray([3]))
    assert np.isfinite(float(out["loss"]))


def test_pointwise_conv_as_dense_equivalence():
    """A kernel-1 Conv1d and our Dense produce identical outputs after the
    converter's squeeze-transpose."""
    import torch

    rng = np.random.RandomState(1)
    C = 8
    w = rng.randn(2 * C, C, 1).astype(np.float32)
    b = rng.randn(2 * C).astype(np.float32)
    x = rng.randn(1, 20, C).astype(np.float32)
    conv = torch.nn.Conv1d(C, 2 * C, 1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
        want = conv(torch.from_numpy(x).transpose(1, 2)).transpose(
            1, 2).numpy()
    got = x @ w[:, :, 0].T + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_depthwise_conv_layout_equivalence():
    """torch depthwise Conv1d == flax feature_group_count Conv after the
    (C,1,K)->(K,1,C) transpose."""
    import flax.linen as nn
    import torch

    rng = np.random.RandomState(2)
    C, K, T = 4, 5, 20
    w = rng.randn(C, 1, K).astype(np.float32)
    b = rng.randn(C).astype(np.float32)
    x = rng.randn(1, T, C).astype(np.float32)
    tconv = torch.nn.Conv1d(C, C, K, groups=C, padding=K // 2)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        want = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(
            1, 2).numpy()
    fconv = nn.Conv(C, (K,), padding=((K // 2, K // 2),),
                    feature_group_count=C)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
                         "bias": jnp.asarray(b)}}
    got = np.asarray(fconv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
