"""Checkpoint/numeric parity for the paper's FLAGSHIP attention family:
the reference's `RWKV_Tmix_x060c` (`/root/reference/wenet/rwkv_v6/src/
model.py:218-325`) run on CPU with a pure-torch WKV scan standing in for
the CUDA kernel, against our `RWKVTimeMix` with weights mapped through
`tools/convert_checkpoint`.  Also proves the init-ramp constants match
exactly and that a full rwkv-bidirectional conformer encoder round-trips
through the converter.
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HEAD = 16


@pytest.fixture(scope="module")
def ref_tmix():
    """Import the reference tmix module with the CUDA build stubbed out
    and the kernel replaced by a pure-torch scan oracle."""
    import torch

    os.environ["RWKV_JIT_ON"] = "0"
    os.environ["RWKV_MY_TESTING"] = "x060"
    os.environ["RWKV_HEAD_SIZE_A"] = str(HEAD)
    os.environ["RWKV_CTXLEN"] = "256"
    os.environ["RWKV_TRAIN_TYPE"] = ""
    import torch.utils.cpp_extension as ce

    orig_load = ce.load
    ce.load = lambda *a, **k: None
    for name in ("torchaudio", "torchaudio.compliance",
                 "torchaudio.compliance.kaldi", "langid", "sentencepiece",
                 "nvtx"):
        sys.modules.setdefault(name, types.ModuleType(name))
    wh = types.ModuleType("whisper")
    wt = types.ModuleType("whisper.tokenizer")
    wt.LANGUAGES = {"en": "english"}
    wh.tokenizer = wt
    sys.modules.setdefault("whisper", wh)
    sys.modules.setdefault("whisper.tokenizer", wt)
    dec = types.ModuleType("wenet.transformer.decoder")
    for cls in ("LanguageSpecificTransformerDecoder", "TransformerDecoder",
                "BiTransformerDecoder"):
        setattr(dec, cls, type(cls, (), {}))
    sys.modules.setdefault("wenet.transformer.decoder", dec)
    r7 = types.ModuleType("wenet.rwkv_v7")
    r7.__path__ = []
    r7w = types.ModuleType("wenet.rwkv_v7.rwkv_v7_wrapper_v6")
    r7w.RWKV_TmixWrapper = type("_W", (), {})
    sys.modules.setdefault("wenet.rwkv_v7", r7)
    sys.modules.setdefault("wenet.rwkv_v7.rwkv_v7_wrapper_v6", r7w)
    # squeezeformer/conv2d.py re-exports typing names from
    # torch.nn.modules.conv, which newer torch no longer exposes
    import typing

    import torch.nn.modules.conv as _tc

    for nm, val in (("Union", typing.Union), ("Optional", typing.Optional),
                    ("Tensor", torch.Tensor)):
        if not hasattr(_tc, nm):
            setattr(_tc, nm, val)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import wenet.rwkv_v6.src.model as ref_model
    except Exception as e:  # pragma: no cover
        ce.load = orig_load
        pytest.skip(f"reference rwkv model unimportable: {e}")
    ce.load = orig_load

    def torch_wkv6(r, k, v, w, u):
        """Pure-torch scan with the CUDA kernel's semantics
        (`wkv6_cuda.cu:25-62`): y_t = r.(diag(u) k v^T + S),
        S' = diag(exp(-exp(w))) S + k v^T."""
        B, T, C = r.shape
        H = C // HEAD
        N = HEAD
        rf = r.float().view(B, T, H, N)
        kf = k.float().view(B, T, H, N)
        vf = v.float().view(B, T, H, N)
        decay = torch.exp(-torch.exp(w.float().view(B, T, H, N)))
        uf = u.float().view(1, H, N)
        S = torch.zeros(B, H, N, N)
        ys = []
        for t in range(T):
            rt, kt, vt, dt_ = rf[:, t], kf[:, t], vf[:, t], decay[:, t]
            ruk = (rt * uf * kt).sum(-1, keepdim=True)        # (B, H, 1)
            y = ruk * vt + torch.einsum("bhj,bhji->bhi", rt, S)
            S = dt_.unsqueeze(-1) * S + kt.unsqueeze(-1) * vt.unsqueeze(-2)
            ys.append(y)
        return torch.stack(ys, 1).reshape(B, T, C).to(r.dtype)

    ref_model.RUN_CUDA_RWKV6_FP32 = torch_wkv6
    ref_model.RUN_CUDA_RWKV6 = torch_wkv6
    return ref_model


def _our_tmix(layer_id=1, n_layers=3, dim=64):
    from paper_accurate_fast_cheap_tpu.models.rwkv import RWKVTimeMix

    return RWKVTimeMix(head_size=HEAD, n_layers=n_layers, n_embd=dim,
                       dim_att=dim, layer_id=layer_id, wkv_impl="ref")


@pytest.mark.parametrize("layer_id", [0, 1, 2])
def test_tmix_init_ramps_match_reference(ref_tmix, layer_id):
    """Fresh-init ramp parameters (time_maa_*, time_decay, time_faaaa)
    must equal the reference's layer-position-dependent init exactly —
    this is what makes converted checkpoints land on identical geometry
    (`src/model.py:233-260`)."""
    ref = ref_tmix.RWKV_Tmix_x060c(
        head_size=HEAD, n_layers=3, n_embd=64, dim_att=64,
        layer_id=layer_id).eval()
    our = _our_tmix(layer_id=layer_id)
    params = our.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64)))
    p = params["params"]
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    for name in ("time_maa_x", "time_maa_r", "time_maa_k", "time_maa_v",
                 "time_maa_w", "time_decay"):
        np.testing.assert_allclose(
            np.asarray(p[name]), sd[name].reshape(-1), rtol=1e-6,
            atol=1e-6, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(p["time_faaaa"]), sd["time_faaaa"], rtol=1e-6,
        atol=1e-6)


@pytest.mark.parametrize("layer_id", [0, 2])
def test_tmix_module_parity_converted_weights(ref_tmix, layer_id):
    """Reference tmix forward (torch scan oracle) == ours with weights
    mapped via the converter's _tmix rule."""
    import torch

    from paper_accurate_fast_cheap_tpu.tools.convert_checkpoint import _tmix

    torch.manual_seed(layer_id)
    ref = ref_tmix.RWKV_Tmix_x060c(
        head_size=HEAD, n_layers=3, n_embd=64, dim_att=64,
        layer_id=layer_id)
    # non-trivial LoRA weights (fresh init has zeros for w1)
    with torch.no_grad():
        ref.time_maa_rkvw_w1.uniform_(-0.05, 0.05)
        ref.time_decay_w1.uniform_(-0.05, 0.05)
    ref = ref.eval()
    x = torch.randn(2, 24, 64)
    with torch.no_grad():
        want = ref(x)

    our = _our_tmix(layer_id=layer_id)
    params = our.init(jax.random.PRNGKey(0), jnp.zeros((2, 24, 64)))
    p = jax.tree.map(np.asarray, params)["params"]
    sd = {"m." + k: v.numpy() for k, v in ref.state_dict().items()}
    _tmix(sd, "m", p)
    got = our.apply({"params": p}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=3e-4, atol=3e-4)


def test_rwkv_bidirectional_encoder_converted_parity(ref_tmix):
    """Full 2-block conformer encoder with rwkv_tmix60_bidirectional
    attention: reference encoder (torch-scan WKV) vs ours after
    tools/convert_checkpoint.convert_state_dict — same outputs."""
    import torch

    wh = types.ModuleType("whisper")
    wt = types.ModuleType("whisper.tokenizer")
    wt.LANGUAGES = {"en": "english"}
    wh.tokenizer = wt
    sys.modules.setdefault("whisper", wh)
    sys.modules.setdefault("whisper.tokenizer", wt)
    dec = types.ModuleType("wenet.transformer.decoder")
    for cls in ("LanguageSpecificTransformerDecoder", "TransformerDecoder",
                "BiTransformerDecoder"):
        setattr(dec, cls, type(cls, (), {}))
    sys.modules.setdefault("wenet.transformer.decoder", dec)
    r7 = types.ModuleType("wenet.rwkv_v7")
    r7.__path__ = []
    r7w = types.ModuleType("wenet.rwkv_v7.rwkv_v7_wrapper_v6")
    r7w.RWKV_TmixWrapper = type("_W", (), {})
    sys.modules.setdefault("wenet.rwkv_v7", r7)
    sys.modules.setdefault("wenet.rwkv_v7.rwkv_v7_wrapper_v6", r7w)

    from wenet.transformer.encoder import ConformerEncoder as RefEnc

    from paper_accurate_fast_cheap_tpu.models.conformer import (
        ConformerEncoder as OurEnc,
    )
    from paper_accurate_fast_cheap_tpu.tools.convert_checkpoint import (
        convert_state_dict,
    )

    torch.manual_seed(7)
    mels, D = 23, 32
    common = dict(
        input_size=mels, output_size=D, attention_heads=2,
        linear_units=64, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="conv2d", pos_enc_layer_type="rel_pos",
        cnn_module_kernel=15, cnn_module_norm="layer_norm",
        selfattention_layer_type="rwkv_tmix60_bidirectional",
    )
    ref_enc = RefEnc(
        normalize_before=True, use_cnn_module=True,
        rwkv_ctx_len=256, rwkv_do_bfloat16=False,
        **common,
    ).eval()
    # non-trivial LoRA mixing weights in every tmix block
    with torch.no_grad():
        for name, t in ref_enc.named_parameters():
            if "time_maa_rkvw_w1" in name or "time_decay_w1" in name:
                t.uniform_(-0.05, 0.05)
    B, T = 2, 60
    feats = torch.randn(B, T, mels)
    lens = torch.tensor([T, T])  # equal lengths: the reference flips pad
    with torch.no_grad():
        want, want_mask = ref_enc(feats, lens)

    our_enc = OurEnc(rwkv_conf={"wkv_impl": "ref",
                                 "rwkv_do_bfloat16": False},
                     **common)
    jf = jnp.asarray(feats.numpy())
    jl = jnp.asarray(lens.numpy())
    params = our_enc.init(jax.random.PRNGKey(0), jf, jl)
    sd = {"encoder." + k: v.numpy() for k, v in
          ref_enc.state_dict().items()}
    wrapped = {"params": {"encoder": jax.tree.map(
        np.asarray, params)["params"]}}
    new = convert_state_dict(sd, wrapped)
    got, got_lens = our_enc.apply(
        {"params": new["params"]["encoder"]}, jf, jl)
    n0 = int(want_mask[0].sum())
    assert int(got_lens[0]) == n0
    np.testing.assert_allclose(
        np.asarray(got)[0, :n0], want.numpy()[0, :n0],
        rtol=2e-3, atol=2e-3,
    )


def test_lca_attention_converted_parity(ref_tmix):
    """Reference LimitedRelPositionMultiHeadedAttention (LCA) vs ours with
    weights mapped via the converter's attention rule."""
    import torch

    from wenet.transformer.attention import (
        LimitedRelPositionMultiHeadedAttention as RefLCA,
    )

    from paper_accurate_fast_cheap_tpu.models.lca import (
        LimitedRelPositionAttention as OurLCA,
    )

    torch.manual_seed(3)
    H, D, B, T = 2, 16, 2, 24
    ctx = 4
    ref_mod = RefLCA(H, D, 0.0, att_context_size=[ctx, ctx],
                     global_tokens=0).eval()
    x = torch.randn(B, T, D)
    pos = torch.randn(1, T, D)
    mask = torch.ones(B, 1, T, dtype=torch.bool)
    with torch.no_grad():
        want, _ = ref_mod(x, x, x, mask, pos)

    our = OurLCA(heads=H, d_model=D, dropout_rate=0.0,
                 context_size=(ctx, ctx), global_tokens=0)
    params = our.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()),
                      jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()),
                      jnp.asarray(pos.numpy()))
    p = jax.tree.map(np.asarray, params)["params"]
    sd = {k: v.numpy() for k, v in ref_mod.state_dict().items()}
    for lin in ("linear_q", "linear_k", "linear_v", "linear_out",
                "linear_pos"):
        p[lin]["kernel"] = sd[lin + ".weight"].T
        if lin + ".bias" in sd and "bias" in p[lin]:
            p[lin]["bias"] = sd[lin + ".bias"]
    p["pos_bias_u"] = sd["pos_bias_u"]
    p["pos_bias_v"] = sd["pos_bias_v"]
    got = our.apply({"params": p}, jnp.asarray(x.numpy()),
                    jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()),
                    jnp.asarray(pos.numpy()))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=3e-4, atol=3e-4)


def test_converter_maps_mamba_params():
    """Synthetic mamba_ssm-shaped state dict lands on our Mamba2Block
    params with the right layouts (numeric parity needs the external
    mamba_ssm CUDA package, which the reference itself depends on)."""
    from paper_accurate_fast_cheap_tpu.tools.convert_checkpoint import (
        _mamba2,
    )
    from paper_accurate_fast_cheap_tpu.models.mamba import Mamba2Block

    rng = np.random.RandomState(0)
    blk = Mamba2Block(d_model=32, headdim=8)
    params = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32)))
    p = jax.tree.map(np.asarray, params)["params"]
    sd = {}
    sd["m.in_proj.weight"] = rng.randn(
        *p["in_proj"]["kernel"].shape[::-1]).astype(np.float32)
    K, one, C = p["conv1d"]["kernel"].shape
    sd["m.conv1d.weight"] = rng.randn(C, one, K).astype(np.float32)
    sd["m.conv1d.bias"] = rng.randn(C).astype(np.float32)
    for nm in ("dt_bias", "A_log", "D"):
        sd[f"m.{nm}"] = rng.randn(*p[nm].shape).astype(np.float32)
    sd["m.norm.weight"] = rng.randn(*p["norm"]["scale"].shape).astype(
        np.float32)
    sd["m.out_proj.weight"] = rng.randn(
        *p["out_proj"]["kernel"].shape[::-1]).astype(np.float32)
    _mamba2(sd, "m", p)
    np.testing.assert_array_equal(
        p["in_proj"]["kernel"], sd["m.in_proj.weight"].T)
    np.testing.assert_array_equal(
        p["conv1d"]["kernel"], sd["m.conv1d.weight"].transpose(2, 1, 0))
    np.testing.assert_array_equal(p["dt_bias"], sd["m.dt_bias"])
    np.testing.assert_array_equal(p["norm"]["scale"], sd["m.norm.weight"])
    # the result still applies
    out = blk.apply({"params": p}, jnp.ones((1, 16, 32)))
    assert np.all(np.isfinite(np.asarray(out)))
