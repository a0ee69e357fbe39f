"""Conformer encoder smoke + semantics tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.models.conformer import ConformerEncoder
from paper_accurate_fast_cheap_tpu.models.rwkv import flip_padded


def _toy_encoder(att_type, **kw):
    return ConformerEncoder(
        input_size=80, output_size=64, attention_heads=4, linear_units=128,
        num_blocks=2, selfattention_layer_type=att_type,
        pos_enc_layer_type="rel_pos", **kw,
    )


def _feats(key, B=2, T=64):
    return jax.random.normal(key, (B, T, 80)), jnp.asarray([T, T // 2])


@pytest.mark.parametrize("att_type", [
    "rel_selfattn", "selfattn", "rwkv_tmix60", "rwkv_tmix60_bidirectional",
    "rwkv_tmix60_dir_layer_drop", "rwkv_tmix60_dir_layer_drop_both",
])
def test_encoder_forward_shapes(att_type):
    enc = _toy_encoder(att_type)
    xs, lens = _feats(jax.random.PRNGKey(0))
    params = enc.init(jax.random.PRNGKey(1), xs, lens)
    out, out_lens = enc.apply(params, xs, lens)
    assert out.shape == (2, (64 - 1) // 2 // 2, 64)
    assert int(out_lens[0]) == ((64 - 1) // 2 - 1) // 2
    assert np.isfinite(np.asarray(out)).all()


def test_encoder_subsample_length_matches_time_dim():
    enc = _toy_encoder("rel_selfattn")
    for T in (32, 57, 100):
        xs = jnp.zeros((1, T, 80))
        lens = jnp.asarray([T])
        params = enc.init(jax.random.PRNGKey(0), xs, lens)
        out, out_lens = enc.apply(params, xs, lens)
        assert out.shape[1] == int(out_lens[0])


def test_mha_padding_invariance():
    """Valid-region outputs must not depend on pad frames (MHA path)."""
    enc = _toy_encoder("rel_selfattn")
    key = jax.random.PRNGKey(2)
    x_short = jax.random.normal(key, (1, 40, 80))
    lens = jnp.asarray([40])
    params = enc.init(jax.random.PRNGKey(1), x_short, lens)
    out_a, la = enc.apply(params, x_short, lens)
    # pad with garbage to T=64
    pad = jax.random.normal(jax.random.PRNGKey(3), (1, 24, 80)) * 100
    x_pad = jnp.concatenate([x_short, pad], axis=1)
    out_b, lb = enc.apply(params, x_pad, jnp.asarray([40]))
    n = int(la[0])
    np.testing.assert_allclose(
        np.asarray(out_a)[:, :n], np.asarray(out_b)[:, :n],
        rtol=2e-4, atol=2e-4,
    )


def test_rwkv_bidirectional_padding_invariance():
    """Our masked flip means the R2L scan never sees pad frames (improves on
    the reference, which flips pad garbage in first)."""
    enc = _toy_encoder("rwkv_tmix60_bidirectional")
    key = jax.random.PRNGKey(4)
    x_short = jax.random.normal(key, (1, 40, 80))
    lens = jnp.asarray([40])
    params = enc.init(jax.random.PRNGKey(1), x_short, lens)
    out_a, la = enc.apply(params, x_short, lens)
    pad = jax.random.normal(jax.random.PRNGKey(5), (1, 24, 80)) * 100
    x_pad = jnp.concatenate([x_short, pad], axis=1)
    out_b, lb = enc.apply(params, x_pad, jnp.asarray([40]))
    n = int(la[0])
    np.testing.assert_allclose(
        np.asarray(out_a)[:, :n], np.asarray(out_b)[:, :n],
        rtol=2e-3, atol=2e-3,
    )


def test_flip_padded():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 12, 1))
    y = flip_padded(x, jnp.asarray([5]))
    got = np.asarray(y)[0, :, 0]
    np.testing.assert_array_equal(got[:5], [4, 3, 2, 1, 0])
    np.testing.assert_array_equal(got[5:], np.arange(5, 12))


def test_dirdrop_training_stochastic():
    enc = _toy_encoder("rwkv_tmix60_dir_layer_drop_both")
    xs, lens = _feats(jax.random.PRNGKey(0), B=1, T=32)
    params = enc.init(jax.random.PRNGKey(1), xs, lens)
    outs = []
    for seed in range(3):
        out, _ = enc.apply(
            params, xs, lens, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(seed)},
        )
        outs.append(np.asarray(out))
    # different dropout keys give different outputs
    assert not np.allclose(outs[0], outs[1])
