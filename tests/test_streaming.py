"""Streaming: chunked stateful forward == full-utterance forward (causal)."""
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.decode import streaming
from paper_accurate_fast_cheap_tpu.models.conformer import ConformerEncoder
from paper_accurate_fast_cheap_tpu.models.rwkv import RWKVTimeMix


def test_rwkv_tmix_state_carry():
    mod = RWKVTimeMix(head_size=8, n_layers=2, n_embd=32, dim_att=32,
                      layer_id=0, wkv_chunk_size=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
    params = mod.init(jax.random.PRNGKey(1), x)
    y_full = mod.apply(params, x)
    y1, st = mod.apply(params, x[:, :10], None, True)
    y2, _ = mod.apply(params, x[:, 10:], st, True)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y_full),
        rtol=2e-4, atol=2e-4,
    )


def _causal_encoder():
    return ConformerEncoder(
        input_size=16, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=2, selfattention_layer_type="rwkv_tmix60",
        dropout_rate=0.0, positional_dropout_rate=0.0, causal=True,
        input_layer="conv2d",
    )


def test_streaming_equals_full_forward():
    enc = _causal_encoder()
    T = 135  # features
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, T, 16))
    lens = jnp.asarray([T])
    params = enc.init(jax.random.PRNGKey(3), feats, lens)
    full, full_lens = enc.apply(params, feats, lens)
    n_full = int(full_lens[0])

    def encoder_apply(xs, xs_lens, state, offset):
        return enc.apply(params, xs, xs_lens, streaming_state=state,
                         return_state=True, offset=offset)

    ys, out_lens = streaming.forward_chunk_by_chunk(
        encoder_apply, feats, decoding_chunk_size=8)
    n = min(int(out_lens[0]), n_full)
    assert n > 0
    np.testing.assert_allclose(
        np.asarray(ys)[0, :n], np.asarray(full)[0, :n],
        rtol=5e-4, atol=5e-4,
    )


def test_streaming_chunk_size_invariance():
    enc = _causal_encoder()
    T = 135
    feats = jax.random.normal(jax.random.PRNGKey(4), (1, T, 16))
    params = enc.init(jax.random.PRNGKey(5), feats, jnp.asarray([T]))

    def encoder_apply(xs, xs_lens, state, offset):
        return enc.apply(params, xs, xs_lens, streaming_state=state,
                         return_state=True, offset=offset)

    ys8, l8 = streaming.forward_chunk_by_chunk(encoder_apply, feats, 8)
    ys4, l4 = streaming.forward_chunk_by_chunk(encoder_apply, feats, 4)
    n = min(int(l8[0]), int(l4[0]))
    np.testing.assert_allclose(np.asarray(ys8)[0, :n],
                               np.asarray(ys4)[0, :n],
                               rtol=5e-4, atol=5e-4)


def test_mha_streaming_kv_cache_matches_chunked_forward():
    """MHA streaming with a fixed KV cache == full forward under the
    equivalent chunk mask (decoding_chunk_size + num_left_chunks)."""
    enc = ConformerEncoder(
        input_size=16, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=2, selfattention_layer_type="rel_selfattn",
        dropout_rate=0.0, positional_dropout_rate=0.0, causal=True,
        input_layer="conv2d",
    )
    C_out, n_left = 8, 2
    Tc = C_out * n_left
    T = 135
    feats = jax.random.normal(jax.random.PRNGKey(7), (1, T, 16))
    lens = jnp.asarray([T])
    params = enc.init(jax.random.PRNGKey(8), feats, lens)
    full, full_lens = enc.apply(
        params, feats, lens, decoding_chunk_size=C_out,
        num_decoding_left_chunks=n_left,
    )

    def encoder_apply(xs, xs_lens, state, offset):
        return enc.apply(params, xs, xs_lens, streaming_state=state,
                         return_state=True, offset=offset,
                         att_cache_size=Tc)

    ys, out_lens = streaming.forward_chunk_by_chunk(
        encoder_apply, feats, decoding_chunk_size=C_out)
    n = min(int(out_lens[0]), int(full_lens[0]))
    assert n > C_out
    np.testing.assert_allclose(
        np.asarray(ys)[0, :n], np.asarray(full)[0, :n],
        rtol=5e-4, atol=5e-4,
    )


def test_mamba_block_state_carry():
    from paper_accurate_fast_cheap_tpu.models.mamba import Mamba2Block

    mod = Mamba2Block(d_model=32, headdim=16, d_state=16, chunk_size=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
    params = mod.init(jax.random.PRNGKey(1), x)
    y_full = mod.apply(params, x)
    y1, st = mod.apply(params, x[:, :10], None, True)
    y2, _ = mod.apply(params, x[:, 10:], st, True)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y_full),
        rtol=2e-4, atol=2e-4,
    )


def test_mamba_streaming_equals_full_forward():
    enc = ConformerEncoder(
        input_size=16, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=2, selfattention_layer_type="mamba_att",
        rwkv_conf={"rnn_att_direction": "uni"},
        dropout_rate=0.0, positional_dropout_rate=0.0, causal=True,
        input_layer="conv2d",
    )
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 16))
    params = enc.init(jax.random.PRNGKey(4), feats, jnp.asarray([64]))
    y_full, l_full = enc.apply(params, feats, jnp.asarray([64]))

    def encoder_apply(xs, xs_lens, state, offset):
        return enc.apply(params, xs, xs_lens, streaming_state=state,
                         return_state=True, offset=offset)

    ys, out_lens = streaming.forward_chunk_by_chunk(
        encoder_apply, feats, 4)
    n = int(out_lens[0])
    np.testing.assert_allclose(
        np.asarray(ys[0, :n]), np.asarray(y_full[0, :n]),
        rtol=2e-3, atol=2e-3,
    )
