
import jax
import jax.numpy as jnp
import numpy as np
from paper_accurate_fast_cheap_tpu.models.asr_model import ASRModel
from paper_accurate_fast_cheap_tpu.tools import export_model

def test_export_roundtrip():
    model = ASRModel(
        vocab_size=10,
        encoder_conf=dict(input_size=16, output_size=32, attention_heads=2,
                          linear_units=64, num_blocks=1, input_layer="linear",
                          selfattention_layer_type="rwkv_tmix60_bidirectional",
                          dropout_rate=0.0),
        ctc_weight=1.0, sos=9, eos=9)
    feats = jnp.zeros((1, 32, 16))
    params = model.init(jax.random.PRNGKey(0), feats, jnp.asarray([32]),
                        jnp.ones((1, 3), jnp.int32), jnp.asarray([3]))
    blob = export_model.export_encoder_ctc(model, params, input_dim=16,
                                           batch=1, frames=32)
    assert len(blob) > 1000
    fn = export_model.load_exported(blob)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 16))
    logp, lens = fn(params, x, jnp.asarray([32], jnp.int32))
    direct_enc, _ = model.apply(params, x, jnp.asarray([32]),
                                method=model.forward_encoder)
    direct = model.apply(params, direct_enc, method=model.ctc_logprobs)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(direct),
                               rtol=1e-3, atol=1e-3)

    assert export_model.export_smoke_test(model, params, input_dim=16)

