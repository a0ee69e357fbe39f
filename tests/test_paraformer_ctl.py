"""Paraformer (CIF), CTL contrastive model, kaldi IO."""
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.data import kaldi_io
from paper_accurate_fast_cheap_tpu.models.ctl_model import CTLModel
from paper_accurate_fast_cheap_tpu.models.paraformer import Paraformer, cif


def test_cif_integrate_and_fire():
    # constant alpha 0.5: one token per 2 frames
    B, T, D = 1, 8, 4
    enc = jnp.ones((B, T, D))
    alpha = jnp.full((B, T), 0.5)
    embs, n = cif(enc, alpha, max_tokens=6)
    assert int(n[0]) == 4
    # each token integrates total weight 1.0 over constant enc -> ones
    np.testing.assert_allclose(np.asarray(embs[0, :4]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(embs[0, 4:]), 0.0)


def test_paraformer_loss_and_recognize():
    model = Paraformer(
        vocab_size=12,
        encoder_conf=dict(input_size=16, output_size=32, attention_heads=2,
                          linear_units=64, num_blocks=1,
                          input_layer="linear",
                          selfattention_layer_type="rel_selfattn",
                          dropout_rate=0.0),
        decoder_blocks=1, decoder_heads=2, decoder_linear_units=64,
        max_tokens=8,
    )
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 16))
    flens = jnp.asarray([40, 30])
    labels = jnp.asarray([[3, 5, 7, 0], [2, 9, 0, 0]], jnp.int32)
    llens = jnp.asarray([3, 2])
    params = model.init(jax.random.PRNGKey(1), feats, flens, labels, llens)
    out = model.apply(params, feats, flens, labels, llens)
    for k in ("loss", "loss_decoder", "loss_quantity", "loss_ctc"):
        assert np.isfinite(float(out[k])), k
    toks, n = model.apply(params, feats, flens, method=model.recognize)
    assert toks.shape == (2, 8)
    g = jax.grad(lambda p: model.apply(p, feats, flens, labels,
                                       llens)["loss"])(params)
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0])).all()


def test_ctl_model():
    model = CTLModel(
        asr_conf=dict(
            vocab_size=10,
            encoder_conf=dict(input_size=16, output_size=32,
                              attention_heads=2, linear_units=64,
                              num_blocks=1, input_layer="linear",
                              selfattention_layer_type="rel_selfattn",
                              dropout_rate=0.0),
            ctc_weight=1.0, sos=9, eos=9,
        ),
        ctl_weight=0.5,
    )
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))
    aug = feats + jax.random.normal(jax.random.PRNGKey(1), feats.shape) * 0.1
    flens = jnp.asarray([32, 24])
    labels = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    llens = jnp.asarray([2, 2])
    params = model.init(jax.random.PRNGKey(2), feats, flens, aug, labels,
                        llens)
    out = model.apply(params, feats, flens, aug, labels, llens)
    assert np.isfinite(float(out["loss_ctl"]))
    # identical views have lower contrastive loss than noisy views
    out_same = model.apply(params, feats, flens, feats, labels, llens)
    assert float(out_same["loss_ctl"]) <= float(out["loss_ctl"]) + 1e-4


def test_kaldi_ark_scp_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    mats = {"utt1": rng.randn(5, 3).astype(np.float32),
            "utt2": rng.randn(7, 3).astype(np.float32)}
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    kaldi_io.write_ark_scp(ark, mats, scp)
    got = dict(kaldi_io.read_ark(ark))
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])
    got_scp = dict(kaldi_io.read_scp(scp))
    for k in mats:
        np.testing.assert_array_equal(got_scp[k], mats[k])
