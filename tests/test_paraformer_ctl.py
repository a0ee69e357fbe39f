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
    flens = jnp.asarray([32, 24])
    labels = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    llens = jnp.asarray([2, 2])
    params = model.init(jax.random.PRNGKey(2), feats, flens, labels, llens)
    out = model.apply(params, feats, flens, labels, llens)
    # dual-view structure (`asr_model_ctl.py:74-115`): full + chunk +
    # contrastive terms all present and finite
    for k in ("loss", "loss_full", "loss_chunk", "loss_ctl"):
        assert np.isfinite(float(out[k])), k
    assert float(out["loss_ctl"]) > 0.0
    g = jax.grad(lambda p: float(0) + model.apply(
        p, feats, flens, labels, llens)["loss"])(params)
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0])).all()


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


def test_paraformer_sampler_and_sanm_and_peaks():
    """Round-2 paraformer additions: SANM attention module, glancing
    sampler in training, CIF timestamp peaks
    (`wenet/paraformer/attention.py:8-115`, `paraformer.py:238-327`)."""
    from paper_accurate_fast_cheap_tpu.models.paraformer import (
        Paraformer,
        SANMAttention,
        cif_peaks,
    )

    # SANM module shape/finiteness + fsmn memory effect
    att = SANMAttention(heads=2, d_model=16, kernel_size=5,
                        dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    pad = jnp.ones((2, 12), bool).at[1, 8:].set(False)
    p = att.init(jax.random.PRNGKey(1), x, pad[:, None, :], pad)
    y = att.apply(p, x, pad[:, None, :], pad)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()

    # sampler path trains (rng consumed, loss finite, grads flow)
    model = Paraformer(
        vocab_size=20,
        encoder_conf=dict(input_size=8, output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=1,
                          input_layer="linear"),
        decoder_blocks=1, max_tokens=16, sampler=True,
        sampling_ratio=0.75)
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 30, 8))
    flens = jnp.asarray([30, 22])
    labels = jnp.ones((2, 5), jnp.int32) * 3
    llens = jnp.asarray([5, 4])
    params = model.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        feats, flens, labels, llens, deterministic=False)
    out = model.apply(params, feats, flens, labels, llens,
                      deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(5)})
    assert np.isfinite(float(out["loss"]))
    # peaks: fire count ~ token_nums
    alphas = jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (2, 40)))
    peaks = cif_peaks(alphas, jnp.asarray([7, 3]))
    fired = np.asarray(peaks).sum(axis=1)
    assert abs(int(fired[0]) - 7) <= 1 and abs(int(fired[1]) - 3) <= 1


def test_kaldi_io_vectors_compressed_ascii():
    """kaldi_io round 2 (`wenet/dataset/kaldi_io.py`): int/float vectors,
    compressed 'CM ' matrices (cross-checked against the reference's own
    reader), ascii matrices."""
    import io

    from paper_accurate_fast_cheap_tpu.data import kaldi_io as kio

    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    kio.write_vec_int(buf, [3, 1, 4], "k")
    buf.seek(2)
    np.testing.assert_array_equal(kio.read_vec_int(buf), [3, 1, 4])

    buf = io.BytesIO()
    kio.write_vec_flt(buf, np.asarray([0.5, -1.25, 2.0]))
    buf.seek(0)
    np.testing.assert_allclose(kio.read_vec_flt(buf), [0.5, -1.25, 2.0])

    m = (rng.randn(30, 8) * 2).astype(np.float32)
    buf = io.BytesIO()
    kio.write_compressed_mat(buf, m)
    buf.seek(0)
    m2 = kio.read_mat(buf)
    assert np.abs(m2 - m).max() / (m.max() - m.min()) < 0.02

    # cross-check: the reference's own reader decodes our CM bytes
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_kaldi_io", "/root/reference/wenet/dataset/kaldi_io.py")
        ref_kio = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_kio)
    except Exception:
        ref_kio = None
    if ref_kio is not None:
        buf.seek(2)  # skip \0B; reference read_mat handles the header
        assert buf.read(3) == b"CM "
        m3 = ref_kio._read_compressed_mat(buf, "CM ")
        np.testing.assert_allclose(m3, m2, atol=1e-4)

    buf = io.BytesIO(b" [\n 1 2\n 3 4 ]\n")
    np.testing.assert_array_equal(kio.read_mat(buf), [[1, 2], [3, 4]])
