"""Branchformer, MoE, LoRA, teacher-student, extra embeddings."""
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.models.branchformer import (
    BranchformerEncoder,
    EBranchformerEncoder,
)
from paper_accurate_fast_cheap_tpu.models.convolution import MoEFFNLayer
from paper_accurate_fast_cheap_tpu.models.embedding import (
    LearnablePositionalEncoding,
    WhisperPositionalEncoding,
)
from paper_accurate_fast_cheap_tpu.models.lora import (
    LoRADense,
    merge_lora_params,
)


def test_branchformer_forward():
    enc = BranchformerEncoder(
        input_size=80, output_size=64, attention_heads=2,
        cgmlp_linear_units=128, num_blocks=2, dropout_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 80))
    lens = jnp.asarray([64, 40])
    params = enc.init(jax.random.PRNGKey(1), x, lens)
    out, olens = enc.apply(params, x, lens)
    assert out.shape == (2, 15, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_ebranchformer_forward():
    enc = EBranchformerEncoder(
        input_size=80, output_size=64, attention_heads=2,
        cgmlp_linear_units=128, num_blocks=1, linear_units=128,
        dropout_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 80))
    params = enc.init(jax.random.PRNGKey(3), x, jnp.asarray([48]))
    out, _ = enc.apply(params, x, jnp.asarray([48]))
    assert np.isfinite(np.asarray(out)).all()


def test_moe_ffn():
    moe = MoEFFNLayer(d_model=16, hidden=32, n_experts=4,
                      n_expert_per_token=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    params = moe.init(jax.random.PRNGKey(1), x)
    out = moe.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_lora_dense_and_merge():
    mod = LoRADense(features=8, r=4, alpha=8.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 6))
    params = mod.init(jax.random.PRNGKey(1), x)
    y0 = mod.apply(params, x)
    # lora_B starts at zero -> output equals base
    base_only = x @ params["params"]["base"]["kernel"] + \
        params["params"]["base"]["bias"]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(base_only),
                               rtol=1e-5)
    # after perturbing lora params the adaptation contributes
    p2 = jax.tree.map(lambda v: v, params)
    p2["params"]["lora_B"] = jnp.ones_like(p2["params"]["lora_B"])
    y1 = mod.apply(p2, x)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    # merging folds the delta into base and zeroes lora
    merged = merge_lora_params(p2["params"])
    y2 = mod.apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)


def test_teacher_student_loss():
    from paper_accurate_fast_cheap_tpu.models.asr_model import ASRModel
    from paper_accurate_fast_cheap_tpu.models.teacher_student import (
        make_ts_loss_fn,
    )

    def mk():
        return ASRModel(
            vocab_size=8,
            encoder_conf=dict(input_size=16, output_size=32,
                              attention_heads=2, linear_units=64,
                              num_blocks=1, input_layer="linear",
                              selfattention_layer_type="rel_selfattn",
                              dropout_rate=0.0),
            ctc_weight=1.0, sos=7, eos=7,
        )

    student, teacher = mk(), mk()
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))
    flens = jnp.asarray([32, 24])
    labels = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    llens = jnp.asarray([3, 2])
    sp = student.init(jax.random.PRNGKey(1), feats, flens, labels, llens)
    tp = teacher.init(jax.random.PRNGKey(2), feats, flens, labels, llens)
    loss_fn = make_ts_loss_fn(student, teacher, tp, distill_weight=1.0)
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        sp, (feats, flens, labels, llens), jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert float(metrics["loss_distill"]) > 0
    assert np.isfinite(
        np.asarray(jax.tree.leaves(grads)[0])).all()
    # distilling a model against itself gives ~zero KL
    loss_fn_self = make_ts_loss_fn(student, student, sp, distill_weight=1.0,
                                   student_weight=0.0)
    loss_self, m_self = loss_fn_self(sp, (feats, flens, labels, llens),
                                     jax.random.PRNGKey(4))
    assert float(m_self["loss_distill"]) < 1e-5


def test_extra_pos_encodings():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 16))
    for cls in (WhisperPositionalEncoding, LearnablePositionalEncoding):
        mod = cls(d_model=16, dropout_rate=0.0)
        params = mod.init(jax.random.PRNGKey(1), x)
        y, pos = mod.apply(params, x)
        assert y.shape == x.shape and pos.shape[1] == 10


def test_lsl_encoder_and_context_adaptor():
    from paper_accurate_fast_cheap_tpu.models.conformer import (
        ConformerEncoder,
    )
    from paper_accurate_fast_cheap_tpu.models.context_adaptor import (
        ContextAdaptor,
    )

    enc = ConformerEncoder(
        input_size=80, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=3, num_langs=2, dropout_rate=0.0,
        selfattention_layer_type="rel_selfattn",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 80))
    lens = jnp.asarray([40, 30])
    cat = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    params = enc.init(jax.random.PRNGKey(1), x, lens, cat_embs=cat)
    out, _ = enc.apply(params, x, lens, cat_embs=cat)
    assert np.isfinite(np.asarray(out)).all()
    # different language vectors give different outputs
    out_b, _ = enc.apply(params, x, lens,
                         cat_embs=jnp.asarray([[0.0, 1.0], [0.0, 1.0]]))
    assert not np.allclose(np.asarray(out)[0], np.asarray(out_b)[0])

    # deep biasing: adaptor over layer taps
    out3 = enc.apply(params, x, lens, return_layers=True, cat_embs=cat)
    _, _, taps = out3
    ca = ContextAdaptor(vocab_size=10, d_model=32, embed_size=16, heads=2,
                        num_combine_layers=2)
    cv = jnp.asarray([[1, 2, 0], [3, 4, 5]], jnp.int32)
    cv_lens = jnp.asarray([2, 3])
    cap = ca.init(jax.random.PRNGKey(2), taps, cv, cv_lens)
    bias = ca.apply(cap, taps, cv, cv_lens)
    assert bias.shape == taps[-1].shape


def test_espnet_rel_shift_semantics():
    from paper_accurate_fast_cheap_tpu.models.attention import (
        ESPnetRelPositionMultiHeadedAttention as E,
    )

    T = 4
    # in[i, c] = c; after shift out[i, j] should equal (T-1) + (j - i)
    x = jnp.broadcast_to(jnp.arange(2 * T - 1, dtype=jnp.float32),
                         (1, 1, T, 2 * T - 1))
    out = np.asarray(E.rel_shift(x))[0, 0]
    for i in range(T):
        for j in range(T):
            assert out[i, j] == (T - 1) + (j - i), (i, j, out)


def test_espnet_attention_forward():
    from paper_accurate_fast_cheap_tpu.models.attention import (
        ESPnetRelPositionMultiHeadedAttention as E,
    )
    from paper_accurate_fast_cheap_tpu.models.embedding import (
        sinusoid_table,
    )

    T, D = 10, 16
    mod = E(heads=2, d_model=D, dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, T, D))
    pos = jnp.asarray(sinusoid_table(2 * T - 1, D))[None]
    params = mod.init(jax.random.PRNGKey(1), x, x, None, pos)
    out = mod.apply(params, x, x, None, pos)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_wav2vec2_ssl():
    from paper_accurate_fast_cheap_tpu.models.ssl_wav2vec2 import (
        Wav2Vec2Model,
    )

    model = Wav2Vec2Model(
        encoder_conf=dict(input_size=16, output_size=32, attention_heads=2,
                          linear_units=64, num_blocks=1,
                          input_layer="linear",
                          selfattention_layer_type="rel_selfattn",
                          dropout_rate=0.0),
        proj_dim=16, num_negatives=8, mask_prob=0.2, mask_length=3,
    )
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 16))
    lens = jnp.asarray([40, 30])
    params = model.init(jax.random.PRNGKey(1), feats, lens,
                        jax.random.PRNGKey(2), True)
    out = model.apply(params, feats, lens, jax.random.PRNGKey(3), True)
    assert np.isfinite(float(out["loss"]))
    assert int(out["num_masked"]) > 0
    g = jax.grad(lambda p: model.apply(p, feats, lens,
                                       jax.random.PRNGKey(3),
                                       True)["loss"])(params)
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0])).all()


def test_w2vbert_ssl():
    """W2V-BERT (`wenet/ssl/w2vbert/w2vbert_model.py`): contrastive +
    MLM losses both finite and differentiable; MLM weight ramps with
    steps (`:228-231`)."""
    from paper_accurate_fast_cheap_tpu.models.ssl_w2vbert import (
        W2VBertModel,
    )

    model = W2VBertModel(
        encoder_conf=dict(input_size=16, output_size=32, attention_heads=2,
                          linear_units=64, num_blocks=2,
                          input_layer="linear",
                          selfattention_layer_type="rel_selfattn",
                          dropout_rate=0.0),
        proj_dim=16, num_negatives=8, mask_prob=0.2, mask_length=3,
        contrastive_blocks=1, warmup_steps=100,
    )
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 16))
    lens = jnp.asarray([40, 30])
    params = model.init(jax.random.PRNGKey(1), feats, lens,
                        jax.random.PRNGKey(2), 0, True)
    out = model.apply(params, feats, lens, jax.random.PRNGKey(3), 0, True)
    for k in ("loss", "loss_contrastive", "loss_mlm", "codes_acc"):
        assert np.isfinite(float(out[k])), k
    assert int(out["num_masked"]) > 0
    # the MLM ramp: a late step weighs loss_mlm more heavily
    out_late = model.apply(params, feats, lens, jax.random.PRNGKey(3),
                           1000, True)
    early_total = float(out["loss"])
    late_total = float(out_late["loss"])
    lm = float(out["loss_mlm"])
    np.testing.assert_allclose(late_total - early_total, 0.9 * lm,
                               rtol=1e-4)
    g = jax.grad(lambda p: model.apply(p, feats, lens,
                                       jax.random.PRNGKey(3),
                                       0, True)["loss"])(params)
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0])).all()
