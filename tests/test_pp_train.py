"""Pipeline-parallel trainer integration (`parallel/pp_encoder.py`).

The reference has no pipeline parallelism (SURVEY.md §5); this asserts
the TPU extension is EXACT: the stage-pipelined conformer forward equals
the sequential encoder, and `jax.grad` through the pipeline (GPipe
backward via ppermute/psum transposes) equals sequential grads — on the
8-device virtual CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from paper_accurate_fast_cheap_tpu.models import factory
from paper_accurate_fast_cheap_tpu.parallel import pp_encoder

def _config(att="rwkv_tmix60_bidirectional"):
    return {
        "model": "asr_model",
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 32,
            "attention_heads": 2,
            "linear_units": 48,
            "num_blocks": 4,
            "selfattention_layer_type": att,
            "pos_enc_layer_type": "rel_pos",
            "cnn_module_kernel": 7,
            "cnn_module_norm": "layer_norm",
            "dropout_rate": 0.0,
            "positional_dropout_rate": 0.0,
            "attention_dropout_rate": 0.0,
        },
        "model_conf": {"ctc_weight": 1.0},
        "decoder": None,
    }


CONFIG = _config()
VOCAB, DIM = 11, 16


def _setup(att, T=32):
    model, _ = factory.init_model(_config(att), VOCAB, DIM)
    B = 4
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, DIM).astype(np.float32))
    lens = jnp.asarray([T, T - 7, T, T - 3], jnp.int32)
    labels = jnp.asarray(rng.randint(1, VOCAB, (B, 4)), jnp.int32)
    llens = jnp.asarray([4, 3, 4, 2], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens, labels, llens)
    enc_conf = factory.encoder_conf_from_yaml(
        _config(att)["encoder_conf"], DIM)
    return model, params, enc_conf, (feats, lens, labels, llens)


@pytest.fixture(scope="module")
def setup():
    return _setup("rwkv_tmix60_bidirectional")


@pytest.fixture(scope="module")
def setup_mha():
    # grad-parity/train-step tests use MHA: differentiating the WKV
    # chunked scan through a 4-stage pipelined shard_map takes minutes
    # of XLA-CPU compile; MHA exercises the same pipeline machinery
    return _setup("selfattn")


def _stage_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("stage",))


@pytest.mark.parametrize("n_stages", [2])
def test_pp_forward_matches_sequential(setup, n_stages):
    model, params, enc_conf, batch = setup
    feats, lens, _, _ = batch
    enc_seq, lens_seq = model.apply(params, feats, lens,
                                    method=model.forward_encoder)
    mesh = _stage_mesh(n_stages)
    enc_pp, lens_pp = pp_encoder.pp_encoder_forward(
        enc_conf, params["params"]["encoder"], feats, lens, mesh)
    np.testing.assert_array_equal(np.asarray(lens_seq), np.asarray(lens_pp))
    np.testing.assert_allclose(np.asarray(enc_seq), np.asarray(enc_pp),
                               rtol=2e-5, atol=2e-5)


def test_pp_grad_parity(setup_mha):
    """jax.grad through the pipeline == sequential grads (loss + grads)."""
    model, params, enc_conf, batch = setup_mha
    mesh = _stage_mesh(2)
    pp_loss = pp_encoder.make_pp_loss_fn(model, enc_conf, mesh)

    def seq_loss(p, batch, rng):
        out = model.apply(p, *batch, deterministic=True)
        return out["loss"], out

    (l_pp, _), g_pp = jax.value_and_grad(pp_loss, has_aux=True)(
        params, batch, None)
    (l_sq, _), g_sq = jax.value_and_grad(
        lambda p: seq_loss(p, batch, None), has_aux=True)(params)
    np.testing.assert_allclose(float(l_pp), float(l_sq), rtol=1e-5)
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_sq = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_sq)}
    assert len(flat_pp) == len(flat_sq)
    for k, v in flat_pp:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_sq[ks]),
            rtol=5e-4, atol=5e-5, err_msg=ks)


def test_pp_train_step_runs(setup_mha):
    """One full optimizer step through make_train_step with the pp loss."""
    from paper_accurate_fast_cheap_tpu.train import train_step as ts

    model, params, enc_conf, batch = setup_mha
    mesh = _stage_mesh(2)
    pp_loss = pp_encoder.make_pp_loss_fn(model, enc_conf, mesh)
    opt = ts.make_optimizer("adam", lambda s: 1e-3)
    step_fn = ts.make_train_step(pp_loss, opt)
    state = ts.init_train_state(params, opt)
    state2, loss, metrics = jax.jit(step_fn)(state, batch,
                                             jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(metrics["skipped"]) == 0.0
    # params actually moved
    d0 = jax.tree_util.tree_leaves(state.params)[0]
    d1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_split_merge_roundtrip(setup):
    model, params, enc_conf, _ = setup
    enc_params = params["params"]["encoder"]
    rest, stacked = pp_encoder.split_encoder_params(enc_params, 4, 2)
    merged = pp_encoder.merge_encoder_params(rest, stacked, 4, 2)
    flat_a = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(enc_params)}
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(merged)}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]))


def test_dirdrop_rejected():
    enc_conf = dict(CONFIG["encoder_conf"],
                    selfattention_layer_type="rwkv_tmix60_dir_layer_drop",
                    input_size=DIM)
    with pytest.raises(ValueError, match="layer id"):
        pp_encoder._build_layer_template(enc_conf)


def test_pp_loss_dropout_live_with_rng():
    """With an rng, dropout must be LIVE outside the pipelined blocks
    (subsampling + post-encoder heads) — make_pp_loss_fn used to hardcode
    deterministic=True, silently training unregularized.  rng=None stays
    fully deterministic (the parity contract above)."""
    model, params, enc_conf, batch = _setup("selfattn")
    enc_conf = dict(enc_conf, dropout_rate=0.3,
                    positional_dropout_rate=0.3)
    cfg = _config("selfattn")
    cfg["encoder_conf"]["dropout_rate"] = 0.3
    cfg["encoder_conf"]["positional_dropout_rate"] = 0.3
    model, _ = factory.init_model(cfg, VOCAB, DIM)
    mesh = _stage_mesh(2)
    pp_loss = pp_encoder.make_pp_loss_fn(model, enc_conf, mesh)

    l_det1, _ = pp_loss(params, batch, None)
    l_det2, _ = pp_loss(params, batch, None)
    np.testing.assert_allclose(float(l_det1), float(l_det2))

    l_a, _ = pp_loss(params, batch, jax.random.PRNGKey(0))
    l_b, _ = pp_loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(l_a)) and np.isfinite(float(l_b))
    # different dropout masks -> different losses, and both differ from
    # the deterministic loss
    assert float(l_a) != float(l_b)
    assert float(l_a) != float(l_det1)
