"""Every shipped recipe config must parse and abstractly initialize
(jax.eval_shape: no real params) through the model factory — the
schema-compatibility contract with the reference conf library."""
import glob
import os

import jax
import jax.numpy as jnp
import pytest
import yaml

from paper_accurate_fast_cheap_tpu.models.factory import init_model

CONF_DIR = os.path.join(os.path.dirname(__file__),
                        "../examples/gigaspeech/conf")
CONFIGS = sorted(glob.glob(os.path.join(CONF_DIR, "*.yaml")))


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_and_abstract_inits(path):
    with open(path) as f:
        config = yaml.safe_load(f)
    model, mtype = init_model(config, vocab_size=100)
    feats = jnp.zeros((1, 64, 80), jnp.float32)
    flens = jnp.asarray([64], jnp.int32)
    labels = jnp.zeros((1, 4), jnp.int32)
    llens = jnp.asarray([4], jnp.int32)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), feats, flens, labels, llens)
    n_params = sum(
        int(jnp.prod(jnp.asarray(x.shape)))
        for x in jax.tree.leaves(shapes))
    assert n_params > 1_000_000, (path, n_params)   # real 12-layer stacks
