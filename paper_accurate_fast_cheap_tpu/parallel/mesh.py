"""Device mesh + sharding helpers.

The reference scales by pure data parallelism over NCCL DDP
(`wenet/utils/train_utils.py:354-392`) with optional DeepSpeed ZeRO.  The
TPU-native equivalent: a `jax.sharding.Mesh` with a "data" axis (batch
sharded, params replicated) and XLA-inserted collectives over ICI; optimizer
state sharding (ZeRO-1 analog) is a NamedSharding on the optimizer pytree.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for (B, ...) arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every leaf of a batch pytree with its leading axis sharded over
    the data axis."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_dp_tp_mesh(n_devices: Optional[int] = None,
                    tp: int = 2) -> Mesh:
    """2-D mesh (data, model) for hybrid data+tensor parallelism.

    The reference scales only by DP (SURVEY.md §5: "No TP/PP/SP/EP
    anywhere"); TP here is a TPU-native extension: big kernels are sharded
    over the 'model' axis, XLA inserts the all-reduces over ICI."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    assert len(devs) % tp == 0
    return Mesh(
        np.asarray(devs).reshape(len(devs) // tp, tp), ("data", "model")
    )


def tp_param_spec(path_str: str, shape) -> P:
    """Tensor-parallel PartitionSpec by parameter role.

    - FFN up-projection kernels (d -> hidden): shard hidden (last dim)
    - FFN down-projection kernels (hidden -> d): shard hidden (first dim)
    - output-vocab projections (ctc_lo / output_layer): shard vocab
    - everything else: replicated
    """
    if len(shape) != 2:
        return P()
    if "ctc_lo" in path_str or "output_layer" in path_str:
        return P(None, "model")
    if "feed_forward" in path_str or "mlp" in path_str:
        if "Dense_0" in path_str:
            return P(None, "model")
        if "Dense_1" in path_str:
            return P("model", None)
    return P()


def shard_params_tp(mesh: Mesh, params):
    """Place a param tree with the tp_param_spec rules."""

    def place(path, x):
        name = jax.tree_util.keystr(path)
        spec = tp_param_spec(name, getattr(x, "shape", ()))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def tp_shardings(mesh: Mesh, params):
    """The NamedSharding tree matching shard_params_tp (for jit specs)."""

    def spec(path, x):
        name = jax.tree_util.keystr(path)
        return NamedSharding(
            mesh, tp_param_spec(name, getattr(x, "shape", ()))
        )

    return jax.tree_util.tree_map_with_path(spec, params)


def ep_param_spec(path_str: str, shape) -> P:
    """Expert-parallel PartitionSpec: MoE expert-stacked kernels
    (``w1``/``w2`` of `models.convolution.MoEFFNLayer`, shape
    (n_experts, ...)) shard their expert axis over 'model'; everything
    else is replicated.  The dense one-hot dispatch makes the combine a
    contraction over the expert axis, so XLA closes each token's output
    with one all-reduce over ICI — token-choice routing without any
    gather/scatter (the reference's MoE, `positionwise_feed_forward.py:
    58-115`, is single-device only)."""
    if len(shape) == 3 and (path_str.endswith("['w1']")
                            or path_str.endswith("['w2']")
                            or path_str.endswith("/w1")
                            or path_str.endswith("/w2")):
        return P("model", None, None)
    return P()


def shard_params_ep(mesh: Mesh, params):
    """Place a param tree with the ep_param_spec rules."""

    def place(path, x):
        name = jax.tree_util.keystr(path)
        spec = ep_param_spec(name, getattr(x, "shape", ()))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
