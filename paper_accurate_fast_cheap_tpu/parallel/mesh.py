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
