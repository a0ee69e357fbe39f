"""Checkpoint save/restore + model averaging.

Parity targets: `wenet/utils/checkpoint.py` — save with sidecar yaml metadata
(epoch/step/frames-seen/lr/tag, `:103-191`), load (`:29-80`), forced-full-
snapshot flag file (`:241-264`); snapshot cadence/naming from
`wenet/utils/executor.py:229-255` (`step_%09d`, `epoch_%04d`, snapshot.pt);
`wenet/bin/average_model.py` (val-best / last-N averaging).

TPU-native: Orbax for the pytree store (async-capable, sharding-aware)
instead of torch.save; optimizer state is just another pytree.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    info: Optional[Dict] = None,
) -> None:
    """Save params (+optional optimizer state) under `path/` with a sidecar
    `path.yaml` info file."""
    ckptr = ocp.StandardCheckpointer()
    tree = {"model": params}
    if opt_state is not None:
        # orbax needs a pytree of arrays; optax states are namedtuple trees
        tree["opt"] = jax.tree.map(lambda x: x, opt_state)
    ckptr.save(_ckpt_dir(path), tree, force=True)
    ckptr.wait_until_finished()
    if info is not None:
        with open(path + ".yaml", "w") as f:
            yaml.safe_dump(info, f)


def load_checkpoint(path: str, params_template: Any,
                    opt_template: Any = None):
    """Restore params (and optimizer state when opt_template given).
    Returns (params, opt_state_or_None, info_dict)."""
    ckptr = ocp.StandardCheckpointer()
    try:
        if opt_template is None:
            # template-free restore tolerates checkpoints that also carry
            # an optimizer tree (epoch snapshots) when only params wanted
            restored = ckptr.restore(_ckpt_dir(path))
        else:
            restored = ckptr.restore(
                _ckpt_dir(path), {"model": params_template,
                                  "opt": opt_template}
            )
    except ValueError:
        # cross-platform restore: the checkpoint's recorded shardings
        # name devices of the SAVING platform (e.g. a CPU-trained
        # snapshot loaded on TPU, or vice versa) — fall back to raw
        # numpy restore, placement happens lazily on first use
        import jax
        import numpy as _np

        tree_md = ckptr.metadata(_ckpt_dir(path)).item_metadata.tree
        restore_args = jax.tree.map(
            lambda m: ocp.ArrayRestoreArgs(restore_type=_np.ndarray)
            if hasattr(m, "shape") else ocp.RestoreArgs(), tree_md)
        restored = ocp.PyTreeCheckpointer().restore(
            _ckpt_dir(path), restore_args=restore_args)
    info = {}
    if os.path.exists(path + ".yaml"):
        with open(path + ".yaml") as f:
            info = yaml.safe_load(f) or {}
    return restored["model"], restored.get("opt"), info


def check_forced_full_snapshot_flag(model_dir: str,
                                    remove: bool = True) -> bool:
    """Operator touch-file protocol (`checkpoint.py:241-264`)."""
    flag = os.path.join(model_dir, "force_full_snapshot")
    if os.path.exists(flag):
        if remove:
            os.remove(flag)
        return True
    return False


def snapshot_name(model_dir: str, step: Optional[int] = None,
                  epoch: Optional[int] = None,
                  with_optimizer: bool = False,
                  use_named: bool = False) -> str:
    if epoch is not None:
        return os.path.join(model_dir, f"epoch_{epoch:04d}")
    if use_named and step is not None:
        return os.path.join(model_dir, f"step_{step:09d}")
    return os.path.join(
        model_dir,
        "snapshot_and_optimizer" if with_optimizer else "snapshot",
    )


def list_checkpoints(model_dir: str) -> List[str]:
    out = []
    for p in glob.glob(os.path.join(model_dir, "*")):
        if os.path.isdir(p) and (
            re.match(r".*(epoch_\d+|step_\d+|snapshot)", p)
        ):
            out.append(p)
    return sorted(out)


def average_checkpoints(paths: List[str], params_template: Any):
    """Uniform parameter averaging (`average_model.py`)."""
    assert paths
    ckptr = ocp.StandardCheckpointer()
    acc = None
    for p in paths:
        m = ckptr.restore(_ckpt_dir(p))["model"]
        if acc is None:
            acc = jax.tree.map(
                lambda x: np.asarray(x, np.float64), m
            )
        else:
            acc = jax.tree.map(
                lambda a, x: a + np.asarray(x, np.float64), acc, m
            )
    n = len(paths)
    return jax.tree.map(
        lambda a, t: np.asarray(a / n, dtype=np.asarray(t).dtype),
        acc, params_template,
    )


def select_best_checkpoints(model_dir: str, num: int,
                            metric: str = "cv_loss",
                            minimize: bool = True) -> List[str]:
    """Pick the best-N checkpoints by sidecar-yaml metric (val-best mode of
    `average_model.py:15-50`)."""
    cands = []
    for p in list_checkpoints(model_dir):
        yml = p + ".yaml"
        if os.path.exists(yml):
            with open(yml) as f:
                info = yaml.safe_load(f) or {}
            if metric in info:
                cands.append((info[metric], p))
    cands.sort(reverse=not minimize)
    return [p for _, p in cands[:num]]
