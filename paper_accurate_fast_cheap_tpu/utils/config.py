"""Config loading + dotted-key CLI overrides.

Parity target: `wenet/utils/config.py:18-39` (override_config) and the
one-YAML-per-experiment convention (`conf/**/*.yaml`), with the resolved
config saved to `model_dir/train.yaml` for inference
(`train_utils.py:288-293`).
"""
from __future__ import annotations

import copy
from typing import Any, Dict, List

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def save_config(config: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def override_config(config: Dict[str, Any],
                    overrides: List[str]) -> Dict[str, Any]:
    """Apply 'a.b.c=value' overrides; values parsed as YAML scalars.

    Unknown paths are created (configs legitimately omit optional keys
    like ``encoder_conf.rwkv_conf.wkv_impl``), but creating one logs a
    warning so a typo'd A/B flag (e.g. ``wkv_imp=``) can't silently
    bench the default config twice — the reference prints an analogous
    "format not correct, skip it" notice (`wenet/utils/config.py:18-39`).
    """
    import logging

    config = copy.deepcopy(config)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"bad override (need key=value): {item!r}")
        key, value = item.split("=", 1)
        parts = key.strip().split(".")
        node = config
        created = None
        for i, p in enumerate(parts[:-1]):
            if p not in node or not isinstance(node[p], dict):
                node[p] = {}
                created = created or ".".join(parts[: i + 1])
            node = node[p]
        if parts[-1] not in node:
            created = created or key.strip()
        if created:
            logging.warning(
                "config override created new key %r (from --set %s) — "
                "check for typos if this was meant to override an "
                "existing value", created, item)
        node[parts[-1]] = yaml.safe_load(value)
    return config
