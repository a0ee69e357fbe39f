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
    """Apply 'a.b.c=value' overrides; values parsed as YAML scalars."""
    config = copy.deepcopy(config)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"bad override (need key=value): {item!r}")
        key, value = item.split("=", 1)
        parts = key.strip().split(".")
        node = config
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = {}
            node = node[p]
        node[parts[-1]] = yaml.safe_load(value)
    return config
