"""Training step: loss/grad/update as one jitted function.

Parity targets: `wenet/utils/train_utils.py` — optimizers adam/adamw
(`:395-480`), grad clip + the hard-max skip rule (skip the step entirely
when grad_norm > clip_hard_maxvalue, `:699-724`), grad accumulation
(`executor.py:189-195`), and `wenet/utils/executor.py` freezing via regex
include/exclude rules (`:328-356`).

TPU-first: the whole step (fwd, bwd, clip, update) is a single jitted
function over a data-parallel mesh; gradient accumulation is a lax.scan
inside the step instead of the DDP no_sync dance.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(
    optim: str = "adam",
    lr_schedule: Callable = None,
    weight_decay: float = 0.0,
    grad_clip: float = 5.0,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
):
    txs = []
    if grad_clip and grad_clip > 0:
        txs.append(optax.clip_by_global_norm(grad_clip))
    if optim == "adam":
        txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if weight_decay:
            txs.append(optax.add_decayed_weights(weight_decay))
    elif optim == "adamw":
        txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        txs.append(optax.add_decayed_weights(
            weight_decay if weight_decay else 0.01))
    else:
        raise ValueError(f"unknown optimizer {optim!r}")
    txs.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*txs)


def restrict_learning_mask(params, exclude: str = None, include: str = None):
    """Regex param freezing (`executor.py:328-356` SetupLearningFlags):
    a param trains if NOT excluded, OR if explicitly included."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        train = True
        if exclude and re.search(exclude, name):
            train = False
        if include and re.search(include, name):
            train = True
        return train

    paths = {jax.tree_util.keystr(p): decide(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, _: paths[jax.tree_util.keystr(p)], params
    )


def wrap_mixed_precision(loss_fn: Callable,
                         compute_dtype=jnp.bfloat16) -> Callable:
    """bf16-compute mixed precision around a loss function.

    Master weights stay fp32 in the optimizer; the forward/backward runs
    with params cast to ``compute_dtype`` (flax Dense promotes
    input/param dtypes, so fp32 params silently force fp32 matmuls — on
    the TPU that is ~50x slower than bf16 for the flagship encoder,
    NOTES.md round-3 LF findings).  Autodiff through the cast returns
    fp32 gradients; the loss is upcast so the clip/skip logic and metric
    accumulation stay fp32.  The reference's analog is torch AMP
    (`wenet/utils/train_utils.py` use_amp / deepspeed ``dtype:``); bf16
    needs no loss scaling (fp32-equal exponent range).
    """

    def mixed(params, batch, rng):
        p16 = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params)
        loss, metrics = loss_fn(p16, batch, rng)
        return loss.astype(jnp.float32), metrics

    return mixed


def make_train_step(
    loss_fn: Callable,
    optimizer,
    accum_steps: int = 1,
    clip_hard_maxvalue: float = 0.0,
    trainable_mask=None,
):
    """Build a jitted train step.

    loss_fn(params, batch, rng) -> (loss, metrics_dict).
    batch leaves must have a leading microbatch axis of size accum_steps
    when accum_steps > 1.
    """

    def compute_grads(params, batch, rng):
        if accum_steps == 1:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch, rng)
            return loss, metrics, grads
        rngs = jax.random.split(rng, accum_steps)

        def micro(carry, inp):
            mb, r = inp
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, mb, r)
            acc = jax.tree.map(jnp.add, carry, grads)
            return acc, (loss, metrics)

        zero = jax.tree.map(jnp.zeros_like, params)
        acc, (losses, metrics) = jax.lax.scan(
            micro, zero, (batch, rngs)
        )
        grads = jax.tree.map(lambda g: g / accum_steps, acc)
        metrics = jax.tree.map(jnp.mean, metrics)
        return jnp.mean(losses), metrics, grads

    def step(state: TrainState, batch, rng):
        loss, metrics, grads = compute_grads(state.params, batch, rng)
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g * m, grads,
                jax.tree.map(lambda b: jnp.asarray(b, jnp.float32),
                             trainable_mask),
            )
        gnorm = optax.global_norm(grads)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        if clip_hard_maxvalue and clip_hard_maxvalue > 0:
            # hard-clip skip rule: discard the whole step on a grad spike
            skip = ~jnp.isfinite(gnorm) | (gnorm > clip_hard_maxvalue)
        else:
            skip = ~jnp.isfinite(gnorm)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(skip, old, new), new_params,
            state.params,
        )
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(skip, old, new)
            if isinstance(new, jnp.ndarray) and new.shape == old.shape
            else new,
            new_opt, state.opt_state,
        )
        metrics = dict(metrics, grad_norm=gnorm,
                       skipped=skip.astype(jnp.float32))
        return TrainState(state.step + 1, new_params, new_opt), loss, metrics

    return step


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(jnp.asarray(0, jnp.int32), params,
                      optimizer.init(params))
