"""Pipeline parallelism: GPipe-style microbatched stage pipeline.

The reference has no pipeline parallelism (SURVEY.md §5: DP only).  On
TPU a homogeneous layer stack (the conformer encoder is S identical
blocks) pipelines naturally: stage s holds the params of its block
slice, microbatches flow stage-to-stage over ICI via `ppermute`, and the
bubble is (S-1)/(M+S-1) for M microbatches.

`pipeline_apply` is the generic engine: per-stage params are STACKED on
a leading axis sharded over the mesh's pipeline axis, the per-stage
function is applied inside one `shard_map`, and a static tick loop of
M + S - 1 steps shifts activations forward with a single collective per
tick.  Outputs are collected from the last stage and replicated with a
`psum` (a production variant would keep them stage-sharded; this keeps
the API a drop-in for the sequential stack).

Exactness contract (tested on the 8-device virtual mesh): equals the
sequential `for s: x = fn(params[s], x)` loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(param_list):
    """Stack a list of per-stage param pytrees on a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_list)


def pipeline_apply(fn, stage_params, x, mesh: Mesh, axis: str = "stage",
                   n_microbatches: int | None = None, extra=None):
    """Run ``x`` through S pipelined stages of ``fn``.

    fn: (params_of_one_stage, x_mb[, extra_mb]) -> y_mb with
        y_mb.shape == x_mb.shape
    stage_params: pytree stacked on a leading S axis (see
        `stack_stage_params`); sharded (or shardable) over ``axis``.
    x: (B, ...) batch; split into M microbatches on the leading axis.
    extra: optional pytree of per-sample side inputs (masks, lengths —
        leaves with leading dim B); microbatched alongside ``x``, handed
        to every stage un-transformed (the conformer blocks consume the
        same masks at every depth).

    Differentiable end-to-end (`ppermute`/`psum` have exact transposes),
    so `jax.grad` through this IS the GPipe backward schedule — the
    pp trainer relies on that (`tests/test_pp_train.py` grad parity).
    """
    S = mesh.shape[axis]
    M = n_microbatches or S
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M
    x_mb = x.reshape((M, mb) + x.shape[1:])
    extra_mb = jax.tree.map(
        lambda a: a.reshape((M, mb) + a.shape[1:]), extra)

    p_specs = jax.tree.map(lambda _: P(axis), stage_params)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(p_specs, P(), jax.tree.map(lambda _: P(), extra_mb)),
        out_specs=P(),
        # stage fns may create fresh (device-invariant) scan carries that
        # combine with stage-varying activations (e.g. the WKV chunked
        # state); replication inference would reject that, so check_vma
        # is off and the replication contract is enforced by the explicit
        # psum on emission below
        check_vma=False,
    )
    def _run(params, xs, extras):
        # params leaves have leading axis 1 (this stage's slice)
        mine = jax.tree.map(lambda a: a[0], params)
        idx = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % S) for i in range(S)]

        zero = jnp.zeros_like(xs[0])
        recv = jax.lax.pcast(zero, axis, to="varying")
        outs = []
        for t in range(M + S - 1):
            # stage 0 ingests microbatch t (clamped; masked out later);
            # stage s works on microbatch t - s, so side inputs are
            # selected by that (clamped) microbatch id per stage
            inp = jnp.where(idx == 0, xs[min(t, M - 1)], recv)
            if extras is not None and jax.tree.leaves(extras):
                mb_id = jnp.clip(t - idx, 0, M - 1)
                ex = jax.tree.map(
                    lambda a: jnp.take(a, mb_id, axis=0), extras)
                out = fn(mine, inp, ex)
            else:
                out = fn(mine, inp) if extra is None else fn(mine, inp,
                                                             extras)
            # last stage emits microbatch t-(S-1) at tick t
            if t >= S - 1:
                outs.append(
                    jax.lax.psum(
                        jnp.where(idx == S - 1, out, 0.0), axis))
            recv = jax.lax.ppermute(out, axis, fwd)
        return jnp.stack(outs)

    y_mb = _run(stage_params, x_mb, extra_mb)
    return y_mb.reshape((B,) + x.shape[1:])
