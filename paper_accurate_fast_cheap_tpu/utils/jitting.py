"""Weight-safe jit helpers for the inference CLIs.

`jax.jit(lambda x: model.apply(params, x))` serializes the closed-over
flax param dict into the lowered HLO as dense literals — for the flagship
at long-form window shapes that is a ~400 MB program, which breaks the
remote-compile transport outright (HTTP 413) and bloats compile time
everywhere else.  Binding params through a jitted ``(params, ...)``
function keeps the weights as program *inputs*: the same encoder program
lowers to <1 MB.

This covers direct (top-level) calls only.  A partial-bound function
invoked INSIDE another traced computation (e.g. a `lax.scan` body) still
bakes the concrete params at the outer trace — for those, thread params
explicitly (see `decode/rnnt_search.py`'s ``params=`` plumbing).
"""
from __future__ import annotations

import functools

import jax


def jit_apply(model, params, method=None, donate_argnums=()):
    """jitted ``model.apply`` with params passed as a runtime argument.

    Returns a callable with the same signature the baked-closure idiom
    had: ``fn(*args, **kwargs) -> model.apply(params, *args, **kwargs)``.
    Extra keyword arguments (e.g. ``cat_embs=``) trace as dynamic inputs.
    """
    fn = jax.jit(
        lambda p, *a, **kw: model.apply(p, *a, method=method, **kw),
        donate_argnums=tuple(i + 1 for i in donate_argnums),
    )
    return functools.partial(fn, params)
