"""Pallas TPU kernel: fused position-wise FFN (matmul-act-matmul).

Why: the encoder is bandwidth-floor-bound on this machine (NOTES.md —
~130 GB/s effective HBM), so time is bytes moved.  The conformer macaron
FFN (`wenet/transformer/positionwise_feed_forward.py:20-56` analog:
Dense(H) -> activation -> Dense(D)) materializes its (B, T, H) hidden
activation in HBM between the two matmuls — at the flagship bench point
(B=8, T=2250 post-ds4, H=2048, bf16) that is 73.7 MB written + 73.7 MB
reread per FFN, x24 FFN instances (12 blocks x 2 macaron halves) ~= 3.5
GB of the encoder's ~8-10 GB/iter total traffic.  This kernel keeps the
hidden activation in VMEM: per (rows, D) input tile it runs

    h = act(x @ W1 + b1)        # (rows, H) f32, VMEM only
    y = h.astype(bf16) @ W2 + b2

in one dispatch.  W1/W2 ride constant-index BlockSpecs, so Mosaic's
pipeliner fetches them once and reuses them across grid steps; HBM
traffic becomes read x + write y (~37 MB per FFN at the bench point,
a ~5x reduction).

MEASURED RESULT (2026-08-20, v5e via tunnel): the premise does NOT pay
on this part.  Serial-carry microbench at (18000, 512)->2048->512 bf16:
XLA 1.179 ms/call vs this kernel 1.351/1.493/2.368/1.500 at rows
256/512/1024/2048; encoder-level A/B at b8/c9000 7607x -> 7409x.  The
v5e carries 128 MB of VMEM and XLA's allocator already keeps the 74 MB
hidden activation on-chip, so there is no HBM round trip to eliminate —
the kernel only adds per-grid-step overhead.  Kept (tested, correct,
grad-safe) as the ready answer for narrow-VMEM parts or wider hiddens
where the intermediate genuinely spills; `PositionwiseFeedForward`
defaults to the XLA path.

Numerics vs the XLA path (two `nn.Dense` calls): same MXU f32
accumulation; the bias adds and the activation run in f32 here instead
of the input dtype, so bf16 outputs can differ by rounding (<= 1 ulp
class) — exact in f32.  The backward is a custom VJP that recomputes
through the plain XLA formula (differentiable everywhere, chosen over a
hand-written kernel because training already fuses well under autodiff;
this mirrors `ops/wkv6_pallas.py`'s recompute-backward policy).

Reference analog: none — the CUDA stack leaves this to torch; fusing it
is TPU-bandwidth engineering.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128

_ACT = {
    "swish": jax.nn.silu,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "hardtanh": lambda v: jnp.clip(v, -1.0, 1.0),
}


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act: str):
    x = x_ref[:]
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _ACT[act](h + b1_ref[:].astype(jnp.float32))
    h = h.astype(w2_ref.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (y + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "rows"))
def _ffn_rows(x, w1, b1, w2, b2, act: str, rows: int):
    """x (R, D) with R % rows == 0 -> (R, D) in x.dtype."""
    R, D = x.shape
    H = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_ffn_kernel, act=act),
        grid=(R // rows,),
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0)),
            pl.BlockSpec((D, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # W1+W2 (bf16, 2x2 MB at 512x2048) + the f32 hidden tile
            # exceed the 16 MB default scoped-vmem budget with double
            # buffering; the v5e has 128 MB
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, w1, b1, w2, b2)


def _ffn_ref(x, w1, b1, w2, b2, act: str):
    """The plain XLA formula (= two nn.Dense calls); backward recompute.

    The activation is applied to the UN-truncated (f32-accumulated)
    pre-activation, matching both the kernel (f32 scratch tile) and the
    XLA production path (jnp.dot promotes and the act runs on the f32
    result) — truncating to bf16 before the act would put this fallback
    / VJP-recompute path in a third numerics class.
    """
    h = _ACT[act]((x @ w1.astype(jnp.float32) + b1).astype(jnp.float32))
    return (h.astype(x.dtype) @ w2 + b2).astype(x.dtype)


def supported(shape, D: int, H: int, dtype) -> bool:
    """Kernel envelope: lane-aligned widths, one compute dtype class.

    rows are padded by the wrapper, so any leading shape is fine.
    """
    return (D % _LANES == 0 and H % _LANES == 0
            and dtype in (jnp.bfloat16, jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_ffn(x, w1, b1, w2, b2, activation: str = "swish",
              rows: int = 256):
    """Fused FFN: act(x @ w1 + b1) @ w2 + b2 with the hidden in VMEM.

    ``x`` is (..., D); leading dims are flattened to rows and padded to
    the row block.  Falls back to the XLA formula outside the envelope.
    Differentiable (recompute VJP), so it is safe under `jax.grad` —
    e.g. the teacher branch of `models/teacher_student.py` runs
    deterministic forwards inside the train step.
    """
    return _fused_ffn_impl(x, w1, b1, w2, b2, activation, rows)


def _fused_ffn_impl(x, w1, b1, w2, b2, activation, rows):
    D = x.shape[-1]
    H = w1.shape[1]
    if not supported(x.shape, D, H, x.dtype):
        return _ffn_ref(x, w1, b1, w2, b2, activation)
    lead = x.shape[:-1]
    R = 1
    for s in lead:
        R *= int(s)
    xr = x.reshape(R, D)
    rows = min(rows, -(-R // 8) * 8)
    Rp = -(-R // rows) * rows
    if Rp != R:
        xr = jnp.pad(xr, ((0, Rp - R), (0, 0)))
    y = _ffn_rows(xr, w1.astype(x.dtype), b1.reshape(1, H).astype(x.dtype),
                  w2.astype(x.dtype), b2.reshape(1, D).astype(x.dtype),
                  activation, rows)
    if Rp != R:
        y = y[:R]
    return y.reshape(lead + (D,))


def _fused_ffn_fwd(x, w1, b1, w2, b2, activation, rows):
    return _fused_ffn_impl(x, w1, b1, w2, b2, activation, rows), \
        (x, w1, b1, w2, b2)


def _fused_ffn_bwd(activation, rows, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _ffn_ref(*a, act=activation), x, w1, b1, w2, b2)
    return vjp(g)


fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)
