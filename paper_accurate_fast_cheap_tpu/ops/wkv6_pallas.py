"""Pallas TPU kernel for the WKV6 forward pass.

Replaces the HBM-roundtrip-heavy XLA chunked path for inference: the XLA
formulation (`ops/wkv6.py`) materializes ~10 intermediate (B, T, H, N)
tensors between fusions, while this kernel streams r/k/v/w through VMEM
once per chunk, keeps the (N, N) recurrence state in a VMEM scratch across
grid steps, and writes only y — the op becomes pure-bandwidth on its inputs.

Layout: grid (B*H, T/L); each grid step processes an (L, N) chunk as nb
sub-blocks of S=16:
  - intra sub-block: midpoint-recentred factor matmuls, exact in fp32;
  - across sub-blocks + across chunks: a sequential scan over the nb
    sub-blocks updating the (N, N) state with (S, N) x (N, N) MXU matmuls
    (all in VMEM, unrolled 16x per grid step).

Backward: custom_vjp that recomputes through the differentiable XLA chunked
path (the kernel is the inference/bench fast path; training uses autodiff).

Status (v5e, B=4-8, T=2250, H=8, N=64 bf16): v4 (default) = big-matmul
intra (v2) + HEAD-PAIRED block-diagonal state scan (128-lane dots),
~17% faster than v2 standalone; beats the XLA chunked path in-context.
Profiling shows the remaining cost is still the serial sub-block scan
(~10x above bandwidth-bound).  v3 (batched-over-heads dots) is slower —
Mosaic unrolls dot_general batch dims rather than widening the MXU.
Round-2 direction: break the serial chain entirely with a two-pass
chunk-state formulation.  bf16 outputs match the scan oracle to within
output quantization (~0.8% at |y|~60), same as the XLA path on TPU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 16  # inner sub-block length


def _kernel(r_ref, k_ref, v_ref, w_ref, u_ref, y_ref, state_ref, *,
            L: int, N: int, carry_in: bool):
    c = pl.program_id(1)

    @pl.when(jnp.logical_and(c == 0, not carry_in))
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    f32 = jnp.float32
    r = r_ref[0].astype(f32)          # (L, N)
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)
    w = w_ref[0].astype(f32)
    u = u_ref[0].astype(f32)          # (1, N) -> broadcast

    w = jnp.minimum(w, np.log(160.0 / (SUB + 2)))
    nb = L // SUB
    # boolean constants lower badly in Mosaic (i8->i1 trunc); build the
    # strict lower-triangular mask from iota comparisons instead
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    tri = row > col
    # cumsum via matmul with a static lower-triangular ones matrix
    # (lax.cumsum has no Pallas TPU lowering)
    csum = (row >= col).astype(f32)

    for j in range(nb):
        sl = slice(j * SUB, (j + 1) * SUB)
        rj, kj, vj, wj = r[sl], k[sl], v[sl], w[sl]
        lw = -jnp.exp(wj)                       # (S, N)
        Bi = jnp.dot(csum, lw, preferred_element_type=f32)
        Be = Bi - lw
        m = Bi[SUB // 2][None, :]
        q_mid = rj * jnp.exp(Be - m)
        k_mid = kj * jnp.exp(m - Bi)
        A = jax.lax.dot_general(
            q_mid, k_mid, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        A = jnp.where(tri, A, 0.0)
        diag = jnp.sum(rj * u * kj, axis=-1, keepdims=True)
        y = jnp.dot(A, vj, preferred_element_type=f32) + diag * vj
        # cross (state) contribution + state update
        S = state_ref[...]
        q_gl = rj * jnp.exp(Be)
        y = y + jnp.dot(q_gl, S, preferred_element_type=f32)
        total = Bi[SUB - 1][None, :]
        k_tail = kj * jnp.exp(total - Bi)
        state_ref[...] = (
            jnp.exp(total).T * S
            + jax.lax.dot_general(
                k_tail, vj, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        )
        y_ref[0, sl, :] = y.astype(y_ref.dtype)


def _kernel_v2(r_ref, k_ref, v_ref, w_ref, u_ref, y_ref, state_ref, *,
               L: int, N: int):
    """v2: single big masked (L, L) intra matmul per chunk + 16-step
    sub-block state scan (fewer, larger MXU ops than _kernel)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    f32 = jnp.float32
    r = r_ref[0].astype(f32)          # (L, N)
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)
    w = w_ref[0].astype(f32)
    u = u_ref[0].astype(f32)          # (1, N)
    w = jnp.minimum(w, np.log(160.0 / (SUB + 2)))
    nb = L // SUB

    rowL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    colL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    same_blk = (rowL // SUB) == (colL // SUB)
    # block-diagonal inclusive-cumsum operator (per sub-block)
    csum_blk = ((rowL >= colL) & same_blk).astype(f32)
    # selectors: midpoint row / last row of own sub-block
    mid_sel = ((colL == (rowL // SUB) * SUB + SUB // 2)).astype(f32)
    last_sel = ((colL == (rowL // SUB) * SUB + SUB - 1)).astype(f32)

    lw = -jnp.exp(w)                                     # (L, N)
    Bi = jnp.dot(csum_blk, lw, preferred_element_type=f32)
    Be = Bi - lw
    m = jnp.dot(mid_sel, Bi, preferred_element_type=f32)
    total = jnp.dot(last_sel, Bi, preferred_element_type=f32)

    q_mid = r * jnp.exp(Be - m)
    k_mid = k * jnp.exp(m - Bi)
    A = jax.lax.dot_general(q_mid, k_mid, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32)   # (L, L)
    intra_ok = (rowL > colL) & same_blk
    A = jnp.where(intra_ok, A, 0.0)
    diag = jnp.sum(r * u * k, axis=-1, keepdims=True)
    y = jnp.dot(A, v, preferred_element_type=f32) + diag * v

    q_gl = r * jnp.exp(Be)
    k_tail = k * jnp.exp(total - Bi)
    for j in range(nb):
        sl = slice(j * SUB, (j + 1) * SUB)
        S = state_ref[...]
        y_cross = jnp.dot(q_gl[sl], S, preferred_element_type=f32)
        y_ref[0, sl, :] = (y[sl] + y_cross).astype(y_ref.dtype)
        tj = total[j * SUB][None, :]
        state_ref[...] = (
            jnp.exp(tj).T * S
            + jax.lax.dot_general(
                k_tail[sl], v[sl], (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        )


def _kernel_v4(r_ref, k_ref, v_ref, w_ref, u_ref, y_ref, state_ref, *,
               L: int, N: int):
    """v4: v2 with HEAD-PAIRED state scan — two heads' states live in one
    block-diagonal (2N, 2N) scratch so every scan dot is 128 lanes wide
    (halves the serial dot count of the hot loop)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    f32 = jnp.float32
    nb = L // SUB
    rowL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    colL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    same_blk = (rowL // SUB) == (colL // SUB)
    csum_blk = ((rowL >= colL) & same_blk).astype(f32)
    mid_sel = ((colL == (rowL // SUB) * SUB + SUB // 2)).astype(f32)
    last_sel = ((colL == (rowL // SUB) * SUB + SUB - 1)).astype(f32)
    intra_ok = (rowL > colL) & same_blk

    ys = []
    q_gls = []
    k_tails = []
    vs = []
    totals = []
    for h in range(2):
        r = r_ref[h].astype(f32)
        k = k_ref[h].astype(f32)
        v = v_ref[h].astype(f32)
        w = w_ref[h].astype(f32)
        u = u_ref[h].astype(f32)
        w = jnp.minimum(w, np.log(160.0 / (SUB + 2)))
        lw = -jnp.exp(w)
        Bi = jnp.dot(csum_blk, lw, preferred_element_type=f32)
        Be = Bi - lw
        m = jnp.dot(mid_sel, Bi, preferred_element_type=f32)
        total = jnp.dot(last_sel, Bi, preferred_element_type=f32)
        q_mid = r * jnp.exp(Be - m)
        k_mid = k * jnp.exp(m - Bi)
        A = jax.lax.dot_general(q_mid, k_mid, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
        A = jnp.where(intra_ok, A, 0.0)
        diag = jnp.sum(r * u * k, axis=-1, keepdims=True)
        ys.append(jnp.dot(A, v, preferred_element_type=f32) + diag * v)
        q_gls.append(r * jnp.exp(Be))
        k_tails.append(k * jnp.exp(total - Bi))
        vs.append(v)
        totals.append(total)

    # paired scan: 128-lane concatenated operands, block-diag (2N, 2N) state
    q_cat = jnp.concatenate(q_gls, axis=-1)        # (L, 2N)
    kt_cat = jnp.concatenate(k_tails, axis=-1)
    v_cat = jnp.concatenate(vs, axis=-1)
    tot_cat = jnp.concatenate(totals, axis=-1)     # (L, 2N)
    y_cat = jnp.concatenate(ys, axis=-1)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (2 * N, 2 * N), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (2 * N, 2 * N), 1)
    blkdiag = ((r2 // N) == (c2 // N)).astype(f32)

    for j in range(nb):
        sl = slice(j * SUB, (j + 1) * SUB)
        S = state_ref[...]
        y_cross = jnp.dot(q_cat[sl], S, preferred_element_type=f32)
        out = (y_cat[sl] + y_cross).astype(y_ref.dtype)
        y_ref[0, sl, :] = out[:, :N]
        y_ref[1, sl, :] = out[:, N:]
        tj = tot_cat[j * SUB][None, :]             # (1, 2N)
        M = jax.lax.dot_general(
            kt_cat[sl], v_cat[sl], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        state_ref[...] = (jnp.exp(tj).T * S + M) * blkdiag


def _kernel_v3(r_ref, k_ref, v_ref, w_ref, u_ref, y_ref, state_ref, *,
               N: int, BH: int):
    """v3: grid over (chunk?, sub-block) with ALL B*H heads batched in each
    step — the serial state scan's small matmuls become (BH, ...)-batched
    dots that fill the MXU (the profile shows the per-head serial scan is
    the bottleneck, ~15x above bandwidth-bound)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    f32 = jnp.float32
    r = r_ref[...].astype(f32)        # (BH, S, N)
    k = k_ref[...].astype(f32)
    v = v_ref[...].astype(f32)
    w = w_ref[...].astype(f32)
    u = u_ref[...].astype(f32)        # (BH, 1, N)
    w = jnp.minimum(w, np.log(160.0 / (SUB + 2)))

    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    csum = (row >= col).astype(f32)

    lw = -jnp.exp(w)                                   # (BH, S, N)
    csum_b = jnp.broadcast_to(csum[None], (BH, SUB, SUB))
    Bi = jax.lax.dot_general(
        csum_b, lw, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )                                                  # (BH, S, N)
    Be = Bi - lw
    m = Bi[:, SUB // 2 : SUB // 2 + 1, :]
    q_mid = r * jnp.exp(Be - m)
    k_mid = k * jnp.exp(m - Bi)
    batch_dims = (((2,), (2,)), ((0,), (0,)))
    A = jax.lax.dot_general(q_mid, k_mid, batch_dims,
                            preferred_element_type=f32)  # (BH, S, S)
    A = jnp.where((row > col)[None], A, 0.0)
    diag = jnp.sum(r * u * k, axis=-1, keepdims=True)
    # y_intra: (BH,S,S) @ (BH,S,N)
    y = jax.lax.dot_general(
        A, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    ) + diag * v

    S = state_ref[...]                                  # (BH, N, N)
    q_gl = r * jnp.exp(Be)
    y = y + jax.lax.dot_general(
        q_gl, S, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    total = Bi[:, SUB - 1 : SUB, :]                     # (BH, 1, N)
    k_tail = k * jnp.exp(total - Bi)
    state_ref[...] = (
        jnp.exp(total).transpose(0, 2, 1) * S
        + jax.lax.dot_general(
            k_tail, v, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
    )
    y_ref[...] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("chunk_size", "return_state", "version"))
def _wkv6_pallas_fwd(r, k, v, w, u, state=None, chunk_size: int = 256,
                     return_state: bool = False, version: int = 4):
    B, T, H, N = r.shape
    out_dtype = r.dtype
    L = int(chunk_size)
    L = max(SUB, (L // SUB) * SUB)
    pad = (-T) % L
    if pad:
        zpad = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        r, k, v = zpad(r), zpad(k), zpad(v)
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0), (0, 0)),
                    constant_values=-1e30)
    Tp = T + pad
    C = Tp // L
    BH = B * H

    def to_bh(x):  # (B, T, H, N) -> (BH, T, N)
        return x.transpose(0, 2, 1, 3).reshape(BH, Tp, N)

    rb, kb, vb, wb = map(to_bh, (r, k, v, w))
    ub = jnp.broadcast_to(u[None], (B, H, N)).reshape(BH, 1, N)

    kwargs = dict(
        grid=(BH, C),
        in_specs=[
            pl.BlockSpec((1, L, N), lambda bh, c: (bh, c, 0)),
            pl.BlockSpec((1, L, N), lambda bh, c: (bh, c, 0)),
            pl.BlockSpec((1, L, N), lambda bh, c: (bh, c, 0)),
            pl.BlockSpec((1, L, N), lambda bh, c: (bh, c, 0)),
            pl.BlockSpec((1, 1, N), lambda bh, c: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, N), lambda bh, c: (bh, c, 0)),
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )

    if state is None:
        if version == 4 and BH % 2:
            version = 2  # odd head count: fall back to unpaired kernel
        if version == 4:
            spec = pl.BlockSpec((2, L, N), lambda p, c: (p, c, 0))
            y = pl.pallas_call(
                functools.partial(_kernel_v4, L=L, N=N),
                out_shape=jax.ShapeDtypeStruct((BH, Tp, N), out_dtype),
                grid=(BH // 2, C),
                in_specs=[spec, spec, spec, spec,
                          pl.BlockSpec((2, 1, N), lambda p, c: (p, 0, 0))],
                out_specs=spec,
                scratch_shapes=[pltpu.VMEM((2 * N, 2 * N), jnp.float32)],
                interpret=jax.default_backend() != "tpu",
            )(rb, kb, vb, wb, ub)
        elif version == 3:
            # grid over sub-blocks; all BH heads batched per step
            steps = Tp // SUB
            spec = pl.BlockSpec((BH, SUB, N), lambda s: (0, s, 0))
            y = pl.pallas_call(
                functools.partial(_kernel_v3, N=N, BH=BH),
                out_shape=jax.ShapeDtypeStruct((BH, Tp, N), out_dtype),
                grid=(steps,),
                in_specs=[spec, spec, spec, spec,
                          pl.BlockSpec((BH, 1, N), lambda s: (0, 0, 0))],
                out_specs=spec,
                scratch_shapes=[pltpu.VMEM((BH, N, N), jnp.float32)],
                interpret=jax.default_backend() != "tpu",
            )(rb, kb, vb, wb, ub)
        else:
            if version == 2:
                kernel = functools.partial(_kernel_v2, L=L, N=N)
            else:
                kernel = functools.partial(_kernel, L=L, N=N,
                                           carry_in=False)
            y = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((BH, Tp, N), out_dtype),
                **kwargs,
            )(rb, kb, vb, wb, ub)
        S_fin = None
    else:
        raise NotImplementedError(
            "pallas wkv6 with carried-in state: use impl='chunked'"
        )

    y = y.reshape(B, H, Tp, N).transpose(0, 2, 1, 3)[:, :T]
    if return_state:
        # final state is not emitted by the kernel; recompute via the
        # chunked path when callers need it
        from paper_accurate_fast_cheap_tpu.ops.wkv6 import wkv6_chunked

        _, S_fin = wkv6_chunked(r[:, :T], k[:, :T], v[:, :T], w[:, :T], u,
                                return_state=True)
        return y, S_fin
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _wkv6_pallas_diff(r, k, v, w, u, chunk_size):
    return _wkv6_pallas_fwd(r, k, v, w, u, chunk_size=chunk_size)


def _diff_fwd(r, k, v, w, u, chunk_size):
    return _wkv6_pallas_fwd(r, k, v, w, u, chunk_size=chunk_size), \
        (r, k, v, w, u)


def _diff_bwd(chunk_size, res, g):
    from paper_accurate_fast_cheap_tpu.ops.wkv6 import wkv6_chunked

    r, k, v, w, u = res
    _, vjp = jax.vjp(
        lambda *a: wkv6_chunked(*a, chunk_size=chunk_size), r, k, v, w, u
    )
    return vjp(g)


_wkv6_pallas_diff.defvjp(_diff_fwd, _diff_bwd)


def wkv6_pallas(r, k, v, w, u, state=None, chunk_size: int = 256,
                return_state: bool = False):
    """Pallas forward (+ XLA-recompute backward).  Same semantics as
    `ops.wkv6.wkv6_ref` for state=None; carried-in state falls back to the
    chunked path."""
    if state is not None:
        from paper_accurate_fast_cheap_tpu.ops.wkv6 import wkv6_chunked

        return wkv6_chunked(r, k, v, w, u, state=state,
                            chunk_size=chunk_size,
                            return_state=return_state)
    if return_state:
        return _wkv6_pallas_fwd(r, k, v, w, u, chunk_size=chunk_size,
                                return_state=True)
    return _wkv6_pallas_diff(r, k, v, w, u, chunk_size)
