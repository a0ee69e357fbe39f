"""Pallas TPU kernel for the WKV6 forward pass.

Replaces the HBM-roundtrip-heavy XLA chunked path for inference: the XLA
formulation (`ops/wkv6.py`) materializes ~10 intermediate (B, T, H, N)
tensors between fusions, while this kernel streams r/k/v/w through VMEM
once per chunk, keeps the (N, N) recurrence state in a VMEM scratch across
grid steps, and writes only y — the op becomes pure-bandwidth on its inputs.

Default path (v5, round 2): TWO-PASS formulation with no serial state
chain anywhere —
  pass 1 (`_kernel_v5`): every grid step is an independent (G heads x one
    L-chunk) tile; intra-sub-block outputs from one masked (L, L) MXU
    matmul, decay prefixes/suffixes from log-depth VPU shift-adds,
    cross-sub-block state from a Hillis-Steele scan over stacked (N, N)
    sub-block KV summaries; emits per-chunk (N, N) KV summaries;
  pass 2 (XLA): log-depth `associative_scan` over chunks + one batched
    MXU matmul applies cross-chunk state.  Carried-in state and the final
    state just enter/exit the chunk scan (native streaming support; the
    reference needs a separate wkv6state CUDA kernel for this,
    `wkv6state_cuda.cu:8-25`).

Backward: custom_vjp into the analytic chunked backward
(`ops/wkv6.wkv6_backward` — two chunked passes, no stored intermediates),
so the pallas forward composes with training at the same gradient cost as
the default chunked path.

Status (v5e, B=8, T=2250, H=8, N=64 bf16): v5 = 1.82 ms/call vs v4
2.5-2.9 ms (1.4x), encoder bench 6747 -> 7698 x realtime.  Ablation shows
per-grid-step fixed overhead ~10us dominates at small tiles — hence the
G=8 head grouping (72 steps vs 576); beyond G=8 compute per step, not
step count, is the limit.  Versions 1-4 (serial in-kernel state scans)
are kept for benchmarking.  bf16 outputs match the scan oracle to within
output quantization (~0.6%), same as the XLA path on TPU.
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


def _v5_head(r, k, v, w, u, *, L: int, N: int, cd):
    """One head-chunk of the v5 two-pass kernel body: returns
    (y_local (L,N) f32, qg (L,N) f32, chunk KV (N,N) f32)."""
    f32 = jnp.float32
    nb = L // SUB
    NB = nb * N
    w = jnp.minimum(w, np.log(160.0 / (SUB + 2)))

    rowL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    colL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    intra_mask = (rowL > colL) & ((rowL // SUB) == (colL // SUB))
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)

    lw = -jnp.exp(w)                                     # (L, N)

    # log-depth masked shift-add cumsums on the VPU (no selector matmuls):
    #   Bi  = inclusive within-sub-block prefix of lw
    #   sfx = exclusive within-sub-block suffix of lw   (=> total - Bi)
    #   F   = inclusive within-chunk prefix of lw       (=> block prefix)
    def shift_down(x, s):
        return jnp.concatenate([jnp.zeros((s, x.shape[1]), f32), x[:-s]], 0)

    def shift_up(x, s):
        return jnp.concatenate([x[s:], jnp.zeros((s, x.shape[1]), f32)], 0)

    Bi = lw
    s = 1
    while s < SUB:
        Bi = Bi + jnp.where((rows1 % SUB) >= s, shift_down(Bi, s), 0.0)
        s *= 2
    sfx = lw
    s = 1
    while s < SUB:
        sfx = sfx + jnp.where((rows1 % SUB) < SUB - s, shift_up(sfx, s), 0.0)
        s *= 2
    sfx = sfx - lw                     # exclusive suffix within sub-block
    F = lw
    s = 1
    while s < L:
        F = F + jnp.where(rows1 >= s, shift_down(F, s), 0.0)
        s *= 2
    Be = Bi - lw                       # exclusive prefix within sub-block
    total = Bi + sfx                   # own-sub-block total, per row
    pfx = F - Bi                       # earlier-sub-blocks prefix, per row

    # ---- intra sub-block, recentred at total/2 (same exponent budget as
    # the midpoint row: |Be - total/2| <= |total|/2 <= 8 * rate_clamp)
    m = 0.5 * total
    q_mid = (r * jnp.exp(Be - m)).astype(cd)
    k_mid = (k * jnp.exp(m - Bi)).astype(cd)
    A = jax.lax.dot_general(q_mid, k_mid, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32)   # (L, L)
    A = jnp.where(intra_mask, A, 0.0).astype(cd)
    diag = jnp.sum(r * u * k, axis=-1, keepdims=True)
    vc = v.astype(cd)
    y = jnp.dot(A, vc, preferred_element_type=f32) + diag * v

    # ---- per-sub-block KV summaries: nb independent (N,S)@(S,N) dots
    # (batched dot_general; Mosaic unrolls the batch dim, but the dots
    # have no serial dependency so they pipeline)
    q2 = r * jnp.exp(Be)               # decay from own sub-block start
    k_tail = k * jnp.exp(sfx)          # decay to own sub-block end
    kt_b = k_tail.astype(cd).reshape(nb, SUB, N)
    v_b = vc.reshape(nb, SUB, N)
    KVs = jax.lax.dot_general(
        kt_b, v_b, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    ).reshape(NB, N)                   # stacked (block, key-chan)

    # per-row decay a[j*N+n] = exp(total_j[n]): lane->sublane movement is
    # not a supported Mosaic reshape, so broadcast each block-total row to
    # an (N, N) tile and extract the diagonal with a one-hot lane sum
    tot_blk = total.reshape(nb, SUB, N)[:, SUB - 1]        # (nb, N)
    tot_stk = jnp.broadcast_to(
        tot_blk[:, None, :], (nb, N, N)).reshape(NB, N)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (NB, N), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NB, N), 1)
    a = jnp.sum(jnp.where(lane == ridx % N, jnp.exp(tot_stk), 0.0),
                axis=1, keepdims=True)                     # (NB, 1)

    # ---- Hillis-Steele inclusive scan over sub-blocks (log-depth, VPU)
    b = KVs
    off = 1
    while off < nb:
        sh = off * N
        a_prev = jnp.concatenate(
            [jnp.ones((sh, 1), f32), a[: NB - sh]], axis=0)
        b_prev = jnp.concatenate(
            [jnp.zeros((sh, N), f32), b[: NB - sh]], axis=0)
        b = a * b_prev + b
        a = a * a_prev
        off *= 2

    # state BEFORE each sub-block = inclusive state of the previous one
    s_before = jnp.concatenate(
        [jnp.zeros((N, N), f32), b[: NB - N]], axis=0)     # (NB, N)
    q_b = q2.astype(cd).reshape(nb, SUB, N)
    s_b = s_before.astype(cd).reshape(nb, N, N)
    y_bet = jax.lax.dot_general(
        q_b, s_b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    ).reshape(L, N)
    return y + y_bet, q2 * jnp.exp(pfx), b[NB - N :]


def _kernel_v6(r_ref, k_ref, v_ref, w_ref, u_ref,
               yt_ref, qg_ref, kvt_ref, *, L: int, N: int, G: int):
    """v6 (two-pass, pass 1): lane-packed heads + issue-minimal MXU dots.

    v5's cost profile (measured by kernel-body ablation on the v5e) is NOT
    the math: each grid step issued ~34 MXU dots per head (16 sub-block KV
    summaries + 16 state applies + intra), i.e. ~270 tiny op issues per
    step, plus all VPU work ran on (L, 64) half-filled lanes.  v6 fixes
    both structurally:

    * all VPU work (decay cumsums, exp factors, the Hillis-Steele scan)
      runs once on (L, G*N) / (NB, G*N) arrays — G heads packed into the
      lane dimension, full 8x128 tiles, one op issue instead of G;
    * the per-head sub-block dots collapse to TWO dots per head by
      block-expansion:
        - KV^T summaries: one (L, NB)x(L, N) dot on a lane-tiled,
          block-masked copy of v (out rows j*N+p stack the sub-blocks);
        - state apply: one (NB, N)x(L, N) dot (contracting the key
          channel) followed by a masked row-block reduction;
      both contract with `dot_general` dimension numbers instead of data
      transposes (Mosaic supports transposed-operand dots, proven in v4);
    * the cross-sub-block scan runs in the TRANSPOSED state orientation
      (rows = value channel, lanes = key channel) so the per-row decay is
      a plain sublane broadcast of the sub-block totals — no
      diagonal-extraction trick (v5's `adiag`) at all;
    * the intra diagonal (bonus-u) term is embedded on the diagonal of the
      masked (L, L) A matrix, so the intra output needs no extra
      elementwise pass and can be produced directly in transposed
      orientation.

    Because the state is transposed, the kernel writes y TRANSPOSED
    ((G*N, L) per chunk) and the chunk KV summaries transposed; XLA
    untransposes during unpacking (fused with the existing layout moves).
    Per grid step: 4 MXU issues per head (vs ~34) and ~1/4 the VPU issue
    count.  Math identical to v5 (same recentring, same clamp).
    """
    f32 = jnp.float32
    cd = jnp.bfloat16 if qg_ref.dtype == jnp.bfloat16 else jnp.float32
    GN = G * N
    nb = L // SUB
    NB = nb * N

    r = r_ref[0].astype(f32)          # (L, GN)
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)
    w = w_ref[0].astype(f32)
    u = u_ref[0].astype(f32)          # (1, GN)

    w = jnp.minimum(w, np.log(160.0 / (SUB + 2)))
    lw = -jnp.exp(w)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)

    def shift_down(x, s):
        return jnp.concatenate([jnp.zeros((s, x.shape[1]), f32), x[:-s]], 0)

    def shift_up(x, s):
        return jnp.concatenate([x[s:], jnp.zeros((s, x.shape[1]), f32)], 0)

    Bi = lw
    s = 1
    while s < SUB:
        Bi = Bi + jnp.where((rows1 % SUB) >= s, shift_down(Bi, s), 0.0)
        s *= 2
    sfx = lw
    s = 1
    while s < SUB:
        sfx = sfx + jnp.where((rows1 % SUB) < SUB - s, shift_up(sfx, s), 0.0)
        s *= 2
    sfx = sfx - lw
    F = lw
    s = 1
    while s < L:
        F = F + jnp.where(rows1 >= s, shift_down(F, s), 0.0)
        s *= 2
    Be = Bi - lw
    total = Bi + sfx
    pfx = F - Bi

    m = 0.5 * total
    q_mid = (r * jnp.exp(Be - m)).astype(cd)
    k_mid = (k * jnp.exp(m - Bi)).astype(cd)
    q2 = (r * jnp.exp(Be)).astype(cd)
    k_tail = (k * jnp.exp(sfx)).astype(cd)
    qg_ref[0] = (r * jnp.exp(Be + pfx)).astype(qg_ref.dtype)
    ruk = r * u * k
    vc = v.astype(cd)

    rowL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    colL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    intra = (rowL > colL) & ((rowL // SUB) == (colL // SUB))
    on_diag = rowL == colL
    # block-expansion mask (L, NB): keep lane j*N+p when t // SUB == j
    tL = jax.lax.broadcasted_iota(jnp.int32, (L, NB), 0) // SUB
    jL = jax.lax.broadcasted_iota(jnp.int32, (L, NB), 1) // N
    bsel = tL == jL
    # row-block reduce mask (NB, L): keep (j*N+p, t) when t // SUB == j
    rZ = jax.lax.broadcasted_iota(jnp.int32, (NB, L), 0) // N
    tZ = jax.lax.broadcasted_iota(jnp.int32, (NB, L), 1) // SUB
    zsel = rZ == tZ

    # per-sub-block KV^T summaries, one dot per head (rows j*N+p, lanes n)
    kvt_cols = []
    for g in range(G):
        sl = slice(g * N, (g + 1) * N)
        v_exp = jnp.where(
            bsel, jnp.concatenate([vc[:, sl]] * nb, axis=1), 0.0
        ).astype(cd)                                     # (L, NB)
        kvt_cols.append(jax.lax.dot_general(
            v_exp, k_tail[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=f32))                 # (NB, N)
    b = jnp.concatenate(kvt_cols, axis=1)                # (NB, GN)

    # Hillis-Steele over sub-blocks; decay = sublane-broadcast block totals
    tot_blk = total.reshape(nb, SUB, GN)[:, SUB - 1]     # (nb, GN)
    a = jnp.exp(jnp.broadcast_to(
        tot_blk[:, None, :], (nb, N, GN)).reshape(NB, GN))
    off = 1
    while off < nb:
        sh = off * N
        a_prev = jnp.concatenate(
            [jnp.ones((sh, GN), f32), a[: NB - sh]], axis=0)
        b_prev = jnp.concatenate(
            [jnp.zeros((sh, GN), f32), b[: NB - sh]], axis=0)
        b = a * b_prev + b
        a = a * a_prev
        off *= 2
    s_beforeT = jnp.concatenate(
        [jnp.zeros((N, GN), f32), b[: NB - N]], axis=0).astype(cd)
    kvt_ref[0] = b[NB - N:]                              # (N, GN)

    y_rows = []
    for g in range(G):
        sl = slice(g * N, (g + 1) * N)
        A = jax.lax.dot_general(
            q_mid[:, sl], k_mid[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                  # (L, L)
        diag = jnp.sum(ruk[:, sl], axis=-1, keepdims=True)
        A = jnp.where(intra, A, jnp.where(on_diag, diag, 0.0)).astype(cd)
        # y_intra^T: out[p, t] = sum_s v[s, p] * A[t, s]
        yT = jax.lax.dot_general(
            vc[:, sl], A, (((0,), (1,)), ((), ())),
            preferred_element_type=f32)                  # (N, L)
        # cross-sub-block apply: Z[j*N+p, t] = sum_n S^T[j*N+p, n] q2[t, n]
        Z = jax.lax.dot_general(
            s_beforeT[:, sl], q2[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                  # (NB, L)
        yT = yT + jnp.sum(
            jnp.where(zsel, Z, 0.0).reshape(nb, N, L), axis=0)
        y_rows.append(yT)
    yt_ref[0] = jnp.concatenate(y_rows, axis=0).astype(yt_ref.dtype)


def _pick_group(H: int) -> int:
    for g in (8, 4, 2):
        if H % g == 0:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def _wkv6_pallas_chunks_v6(r, k, v, w, u, chunk_size: int = 256):
    """v6 pass 1 wrapper: same return contract as `_wkv6_pallas_chunks`
    (y_loc f32, qg, kv in standard key-row orientation, tot), with the
    lane-packed kernel and XLA-side pack/unpack layout moves."""
    B, T, H, N = r.shape
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
    G = _pick_group(H)
    P = B * (H // G)
    GN = G * N

    def pack(x):  # (B, Tp, H, N) -> (P, Tp, G*N), lane = g*N + n
        return x.reshape(B, Tp, H // G, G, N).transpose(
            0, 2, 1, 3, 4).reshape(P, Tp, GN)

    rb, kb, vb, wb = map(pack, (r, k, v, w))
    ub = jnp.broadcast_to(
        u.reshape(1, H // G, 1, GN), (B, H // G, 1, GN)).reshape(P, 1, GN)

    cdtype = r.dtype if r.dtype == jnp.bfloat16 else jnp.float32
    spec = pl.BlockSpec((1, L, GN), lambda p, c: (p, c, 0))
    yt, qg, kvt = pl.pallas_call(
        functools.partial(_kernel_v6, L=L, N=N, G=G),
        out_shape=(
            jax.ShapeDtypeStruct((P, C * GN, L), jnp.float32),
            jax.ShapeDtypeStruct((P, Tp, GN), cdtype),
            jax.ShapeDtypeStruct((P, C * N, GN), jnp.float32),
        ),
        grid=(P, C),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((1, 1, GN), lambda p, c: (p, 0, 0))],
        out_specs=(
            pl.BlockSpec((1, GN, L), lambda p, c: (p, c, 0)),
            spec,
            pl.BlockSpec((1, N, GN), lambda p, c: (p, c, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(rb, kb, vb, wb, ub)

    # unpack (transposes fuse with surrounding XLA layout moves)
    y_loc = yt.reshape(B, H // G, C, G, N, L).transpose(
        0, 1, 3, 2, 5, 4).reshape(BH, C, L, N)
    qg = qg.reshape(B, H // G, C, L, G, N).transpose(
        0, 1, 4, 2, 3, 5).reshape(BH, C, L, N)
    # kvt per chunk is (N_val, G, N_key) -> standard (N_key, N_val)
    kv = kvt.reshape(B, H // G, C, N, G, N).transpose(
        0, 1, 4, 2, 5, 3).reshape(BH, C, N, N)
    w_cl = jnp.minimum(w.astype(jnp.float32), np.log(160.0 / (SUB + 2)))
    tot = -jnp.exp(w_cl).reshape(B, C, L, H, N).sum(axis=2)
    tot = tot.transpose(0, 2, 1, 3).reshape(BH, C, N)
    return y_loc, qg, kv, tot


def _kernel_v7(r_ref, k_ref, v_ref, w_ref, u_ref, s0_ref,
               y_ref, sout_ref, state_scr, *, L: int, N: int, G: int,
               C: int):
    """v7 (single-pass): carried-state chunk recurrence, minimal I/O.

    A null-kernel ablation on the v5e showed the two-pass kernels are
    I/O-bound, not compute-bound: this chip sustains ~130 GB/s effective
    HBM bandwidth (plain XLA `x+1` measures the same), and v5/v6 move
    ~2.5x the minimum data (f32 y_loc + qg + per-chunk KV summaries out,
    then pass 2 re-reads them and re-writes y, plus pack/unpack
    transposes).  v7 removes ALL of that: one kernel pass with the chunk
    state carried in a VMEM scratch across sequential grid steps (the
    c axis), emitting only y in the input dtype.  Inputs stay lane-packed
    ((P, Tp, G*N), v6 layout) — when G == H the pack/unpack is a pure
    reshape, so there are no XLA-side transposes at all.  I/O per call
    drops from ~240 MB to ~100 MB.

    Compute per head-chunk is v5's proven math (`_v5_head`): masked
    recentred (L, L) intra dot, shift-add cumsums (shared packed across
    heads), sub-block KV dots + Hillis-Steele combine, plus two carried
    -state ops: y += qg @ S (rhs from scratch) and
    S = exp(chunk_total).T * S + chunk_KV (the v4-proven column-vector
    transpose).  Carried state in/out are first-class: s0 enters the
    scratch at c == 0, the final state is written once at c == C-1.
    """
    c = pl.program_id(1)
    f32 = jnp.float32
    cd = jnp.bfloat16 if y_ref.dtype == jnp.bfloat16 else jnp.float32
    GN = G * N
    nb = L // SUB
    NB = nb * N

    @pl.when(c == 0)
    def _():
        state_scr[...] = s0_ref[0]

    r = r_ref[0].astype(f32)          # (L, GN)
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)
    w = w_ref[0].astype(f32)
    u = u_ref[0].astype(f32)          # (1, GN)

    w = jnp.minimum(w, np.log(160.0 / (SUB + 2)))
    lw = -jnp.exp(w)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)

    def shift_down(x, s):
        return jnp.concatenate([jnp.zeros((s, x.shape[1]), f32), x[:-s]], 0)

    def shift_up(x, s):
        return jnp.concatenate([x[s:], jnp.zeros((s, x.shape[1]), f32)], 0)

    Bi = lw
    s = 1
    while s < SUB:
        Bi = Bi + jnp.where((rows1 % SUB) >= s, shift_down(Bi, s), 0.0)
        s *= 2
    sfx = lw
    s = 1
    while s < SUB:
        sfx = sfx + jnp.where((rows1 % SUB) < SUB - s, shift_up(sfx, s), 0.0)
        s *= 2
    sfx = sfx - lw
    F = lw
    s = 1
    while s < L:
        F = F + jnp.where(rows1 >= s, shift_down(F, s), 0.0)
        s *= 2
    Be = Bi - lw
    total = Bi + sfx
    pfx = F - Bi

    m = 0.5 * total
    q_mid = (r * jnp.exp(Be - m)).astype(cd)
    k_mid = (k * jnp.exp(m - Bi)).astype(cd)
    q2 = r * jnp.exp(Be)
    k_tail = (k * jnp.exp(sfx)).astype(cd)
    qg = (r * jnp.exp(Be + pfx)).astype(cd)      # decay from chunk start
    tot_chunk = F[L - 1 : L]                     # (1, GN) chunk log-decay
    ruk = r * u * k
    vc = v.astype(cd)

    rowL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    colL = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    intra = (rowL > colL) & ((rowL // SUB) == (colL // SUB))
    ridx = jax.lax.broadcasted_iota(jnp.int32, (NB, N), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NB, N), 1)
    adiag_sel = lane == ridx % N

    y_cols = []
    for g in range(G):
        sl = slice(g * N, (g + 1) * N)
        # intra sub-block (v5 math)
        A = jax.lax.dot_general(
            q_mid[:, sl], k_mid[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        A = jnp.where(intra, A, 0.0).astype(cd)
        diag = jnp.sum(ruk[:, sl], axis=-1, keepdims=True)
        v_g = vc[:, sl]
        y = jnp.dot(A, v_g, preferred_element_type=f32) \
            + diag * v[:, sl]
        # per-sub-block KV summaries + scan (v5 math)
        kt_b = k_tail[:, sl].reshape(nb, SUB, N)
        v_b = v_g.reshape(nb, SUB, N)
        KVs = jax.lax.dot_general(
            kt_b, v_b, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).reshape(NB, N)
        tot_blk = total[:, sl].reshape(nb, SUB, N)[:, SUB - 1]
        tot_stk = jnp.broadcast_to(
            tot_blk[:, None, :], (nb, N, N)).reshape(NB, N)
        a = jnp.sum(jnp.where(adiag_sel, jnp.exp(tot_stk), 0.0),
                    axis=1, keepdims=True)
        b = KVs
        off = 1
        while off < nb:
            sh = off * N
            a_prev = jnp.concatenate(
                [jnp.ones((sh, 1), f32), a[: NB - sh]], axis=0)
            b_prev = jnp.concatenate(
                [jnp.zeros((sh, N), f32), b[: NB - sh]], axis=0)
            b = a * b_prev + b
            a = a * a_prev
            off *= 2
        s_before = jnp.concatenate(
            [jnp.zeros((N, N), f32), b[: NB - N]], axis=0)
        q_b = (q2[:, sl].astype(cd)).reshape(nb, SUB, N)
        s_b = s_before.astype(cd).reshape(nb, N, N)
        y = y + jax.lax.dot_general(
            q_b, s_b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).reshape(L, N)
        # cross-chunk: carried state from scratch (natural orientation)
        S_g = state_scr[g * N : (g + 1) * N, :]          # (N_key, N_val)
        y = y + jax.lax.dot_general(
            qg[:, sl], S_g.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        # state update: per-KEY-row decay (column-vector transpose, v4)
        e_col = jnp.exp(tot_chunk[:, sl]).T              # (N, 1)
        state_scr[g * N : (g + 1) * N, :] = e_col * S_g + b[NB - N:]
        y_cols.append(y)
    y_ref[0] = jnp.concatenate(y_cols, axis=1).astype(y_ref.dtype)

    @pl.when(c == C - 1)
    def _():
        sout_ref[0] = state_scr[...]


@functools.partial(
    jax.jit, static_argnames=("chunk_size", "return_state"))
def _wkv6_pallas_v7(r, k, v, w, u, state=None, chunk_size: int = 256,
                    return_state: bool = False):
    """v7 single-pass wrapper (see `_kernel_v7`)."""
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
    G = _pick_group(H)
    P = B * (H // G)
    GN = G * N

    def pack(x):  # free reshape when G == H (size-1 transpose axis)
        return x.reshape(B, Tp, H // G, G, N).transpose(
            0, 2, 1, 3, 4).reshape(P, Tp, GN)

    rb, kb, vb, wb = map(pack, (r, k, v, w))
    ub = jnp.broadcast_to(
        u.reshape(1, H // G, 1, GN), (B, H // G, 1, GN)).reshape(P, 1, GN)
    if state is None:
        s0 = jnp.zeros((P, GN, N), jnp.float32)
    else:
        s0 = state.astype(jnp.float32).reshape(P, GN, N)

    spec = pl.BlockSpec((1, L, GN), lambda p, c: (p, c, 0))
    y, sout = pl.pallas_call(
        functools.partial(_kernel_v7, L=L, N=N, G=G, C=C),
        out_shape=(
            jax.ShapeDtypeStruct((P, Tp, GN), out_dtype),
            jax.ShapeDtypeStruct((P, GN, N), jnp.float32),
        ),
        grid=(P, C),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((1, 1, GN), lambda p, c: (p, 0, 0)),
                  pl.BlockSpec((1, GN, N), lambda p, c: (p, 0, 0))],
        out_specs=(
            spec,
            pl.BlockSpec((1, GN, N), lambda p, c: (p, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((GN, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(rb, kb, vb, wb, ub, s0)

    y = y.reshape(B, H // G, Tp, G, N).transpose(
        0, 2, 1, 3, 4).reshape(B, Tp, H, N)[:, :T].astype(out_dtype)
    if return_state:
        return y, sout.reshape(B, H, N, N)
    return y


def _kernel_v5(r_ref, k_ref, v_ref, w_ref, u_ref,
               y_ref, qg_ref, kv_ref, *, L: int, N: int, G: int):
    """v5 (two-pass, pass 1): per-chunk kernel with NO serial state chain.

    Grid steps are independent (no carried scratch); each processes G heads
    of one chunk in an unrolled loop (grid-step fixed overhead ~10us on the
    v5e, measured by ablation, so amortize it; the loop rather than a
    (G*L, N) vectorized body keeps the VMEM live set to ~one head).
    Per head-chunk (see _v5_head): one masked (L, L) intra matmul,
    log-depth VPU shift-add cumsums for every decay prefix/suffix, nb
    stacked (N, N) sub-block KV summaries combined by a Hillis-Steele scan
    and applied with independent batched dots.  The chunk is summarized
    for pass 2 (an XLA `associative_scan` over chunks) by its (N, N) KV;
    the chunk log-decay total is recomputed in XLA from w (Mosaic crashes
    on multi-G 4D output blocks).  This removes the serial per-sub-block
    state dots that dominated v2/v4 (NOTES.md perf profile).
    """
    cd = jnp.bfloat16 if qg_ref.dtype == jnp.bfloat16 else jnp.float32
    f32 = jnp.float32
    for g in range(G):
        y, qg, kv = _v5_head(
            r_ref[g].astype(f32), k_ref[g].astype(f32),
            v_ref[g].astype(f32), w_ref[g].astype(f32),
            u_ref[g].astype(f32), L=L, N=N, cd=cd,
        )
        y_ref[g] = y.astype(y_ref.dtype)
        qg_ref[g] = qg.astype(qg_ref.dtype)
        kv_ref[g] = kv


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def _wkv6_pallas_chunks(r, k, v, w, u, chunk_size: int = 256):
    """Pass 1 of the two-pass path: returns per-chunk local outputs +
    summaries.  Shapes: y_loc f32 (BH, C, L, N), qg bf16-of-input
    (BH, C, L, N), kv f32 (BH, C, N, N), tot f32 (BH, C, N)."""
    B, T, H, N = r.shape
    L = int(chunk_size)
    L = max(SUB, (L // SUB) * SUB)
    pad = (-T) % L
    if pad:
        zpad = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        r, k, v = zpad(r), zpad(k), zpad(v)
        # pad decay logit with -inf => decay 1: the carried state is not
        # decayed by pad steps and pad keys are zero
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0), (0, 0)),
                    constant_values=-1e30)
    Tp = T + pad
    C = Tp // L
    BH = B * H

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(BH, Tp, N)

    rb, kb, vb, wb = map(to_bh, (r, k, v, w))
    ub = jnp.broadcast_to(u[None], (B, H, N)).reshape(BH, 1, N)

    cdtype = r.dtype if r.dtype == jnp.bfloat16 else jnp.float32
    G = 1
    for g in (8, 4, 2):
        if BH % g == 0:
            G = g
            break
    spec = pl.BlockSpec((G, L, N), lambda p, c: (p, c, 0))
    y_loc, qg, kv = pl.pallas_call(
        functools.partial(_kernel_v5, L=L, N=N, G=G),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Tp, N), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, N), cdtype),
            jax.ShapeDtypeStruct((BH, C * N, N), jnp.float32),
        ),
        grid=(BH // G, C),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((G, 1, N), lambda p, c: (p, 0, 0))],
        out_specs=(
            spec, spec,
            # kv laid out (BH, C*N, N); per-step block = G heads' (N, N)
            pl.BlockSpec((G, N, N), lambda p, c: (p, c, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(rb, kb, vb, wb, ub)
    kv = kv.reshape(BH, C, N, N)
    # chunk log-decay total, recomputed in XLA (one fused reduce over w)
    w_cl = jnp.minimum(wb.astype(jnp.float32), np.log(160.0 / (SUB + 2)))
    tot = -jnp.sum(jnp.exp(w_cl).reshape(BH, C, L, N), axis=2)
    shp = lambda x: x.reshape(BH, C, L, N)
    return shp(y_loc), shp(qg), kv, tot.reshape(BH, C, N)


@functools.partial(
    jax.jit, static_argnames=("chunk_size", "return_state", "version"))
def _wkv6_pallas_two_pass(r, k, v, w, u, state=None, chunk_size: int = 256,
                          return_state: bool = False, version: int = 6):
    """Two-pass WKV6: parallel per-chunk Pallas kernel + log-depth XLA
    cross-chunk combine + one batched MXU matmul.  Supports carried-in
    state and cheap final-state output (both just enter the chunk scan).
    """
    B, T, H, N = r.shape
    out_dtype = r.dtype
    BH = B * H
    chunks_fn = (_wkv6_pallas_chunks_v6 if version >= 6
                 else _wkv6_pallas_chunks)
    y_loc, qg, kv, tot = chunks_fn(r, k, v, w, u, chunk_size=chunk_size)
    C = kv.shape[1]
    a = jnp.exp(tot)                                    # (BH, C, N) <= 1

    def comb(ea, eb):
        aA, bA = ea
        aB, bB = eb
        return aA * aB, aB[..., None] * bA + bB

    A_in, B_in = jax.lax.associative_scan(comb, (a, kv), axis=1)
    if state is None:
        S0 = jnp.zeros((BH, N, N), jnp.float32)
    else:
        S0 = state.astype(jnp.float32).reshape(BH, N, N)
    # state BEFORE chunk c = A_incl[c-1] (row-wise) * S0 + B_incl[c-1]
    s_before = jnp.concatenate(
        [S0[:, None],
         A_in[:, :-1, :, None] * S0[:, None] + B_in[:, :-1]], axis=1)
    cd = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    y_cross = jnp.einsum(
        "bcln,bcnp->bclp", qg.astype(cd), s_before.astype(cd),
        preferred_element_type=jnp.float32,
    )
    y = (y_loc + y_cross).reshape(BH, -1, N)[:, :T]
    y = y.reshape(B, H, T, N).transpose(0, 2, 1, 3).astype(out_dtype)
    if return_state:
        S_fin = A_in[:, -1, :, None] * S0 + B_in[:, -1]
        return y, S_fin.reshape(B, H, N, N)
    return y


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


def _fwd_dispatch(r, k, v, w, u, state, chunk_size, return_state, version):
    if version >= 7:
        return _wkv6_pallas_v7(r, k, v, w, u, state=state,
                               chunk_size=chunk_size,
                               return_state=return_state)
    return _wkv6_pallas_two_pass(r, k, v, w, u, state=state,
                                 chunk_size=chunk_size,
                                 return_state=return_state,
                                 version=version)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _wkv6_pallas_diff(r, k, v, w, u, state, chunk_size, return_state,
                      version=6):
    return _fwd_dispatch(r, k, v, w, u, state, chunk_size, return_state,
                         version)


def _diff_fwd(r, k, v, w, u, state, chunk_size, return_state, version=6):
    out = _fwd_dispatch(r, k, v, w, u, state, chunk_size, return_state,
                        version)
    return out, (r, k, v, w, u, state)


def _diff_bwd(chunk_size, return_state, version, res, g):
    from paper_accurate_fast_cheap_tpu.ops.wkv6 import wkv6_backward

    r, k, v, w, u, state = res
    yb, gbar = g if return_state else (g, None)
    return wkv6_backward(r, k, v, w, u, state, yb, gbar,
                         chunk_size=chunk_size)


_wkv6_pallas_diff.defvjp(_diff_fwd, _diff_bwd)


def wkv6_pallas(r, k, v, w, u, state=None, chunk_size: int = 256,
                return_state: bool = False, version: int = 5):
    """Pallas forward (+ XLA-recompute backward).  Same semantics as
    `ops.wkv6.wkv6_ref`.

    version=6: two-pass formulation with the lane-packed, issue-minimal
    per-chunk kernel (`_kernel_v6`); version=5 (default) is the round-2
    per-head two-pass kernel.  Both support carried state and cheap
    final-state output.  Versions 1-4 are the round-1 single-pass kernels
    kept for benchmarking (no state carry).
    """
    if version >= 5:
        return _wkv6_pallas_diff(r, k, v, w, u, state, chunk_size,
                                 return_state, version)
    if state is not None:
        from paper_accurate_fast_cheap_tpu.ops.wkv6 import wkv6_chunked

        return wkv6_chunked(r, k, v, w, u, state=state,
                            chunk_size=chunk_size,
                            return_state=return_state)
    if return_state:
        return _wkv6_pallas_fwd(r, k, v, w, u, chunk_size=chunk_size,
                                return_state=True, version=version)
    return _wkv6_pallas_fwd(r, k, v, w, u, chunk_size=chunk_size,
                            version=version)
