"""RWKV-6 "WKV" linear-recurrence op, TPU-native.

The reference implements this recurrence as a CUDA kernel
(`wenet/rwkv_v6/cuda/wkv6_cuda.cu:25-62`): per (batch, head) with head size N,
state ``S in R^{N x N}`` (rows = key channel j, cols = value channel i):

    y_t[i] = sum_j r_t[j] * (u[j] * k_t[j] * v_t[i] + S_{t-1}[j, i])
    S_t[j, i] = decay_t[j] * S_{t-1}[j, i] + k_t[j] * v_t[i]

with ``decay_t = exp(-exp(w_t))`` where ``w_t`` is the raw per-channel decay
logit (data-dependent in RWKV-6), and ``u`` a per-channel "bonus" applied to
the current token only.  A variant carrying an initial state exists for
streaming (`wkv6state_cuda.cu:8-25`) — here that is just the ``state``
argument (scan carry).

TPU-first design (NOT a port of the CUDA thread layout):

* ``wkv6_ref``     — direct ``lax.scan`` over time: semantic oracle and the
  exact streaming/decode path (O(T) memory).
* ``wkv6_chunked`` — two-level block-parallel formulation:

  - inner blocks of S=16 steps: the strict-lower-triangular intra-block
    attention uses midpoint-recentred factor matmuls (exact in fp32 because
    the exponent budget is (S/2+1) * rate);
  - each inner block is summarized by a "block state" KV_j = sum_s
    (k_s * decay-to-block-end) v_s^T; contributions between blocks inside an
    outer chunk flow through the per-channel block-transfer factors
    D[i, j] = exp(-(decay of blocks j+1..i-1)) — every factor involved is
    <= 1, so the hierarchy is unconditionally overflow-free (no clamping,
    unlike a single-level factorization at large L);
  - an ``lax.scan`` carries the (N, N) state across outer chunks (default
    256 steps -> 16x fewer sequential scan steps than single-level L=16).

  All contractions are MXU-shaped, accumulation is fp32 regardless of input
  dtype (mirrors the CUDA kernel's float accumulators), and the whole thing
  differentiates through XLA autodiff (the reference needs 4 hand-written
  backward scan kernels, `wkv6_cuda.cu:66-263`).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _as_f32(*xs):
    return tuple(x.astype(jnp.float32) for x in xs)


def wkv6_ref(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: jax.Array,
    state: Optional[jax.Array] = None,
    return_state: bool = False,
):
    """Naive sequential WKV6 (semantic oracle / streaming path).

    Args:
      r, k, v, w: (B, T, H, N). ``w`` is the raw decay logit; the effective
        per-step decay is ``exp(-exp(w))``.
      u: (H, N) bonus.
      state: optional initial state (B, H, N, N); zeros if None.
      return_state: also return the final state.

    Returns:
      y: (B, T, H, N) in the dtype of ``r`` (fp32 accumulation inside), and
      optionally the final state (B, H, N, N) fp32.
    """
    B, T, H, N = r.shape
    out_dtype = r.dtype
    rf, kf, vf, wf, uf = _as_f32(r, k, v, w, u)
    decay = jnp.exp(-jnp.exp(wf))  # (B, T, H, N)
    if state is None:
        state = jnp.zeros((B, H, N, N), jnp.float32)
    else:
        state = state.astype(jnp.float32)

    def step(S, inp):
        r_t, k_t, v_t, d_t = inp  # each (B, H, N)
        ruk = jnp.sum(r_t * uf[None] * k_t, axis=-1, keepdims=True)  # (B,H,1)
        y = ruk * v_t + jnp.einsum("bhj,bhji->bhi", r_t, S)
        S = d_t[..., None] * S + k_t[..., None] * v_t[..., None, :]
        return S, y

    inps = tuple(
        jnp.moveaxis(x, 1, 0) for x in (rf, kf, vf, decay)
    )  # (T, B, H, N)
    final_state, ys = jax.lax.scan(step, state, inps)
    y = jnp.moveaxis(ys, 0, 1).astype(out_dtype)
    if return_state:
        return y, final_state
    return y


@functools.partial(jax.jit, static_argnames=("chunk_size", "inner_size",
                                             "return_state"))
def wkv6_chunked(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: jax.Array,
    state: Optional[jax.Array] = None,
    chunk_size: int = 256,
    inner_size: int = 16,
    return_state: bool = False,
):
    """Two-level chunked WKV6 — the TPU training/inference path.

    Same signature/semantics as :func:`wkv6_ref`.  T is internally padded to
    a multiple of ``chunk_size`` (must be a multiple of ``inner_size``).
    """
    B, T, H, N = r.shape
    out_dtype = r.dtype
    L = int(chunk_size)
    S_ = min(int(inner_size), L)
    if L % S_:
        raise ValueError(f"chunk_size {L} not a multiple of inner {S_}")
    nb = L // S_
    pad = (-T) % L
    rf, kf, vf, wf, uf = _as_f32(r, k, v, w, u)
    if pad:
        zpad = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        # zero keys contribute nothing to the state; padded w = -inf gives
        # decay exp(-exp(-inf)) = 1 so the returned state is NOT decayed by
        # pad steps; padded outputs are sliced off.
        rf, kf, vf = zpad(rf), zpad(kf), zpad(vf)
        wf = jnp.pad(wf, ((0, 0), (0, pad), (0, 0), (0, 0)),
                     constant_values=-jnp.inf)
    Tp = T + pad
    C = Tp // L

    # guard only against exp() overflow INSIDE an inner block's midpoint
    # factorization: rate <= 160/(S+2); at S=16 the cap is a per-step decay
    # floor of exp(-8.9) ~ 1.4e-4 — semantically a no-op.
    w_clamp = float(np.log(160.0 / (S_ + 2)))
    wf = jnp.minimum(wf, w_clamp)

    shp = (B, C, nb, S_, H, N)
    perm = (0, 4, 1, 2, 3, 5)  # -> (B, H, C, nb, S, N)
    rc = rf.reshape(shp).transpose(perm)
    kc = kf.reshape(shp).transpose(perm)
    vc = vf.reshape(shp).transpose(perm)
    wc = wf.reshape(shp).transpose(perm)

    lw = -jnp.exp(wc)                       # (B,H,C,nb,S,N), log decay <= 0
    Bi = jnp.cumsum(lw, axis=-2)            # inclusive, within inner block
    Be = Bi - lw                            # exclusive
    total = Bi[..., -1, :]                  # (B,H,C,nb,N) block log-decay
    pfx_incl = jnp.cumsum(total, axis=-2)   # over blocks within outer chunk
    pfx_excl = pfx_incl - total

    # compute dtype for the bulky factor tensors: bf16 I/O like the CUDA
    # kernel (fp32 accumulation happens inside the MXU / in the masked A)
    cd = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    f32 = jnp.float32
    vc_c = vc.astype(cd)

    # ---- intra (within inner block), midpoint-recentred, exact
    m = Bi[..., S_ // 2 : S_ // 2 + 1, :]
    q_mid = (rc * jnp.exp(Be - m)).astype(cd)
    k_mid = (kc * jnp.exp(m - Bi)).astype(cd)
    A = jnp.einsum("...tn,...sn->...ts", q_mid, k_mid,
                   preferred_element_type=f32)
    tri = jnp.tril(jnp.ones((S_, S_), bool), k=-1)
    A = jnp.where(tri, A, 0.0)
    diag = jnp.sum(rc * uf[None, :, None, None, None, :] * kc, axis=-1)
    y_intra = jnp.einsum("...ts,...sn->...tn", A, vc_c,
                         preferred_element_type=f32) \
        + diag[..., None] * vc

    # ---- between inner blocks (same outer chunk): block states + transfer
    q2 = rc * jnp.exp(Be)                               # decay from block
    k2 = kc * jnp.exp(total[..., None, :] - Bi)         # decay to block end
    KV = jnp.einsum("...sn,...sp->...np", k2.astype(cd), vc_c,
                    preferred_element_type=f32)         # (B,H,C,nb,N,N)
    # D[i, j] = exp(sum of block totals j+1..i-1) for j < i
    D = jnp.exp(
        jnp.clip(
            pfx_excl[..., :, None, :] - pfx_incl[..., None, :, :],
            None, 0.0,
        )
    )
    blk_tri = jnp.tril(jnp.ones((nb, nb), bool), k=-1)
    D = jnp.where(blk_tri[..., None], D, 0.0)
    M = jnp.einsum("...ijn,...jnp->...inp", D, KV,
                   preferred_element_type=f32)          # (B,H,C,nb,N,N)
    y_between = jnp.einsum("...isn,...inp->...isp", q2.astype(cd), M,
                           preferred_element_type=f32)

    # ---- across outer chunks: lax.scan with (N, N) carry
    q_glob = q2 * jnp.exp(pfx_excl)[..., None, :]       # (B,H,C,nb,S,N)
    outer_total = pfx_incl[..., -1, :]                  # (B,H,C,N)
    k_tail = k2 * jnp.exp(
        outer_total[..., None, None, :] - pfx_incl[..., None, :]
    )
    flat = lambda x, d: x.astype(d).reshape(B, H, C, L, N)
    q_glob_f, k_tail_f, v_f = (flat(q_glob, cd), flat(k_tail, cd),
                               flat(vc, cd))

    if state is None:
        S0 = jnp.zeros((B, H, N, N), jnp.float32)
    else:
        S0 = state.astype(jnp.float32)

    def chunk_step(Sc, inp):
        q_c, k_c, v_c, ot = inp
        y_cross = jnp.einsum("bhtj,bhji->bhti", q_c, Sc.astype(cd),
                             preferred_element_type=f32)
        S_new = jnp.exp(ot)[..., None] * Sc + jnp.einsum(
            "bhsj,bhsi->bhji", k_c, v_c, preferred_element_type=f32
        )
        return S_new, y_cross

    scan_inps = (
        jnp.moveaxis(q_glob_f, 2, 0), jnp.moveaxis(k_tail_f, 2, 0),
        jnp.moveaxis(v_f, 2, 0), jnp.moveaxis(outer_total, 2, 0),
    )
    S_fin, y_cross = jax.lax.scan(chunk_step, S0, scan_inps)
    y_cross = jnp.moveaxis(y_cross, 0, 2).reshape(B, H, C, nb, S_, N)

    y = (y_intra + y_between + y_cross).transpose(0, 2, 3, 4, 1, 5)
    y = y.reshape(B, Tp, H, N)[:, :T].astype(out_dtype)
    if return_state:
        return y, S_fin
    return y


def wkv6(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: jax.Array,
    state: Optional[jax.Array] = None,
    chunk_size: int = 256,
    return_state: bool = False,
    impl: str = "chunked",
    pallas_version: Optional[int] = None,
):
    """Dispatching entry point. impl: 'chunked' (default) | 'ref' | 'pallas'.
    pallas_version overrides the pallas kernel generation (None = its
    default)."""
    if impl == "ref":
        return wkv6_ref(r, k, v, w, u, state=state, return_state=return_state)
    if impl == "pallas":
        from paper_accurate_fast_cheap_tpu.ops import wkv6_pallas

        kw = {} if pallas_version is None else dict(version=pallas_version)
        return wkv6_pallas.wkv6_pallas(
            r, k, v, w, u, state=state, chunk_size=chunk_size,
            return_state=return_state, **kw,
        )
    if impl != "chunked":
        raise ValueError(f"unknown wkv6 impl: {impl!r}")
    return wkv6_chunked(
        r, k, v, w, u, state=state, chunk_size=chunk_size,
        return_state=return_state,
    )
