"""Sequence parallelism for the WKV6 linear recurrence.

The reference's answer to sequence length is single-GPU architectural
O(T) (SURVEY.md §5: "no ring attention, no Ulysses, no context/sequence
parallelism — a single GPU holds the whole sequence").  On TPU the same
recurrence shards cleanly over the ICI mesh: the WKV state recurrence

    S_t = diag(d_t) S_{t-1} + k_t v_t^T        (d_t = per-channel decay)

is associative in (decay-product, state) pairs, so a T-shard of the
sequence is summarized by the pair

    A_i = prod of its per-step decays   (B, H, N)
    B_i = its final state from a zero init  (B, H, N, N)

and the true incoming state of shard i is the exclusive associative fold
of the pairs of shards j < i — exactly the cross-chunk combine the
single-chip two-pass kernel uses (`ops/wkv6_pallas.py` pass 2), lifted to
the mesh level.  Only the (N, N) summaries cross the interconnect
(an all-gather of n_shards * B * H * N * (N+1) floats — kilobytes), never
the sequence itself.

Algorithm (inside one `shard_map` over the sequence axis):
  1. local pass: y0, B_i = wkv6(shard, state=0, return_state=True);
     A_i = exp(sum of clamped log-decays) computed directly from w.
  2. `all_gather` the (A, B) pairs; every device folds the same exclusive
     prefix (n_shards is small and static) and takes its own entry S0_i.
  3. replay pass: y_i = wkv6(shard, state=S0_i) — the local recurrence
     re-run from the correct incoming state.  (2x local compute; with
     n devices the wall-clock is still ~n/2 of the single-chip run, and
     memory per device is T/n.)

Exactness: the fold uses the same clamp as the chunked kernel
(`160/(inner+2)`, `ops/wkv6.py:142`), so the sharded output equals the
single-device `wkv6_chunked` bit-for-bit up to f32 summation order.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paper_accurate_fast_cheap_tpu.ops import wkv6 as wkv6_ops


def _shard_summary_decay(w: jax.Array, inner_size: int) -> jax.Array:
    """Per-shard total decay A_i (B, H, N) with the chunked clamp."""
    w_cl = jnp.minimum(w.astype(jnp.float32),
                       float(np.log(160.0 / (inner_size + 2))))
    return jnp.exp(-jnp.sum(jnp.exp(w_cl), axis=1))  # (B, H, N)


def wkv6_sequence_parallel(
    r: jax.Array,
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,
    u: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
    state: Optional[jax.Array] = None,
    return_state: bool = False,
    chunk_size: int = 256,
    inner_size: int = 16,
):
    """WKV6 with the T axis sharded over ``mesh`` axis ``axis``.

    Inputs are (B, T, H, N) with T divisible by the axis size; they may be
    already device-put with a T-sharded NamedSharding (the shard_map will
    keep them in place) or replicated (XLA reshards once).  ``state`` is a
    replicated (B, H, N, N) carried-in state; ``return_state`` also
    returns the (replicated) final state.
    """
    B, T, H, N = r.shape
    n = mesh.shape[axis]
    if T % n:
        raise ValueError(f"T={T} not divisible by mesh axis {axis}={n}")
    if state is None:
        state = jnp.zeros((B, H, N, N), jnp.float32)

    spec_t = P(None, axis)
    spec_r = P()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec_t, spec_t, spec_t, spec_t, spec_r, spec_r),
        out_specs=(spec_t, spec_r) if return_state else spec_t,
    )
    def _run(rs, ks, vs, ws, us, S0_global):
        return wkv6_sp_body(rs, ks, vs, ws, us, axis, state=S0_global,
                            chunk_size=chunk_size, inner_size=inner_size,
                            return_state=return_state)

    return _run(r, k, v, w, u, state)


def wkv6_sp_body(rs, ks, vs, ws, us, axis: str, state=None,
                 chunk_size: int = 256, inner_size: int = 16,
                 return_state: bool = False):
    """The sequence-parallel WKV6 collective body, for use INSIDE an
    enclosing `shard_map` over ``axis`` (e.g. a T-sharded encoder layer);
    `wkv6_sequence_parallel` is the standalone wrapper.  All arguments
    are this device's T-shard except ``us``/``state`` (replicated)."""
    n = jax.lax.axis_size(axis)
    Bs, _, H, N = rs.shape
    if state is None:
        state = jnp.zeros((Bs, H, N, N), jnp.float32)
    # 1. local summary pass (zero incoming state).  The zero state must
    # be marked varying over the seq axis (the scan carry takes its type
    # from it while the inputs are per-shard).
    zero = jax.lax.pcast(
        jnp.zeros((Bs, H, N, N), jnp.float32), axis, to="varying")
    # summary pass stays on the autodiff variant: its y output is
    # discarded, and XLA autodiff prunes the unused-y backward via
    # symbolic zeros, while the custom-VJP would materialize an all-zeros
    # y cotangent and run the full straight dual pass on it
    _, B_loc = wkv6_ops.wkv6_chunked(
        rs, ks, vs, ws, us, state=zero, chunk_size=chunk_size,
        inner_size=inner_size, return_state=True)
    A_loc = _shard_summary_decay(ws, inner_size)

    # 2. gather pairs, fold the exclusive prefix (static small loop)
    A_all = jax.lax.all_gather(A_loc, axis)          # (n, B, H, N)
    B_all = jax.lax.all_gather(B_loc, axis)          # (n, B, H, N, N)
    idx = jax.lax.axis_index(axis)
    S_in = state.astype(jnp.float32)
    S_mine = S_in                      # covers idx == 0
    for j in range(n):
        # S after shard j = A_j (key-rows) * S_before + B_j
        S_in = A_all[j][..., None] * S_in + B_all[j]
        # the last j < idx to fire leaves S_mine = state after
        # shard idx-1 == state BEFORE shard idx
        S_mine = jnp.where(j < idx, S_in, S_mine)
    # after the loop S_in = state after the last shard (global final)

    # 3. replay from the true incoming state
    out = wkv6_ops.wkv6_chunked_vjp(
        rs, ks, vs, ws, us, state=S_mine, chunk_size=chunk_size,
        inner_size=inner_size, return_state=False)
    if return_state:
        # every device computed the same fold; express the final state
        # through a psum so its replication is provable
        S_fin = jax.lax.psum(jnp.where(idx == n - 1, S_in, 0.0), axis)
        return out, S_fin
    return out


def sequence_sharding(mesh: Mesh, axis: str = "seq") -> NamedSharding:
    """Sharding for (B, T, ...) arrays with T over the sequence axis."""
    return NamedSharding(mesh, P(None, axis))


def halo_exchange(x: jax.Array, axis: str, left: int, right: int,
                  time_axis: int = 1):
    """Exchange boundary frames with sequence-axis neighbours.

    Inside `shard_map` over ``axis``: returns x extended with ``left``
    frames from the previous shard and ``right`` frames from the next
    (zeros at the sequence ends) — the building block for T-sharded
    convolutions (depthwise kernel 31 needs a 15-frame halo each side)
    and token-shift (1-frame left halo).
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    parts = []
    if left:
        tail = jax.lax.slice_in_dim(x, x.shape[time_axis] - left, None,
                                    axis=time_axis)
        prev = jax.lax.ppermute(tail, axis,
                                [(i, (i + 1) % n) for i in range(n)])
        prev = jnp.where(idx == 0, 0.0, prev)
        parts.append(prev)
    parts.append(x)
    if right:
        head = jax.lax.slice_in_dim(x, 0, right, axis=time_axis)
        nxt = jax.lax.ppermute(head, axis,
                               [(i, (i - 1) % n) for i in range(n)])
        nxt = jnp.where(idx == n - 1, 0.0, nxt)
        parts.append(nxt)
    return jnp.concatenate(parts, axis=time_axis)


def flip_sharded(x: jax.Array, axis: str, time_axis: int = 1):
    """Time-reverse a T-sharded array: reverse the shard order with one
    ppermute (i -> n-1-i) and flip locally — the distributed equivalent
    of `jnp.flip(x, time_axis)`, needed by the bidirectional RWKV branch
    under sequence parallelism."""
    n = jax.lax.axis_size(axis)
    rev = jax.lax.ppermute(x, axis, [(i, n - 1 - i) for i in range(n)])
    return jnp.flip(rev, axis=time_axis)


def ssd_sp_body(x, dt, A, B, C, D, axis: str, state=None,
                chunk_size: int = 64, return_state: bool = False):
    """Sequence-parallel Mamba-2 SSD body (inside an enclosing shard_map
    over ``axis``): same shard-summary algebra as `wkv6_sp_body` with the
    simpler per-(batch, head) scalar decay exp(A * sum dt).  Arguments as
    `ops.ssd.ssd` with T sharded; x: (Bt, T, H, P), dt post-softplus."""
    from paper_accurate_fast_cheap_tpu.ops import ssd as ssd_ops

    n = jax.lax.axis_size(axis)
    Bt, _, H, P = x.shape
    N = B.shape[3]
    if state is None:
        state = jnp.zeros((Bt, H, N, P), jnp.float32)
    zero = jax.lax.pcast(
        jnp.zeros((Bt, H, N, P), jnp.float32), axis, to="varying")
    # autodiff variant on purpose: y discarded, see the wkv6 note above
    _, S_loc = ssd_ops.ssd_chunked(
        x, dt, A, B, C, None, state=zero, chunk_size=chunk_size,
        return_state=True)
    a_loc = jnp.exp(
        A.astype(jnp.float32)[None] *
        jnp.sum(dt.astype(jnp.float32), axis=1))          # (Bt, H)

    a_all = jax.lax.all_gather(a_loc, axis)               # (n, Bt, H)
    S_all = jax.lax.all_gather(S_loc, axis)               # (n, Bt, H, N, P)
    idx = jax.lax.axis_index(axis)
    S_in = state.astype(jnp.float32)
    S_mine = S_in
    for j in range(n):
        S_in = a_all[j][..., None, None] * S_in + S_all[j]
        S_mine = jnp.where(j < idx, S_in, S_mine)

    out = ssd_ops.ssd_chunked_vjp(
        x, dt, A, B, C, D, state=S_mine, chunk_size=chunk_size,
        return_state=False)
    if return_state:
        S_fin = jax.lax.psum(jnp.where(idx == n - 1, S_in, 0.0), axis)
        return out, S_fin
    return out


def ssd_sequence_parallel(x, dt, A, B, C, D, mesh: Mesh,
                          axis: str = "seq", state=None,
                          chunk_size: int = 64,
                          return_state: bool = False):
    """Standalone wrapper around `ssd_sp_body` (T sharded over ``axis``)."""
    T = x.shape[1]
    n = mesh.shape[axis]
    if T % n:
        raise ValueError(f"T={T} not divisible by mesh axis {axis}={n}")
    spec_t = P(None, axis)
    spec_r = P()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec_t, spec_t, spec_r, spec_t, spec_t, spec_r, spec_r),
        out_specs=(spec_t, spec_r) if return_state else spec_t,
    )
    def _run(xs, dts, As, Bs, Cs, Ds, S0):
        return ssd_sp_body(xs, dts, As, Bs, Cs, Ds, axis, state=S0,
                           chunk_size=chunk_size,
                           return_state=return_state)

    Bt, _, H, Pd = x.shape
    N = B.shape[3]
    S0 = (jnp.zeros((Bt, H, N, Pd), jnp.float32)
          if state is None else state)
    D_arr = jnp.zeros((H,), jnp.float32) if D is None else D
    return _run(x, dt, A, B, C, D_arr, S0)
