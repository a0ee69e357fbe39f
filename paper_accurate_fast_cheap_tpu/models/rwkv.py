"""RWKV-6 time-mix "recurrent attention" modules (the paper's contribution).

Parity targets:
* `wenet/rwkv_v6/src/model.py:218-325` (RWKV_Tmix_x060c): token-shift delta,
  data-dependent LoRA mixing (D_MIX=32) for r/k/v/w, per-channel decay
  `w = time_decay + tanh(w @ w1) @ w2` (D_DECAY=64), bonus u = time_faaaa,
  bias-free r/k/v projections, WKV recurrence, LayerNorm(dim_att), output
  projection.  The layer-id-dependent init ramps (`:233-260`) are reproduced
  exactly for checkpoint-parity.
* `wenet/rwkv_v6/rwkv_wrapper.py:57-83` (uni), `rwkv_wrapper_bidirectional.py`
  (flip + rerun + average), `rwkv_wrapper_bidirectional_direction_dropout*.py`
  (DirDrop-R2L / DirDrop-Both training schemes, eval-time env controls
  RWKV_BIDIRECTIONAL_LAYERS / RWKV_ALT_DECODING).

TPU-first differences: the recurrence runs through the chunked MXU
formulation (`ops/wkv6.py`) instead of a sequential CUDA kernel; the
bidirectional pass flips only the *valid* region of padded batches (gather
by index) and runs fwd+bwd as one doubled-batch kernel call instead of two
CUDA streams; bf16 casting becomes a dtype policy instead of module surgery.
"""
from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.ops import wkv6 as wkv6_ops

D_MIX_LORA = 32
D_DECAY_LORA = 64


def _tmix_ramps(layer_id: int, n_layers: int, n_embd: int, dim_att: int,
                n_head: int, head_size: int):
    """Layer-position-dependent init constants (`src/model.py:233-260`)."""
    r01 = layer_id / max(n_layers - 1, 1)          # 0 -> 1
    r1a0 = 1.0 - layer_id / n_layers               # 1 -> ~0
    ddd = np.arange(n_embd, dtype=np.float64) / n_embd
    maa_x = 1.0 - np.power(ddd, r1a0)
    maa_r = 1.0 - np.power(ddd, 0.5 * r1a0)
    maa_k = 1.0 - np.power(ddd, r1a0)
    maa_v = 1.0 - (np.power(ddd, r1a0) + 0.3 * r01)
    maa_w = 1.0 - np.power(ddd, r1a0)
    n = np.arange(dim_att, dtype=np.float64)
    decay_speed = -6.0 + 5.0 * (n / (dim_att - 1)) ** (0.7 + 1.3 * r01)
    zigzag = ((n + 1) % 3 - 1) * 0.1
    faaaa = (r01 * (1.0 - n / (dim_att - 1)) + zigzag).reshape(
        n_head, head_size
    )
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return {
        "maa_x": f32(maa_x), "maa_r": f32(maa_r), "maa_k": f32(maa_k),
        "maa_v": f32(maa_v), "maa_w": f32(maa_w),
        "decay_speed": f32(decay_speed), "faaaa": f32(faaaa),
    }


class RWKVTimeMix(nn.Module):
    """RWKV-6c time-mix block: (B, T, C) -> (B, T, C)."""

    head_size: int
    n_layers: int
    n_embd: int
    dim_att: int
    layer_id: int = 0
    wkv_impl: str = "chunked"
    wkv_chunk_size: int = 256
    wkv_version: Optional[int] = None   # pallas kernel version override
    # when set, __call__ runs INSIDE a shard_map with T sharded over this
    # mesh axis: token-shift uses a 1-frame halo exchange and the WKV
    # recurrence uses the sequence-parallel collective body
    spmd_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, state=None, return_state: bool = False):
        """x: (B, T, C).  Optional streaming state = (x_prev (B, 1, C),
        wkv_state (B, H, N, N)) — the `wkv6state` capability
        (`wkv6state_cuda.cu:8-25`) expressed as an explicit carry."""
        C, A = self.n_embd, self.dim_att
        n_head = A // self.head_size
        ramps = _tmix_ramps(self.layer_id, self.n_layers, C, A, n_head,
                            self.head_size)
        init = lambda a: (lambda key, shape, dtype=jnp.float32: a)
        maa_x = self.param("time_maa_x", init(ramps["maa_x"]), (C,))
        maa_r = self.param("time_maa_r", init(ramps["maa_r"]), (C,))
        maa_k = self.param("time_maa_k", init(ramps["maa_k"]), (C,))
        maa_v = self.param("time_maa_v", init(ramps["maa_v"]), (C,))
        maa_w = self.param("time_maa_w", init(ramps["maa_w"]), (C,))
        u001 = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
            key, shape, dtype, -0.01, 0.01
        )
        mix_w1 = self.param("time_maa_rkvw_w1", nn.initializers.zeros,
                            (C, D_MIX_LORA * 4))
        mix_w2 = self.param("time_maa_rkvw_w2", u001, (4, D_MIX_LORA, C))
        time_decay = self.param("time_decay", init(ramps["decay_speed"]), (A,))
        decay_w1 = self.param("time_decay_w1", nn.initializers.zeros,
                              (C, D_DECAY_LORA))
        decay_w2 = self.param("time_decay_w2", u001, (D_DECAY_LORA, A))
        u = self.param("time_faaaa", init(ramps["faaaa"]),
                       (n_head, self.head_size))

        B, T, _ = x.shape
        dt = x.dtype
        # token shift: xx_t = x_{t-1} - x_t (zero or carried at t=0)
        if state is not None:
            lead = state[0].astype(dt)
            wkv_state = state[1]
        elif self.spmd_axis:
            from paper_accurate_fast_cheap_tpu.parallel.sequence import (
                halo_exchange,
            )

            lead = halo_exchange(x, self.spmd_axis, 1, 0)[:, :1]
            wkv_state = None
        else:
            lead = jnp.zeros((B, 1, C), dt)
            wkv_state = None
        x_prev = jnp.concatenate([lead, x[:, :-1]], axis=1)
        xx = x_prev - x

        xxx = x + xx * maa_x.astype(dt)
        mix = jnp.tanh(xxx @ mix_w1.astype(dt))          # (B,T,4*32)
        mix = mix.reshape(B, T, 4, D_MIX_LORA)
        lora = jnp.einsum("btfm,fmc->fbtc", mix, mix_w2.astype(dt))
        mr, mk, mv, mw = lora[0], lora[1], lora[2], lora[3]

        xr = x + xx * (maa_r.astype(dt) + mr)
        xk = x + xx * (maa_k.astype(dt) + mk)
        xv = x + xx * (maa_v.astype(dt) + mv)
        xw = x + xx * (maa_w.astype(dt) + mw)

        r = nn.Dense(A, use_bias=False, name="receptance")(xr)
        k = nn.Dense(A, use_bias=False, name="key")(xk)
        v = nn.Dense(A, use_bias=False, name="value")(xv)
        w = time_decay.astype(dt) + (
            jnp.tanh(xw @ decay_w1.astype(dt)) @ decay_w2.astype(dt)
        )

        hs = self.head_size
        shp = (B, T, n_head, hs)
        if self.spmd_axis:
            from paper_accurate_fast_cheap_tpu.parallel.sequence import (
                wkv6_sp_body,
            )

            wkv_out = wkv6_sp_body(
                r.reshape(shp), k.reshape(shp), v.reshape(shp),
                w.reshape(shp), u.astype(dt), self.spmd_axis,
                state=wkv_state, chunk_size=self.wkv_chunk_size,
                return_state=return_state,
            )
        else:
            # the Pallas kernel has crashed the TPU WORKER (not just the
            # program) at LF windows — B=4 x T=5000 on real data (NOTES.md
            # "Pallas WKV at LF shapes") — and repeatedly at batch-64
            # decode shapes (crash #4, 2026-08-19: B=64 x T=750 = 48k
            # row-frames took the worker down on every decode_rtf
            # attempt).  Gate to the proven envelope: every known-good
            # point has B x T <= 18000 (bench.py's 8 x 2250 LF window
            # batch, run dozens of times) and every observed crash has
            # B x T >= 20000; fall back to the chunked-XLA formulation
            # beyond it.
            impl = self.wkv_impl
            sliced = False
            if impl == "pallas" and (T > 8192 or B * T > 18432):
                # opt-in experiment (PAFC_WKV_SLICED=1): stay on the
                # kernel by splitting the batch into sub-calls that each
                # sit inside the proven envelope (bench.py's 8 x 2250
                # point has run dozens of times) instead of falling back
                # to chunked XLA.  Default OFF until the sliced program
                # has a stability record on the real chip.
                sliced = (T <= 8192
                          and os.environ.get("PAFC_WKV_SLICED") == "1")
                if not sliced:
                    impl = "chunked"
            if sliced:
                nb = max(1, 18432 // T)
                outs, states = [], []
                for s0 in range(0, B, nb):
                    s1 = min(B, s0 + nb)
                    sl = lambda a: None if a is None else a[s0:s1]
                    o = wkv6_ops.wkv6(
                        r.reshape(shp)[s0:s1], k.reshape(shp)[s0:s1],
                        v.reshape(shp)[s0:s1], w.reshape(shp)[s0:s1],
                        u.astype(dt), state=sl(wkv_state),
                        chunk_size=self.wkv_chunk_size, impl="pallas",
                        pallas_version=self.wkv_version,
                        return_state=return_state,
                    )
                    if return_state:
                        outs.append(o[0])
                        states.append(o[1])
                    else:
                        outs.append(o)
                wkv_out = jnp.concatenate(outs, axis=0)
                if return_state:
                    wkv_out = (wkv_out, jnp.concatenate(states, axis=0))
            else:
                wkv_out = wkv6_ops.wkv6(
                    r.reshape(shp), k.reshape(shp), v.reshape(shp),
                    w.reshape(shp), u.astype(dt), state=wkv_state,
                    chunk_size=self.wkv_chunk_size, impl=impl,
                    pallas_version=self.wkv_version,
                    return_state=return_state,
                )
        if return_state:
            y, new_wkv = wkv_out
        else:
            y, new_wkv = wkv_out, None
        y = y.reshape(B, T, A)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_x")(y)
        y = nn.Dense(C, use_bias=False, name="output")(y)
        if return_state:
            return y, (x[:, -1:], new_wkv)
        return y


def flip_padded(x: jax.Array, lengths: Optional[jax.Array]):
    """Reverse the valid prefix of each sequence; pad positions stay put.

    The reference flips the whole padded tensor (`rwkv_wrapper_bidirectional.py
    :43-49`), letting pad garbage precede real frames in the R2L scan; here
    the R2L pass sees exactly the reversed valid frames.
    """
    if lengths is None:
        return jnp.flip(x, axis=1)
    T = x.shape[1]
    t = jnp.arange(T)[None, :]                       # (1, T)
    ln = lengths[:, None]                            # (B, 1)
    idx = jnp.where(t < ln, ln - 1 - t, t)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


class RWKVAttention(nn.Module):
    """Directional wrapper with the shared attention call signature.

    direction: 'uni' | 'bi' | 'dirdrop' (DirDrop-R2L) | 'dirdrop_both'.
    For dirdrop variants: at train time the R2L branch (or one random
    direction) is dropped with the reference's probabilities; at eval
    ``bidirectional_layers`` / ``alt_decoding`` reproduce the env-var
    controls of `rwkv_wrapper_bidirectional_direction_dropout.py:25-33,77-88`.
    """

    head_size: int
    dim_att: int
    n_layers: int
    direction: str = "bi"
    layer_id: int = 0
    do_bfloat16: bool = True
    wkv_impl: str = "chunked"
    wkv_chunk_size: int = 256
    wkv_version: Optional[int] = None
    spmd_axis: Optional[str] = None   # T-sharded (sequence-parallel) mode
    drop_prob: float = 0.2           # P(drop R2L) for dirdrop
    keep_both_prob: float = 0.8      # P(keep both) for dirdrop_both
    bidirectional_layers: Optional[tuple] = None  # eval override (layer ids)
    alt_decoding: bool = False       # eval: even layers L2R, odd layers R2L

    @nn.compact
    def __call__(self, x_q, x_kv=None, mask=None, pos_emb=None, *,
                 lengths=None, deterministic: bool = True,
                 state=None, return_state: bool = False):
        x = x_q
        in_dtype = x.dtype
        if self.do_bfloat16:
            x = x.astype(jnp.bfloat16)
        tmix = RWKVTimeMix(
            head_size=self.head_size, n_layers=self.n_layers,
            n_embd=self.dim_att, dim_att=self.dim_att,
            layer_id=self.layer_id, wkv_impl=self.wkv_impl,
            wkv_chunk_size=self.wkv_chunk_size,
            wkv_version=self.wkv_version, spmd_axis=self.spmd_axis,
            name="tmix",
        )

        if self.direction == "uni":
            if return_state:
                y, new_state = tmix(x, state=state, return_state=True)
                return y.astype(in_dtype), new_state
            return tmix(x).astype(in_dtype)
        if return_state:
            raise ValueError(
                "streaming state requires direction='uni' (bidirectional "
                "attention needs the full future context)"
            )

        tmix_rev = RWKVTimeMix(
            head_size=self.head_size, n_layers=self.n_layers,
            n_embd=self.dim_att, dim_att=self.dim_att,
            layer_id=self.layer_id, wkv_impl=self.wkv_impl,
            wkv_chunk_size=self.wkv_chunk_size,
            wkv_version=self.wkv_version, spmd_axis=self.spmd_axis,
            name="tmix_rev",
        )

        def fwd():
            return tmix(x)

        def bwd():
            if self.spmd_axis:
                # T-sharded mode: distributed time-reverse (shard-order
                # ppermute + local flip); padded batches are not
                # supported under sequence parallelism
                if lengths is not None:
                    raise ValueError(
                        "spmd_axis (sequence parallelism) requires "
                        "full-length sequences (lengths=None)")
                from paper_accurate_fast_cheap_tpu.parallel.sequence import (
                    flip_sharded,
                )

                return flip_sharded(
                    tmix_rev(flip_sharded(x, self.spmd_axis)),
                    self.spmd_axis)
            xr = flip_padded(x, lengths)
            return flip_padded(tmix_rev(xr), lengths)

        if self.direction == "bi":
            y = (fwd() + bwd()) / 2
        elif self.direction in ("dirdrop", "dirdrop_both"):
            if not deterministic:
                key = self.make_rng("dropout")
                if self.direction == "dirdrop":
                    # keep L2R always; drop R2L with p=drop_prob
                    keep_r2l = jax.random.bernoulli(
                        key, 1.0 - self.drop_prob
                    )
                    y = jnp.where(keep_r2l, (fwd() + bwd()) / 2, fwd())
                else:
                    k1, k2 = jax.random.split(key)
                    keep_both = jax.random.bernoulli(k1, self.keep_both_prob)
                    pick_fwd = jax.random.bernoulli(k2, 0.5)
                    one = jnp.where(pick_fwd, fwd(), bwd())
                    y = jnp.where(keep_both, (fwd() + bwd()) / 2, one)
            else:
                if self.alt_decoding:
                    y = fwd() if self.layer_id % 2 == 0 else bwd()
                elif (
                    self.bidirectional_layers is not None
                    and self.layer_id not in self.bidirectional_layers
                ):
                    y = fwd()
                else:
                    y = (fwd() + bwd()) / 2
        else:
            raise ValueError(f"unknown rwkv direction: {self.direction!r}")
        return y.astype(in_dtype)
