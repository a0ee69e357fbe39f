"""Pallas TPU kernel: one AR step of the stacked-LSTM transducer predictor.

Why: inside the device beam scan (`decode/rnnt_search.py`) the predictor
advances once per frame.  The XLA formulation re-reads every predictor
weight from HBM on every frame — 2x(640,2560) ih + 2x(640,2560) hh +
the (640,640) projection ~= 14 MB bf16, ~0.11 ms at this machine's
~130 GB/s — and `bin/scan_op_bench.py` measures the step at 0.126
ms/frame (B=32, beam 8), making the predictor a co-leader of the beam
budget with the joint+top-k kernel.  Same disease and same cure as
`ops/topk_pallas._joint_topk_rows(w_vmem=True)`: all weights are pinned
in VMEM with `pltpu.with_memory_space_constraint` (inside the jitted
wrapper — the op cannot run eagerly; XLA hoists the pin out of the
scan), so the per-frame HBM traffic drops to the (R, E/H) activations
and states (~1.6 MB).

The embedding lookup stays outside (an XLA gather reads only the hit
rows).  Gate math matches `models/predictor.LSTMLayer._gate`
(i, f, g, o split order; `wenet/transducer/predictor.py:60-` parity),
computed in f32 and cast back to the carry dtype — the same
numerics-class delta as the joint kernel (selection-relevant outputs
proven hypothesis-identical on chip before this became the default).

Reference analog: none — the CUDA stack steps its predictor on host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _lstm_step_kernel(x_ref, hs_ref, cs_ref, wpack_ref, bias_ref,
                      out_ref, nhs_ref, ncs_ref, *, L: int, E: int,
                      H: int, O: int):
    """All matmul weights ride in ONE packed (sum-of-rows, 4H) array so a
    single buffer is VMEM-pinned: per layer [wih (E|H rows); whh (H
    rows)], then wproj padded to (H, 4H) columns.  One pinned buffer
    instead of 3L+2 keeps the VMEM allocator's colored-buffer count low
    (8 pinned inputs compiled but killed the TPU worker at runtime under
    an enclosing jit; the f32 variant failed AOT with "Too many buffers
    are colored in the alternate memory").  ``bias_ref`` rows: L ih
    biases then the padded proj bias.
    """
    dt = x_ref.dtype
    x = x_ref[:]
    row = 0
    for i in range(L):
        ein = E if i == 0 else H
        wih = wpack_ref[row:row + ein]
        row += ein
        whh = wpack_ref[row:row + H]
        row += H
        # the recurrent matmul needs one dtype on the MXU; the carry may
        # be f32 (init_state) while weights ride in the compute dtype
        h = hs_ref[i].astype(dt)
        c = cs_ref[i].astype(jnp.float32)
        gates = (
            jax.lax.dot_general(x, wih, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + bias_ref[i].astype(jnp.float32)
            + jax.lax.dot_general(h, whh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32))
        ig = jax.nn.sigmoid(gates[:, :H])
        fg = jax.nn.sigmoid(gates[:, H:2 * H])
        gg = jnp.tanh(gates[:, 2 * H:3 * H])
        og = jax.nn.sigmoid(gates[:, 3 * H:])
        c = fg * c + ig * gg
        hf = og * jnp.tanh(c)
        nhs_ref[i] = hf.astype(nhs_ref.dtype)
        ncs_ref[i] = c.astype(ncs_ref.dtype)
        x = hf.astype(dt)
    wproj = wpack_ref[row:row + H, :O]
    out = jax.lax.dot_general(x, wproj, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[:] = (out + bias_ref[L, :O].astype(jnp.float32)).astype(dt)


@functools.partial(jax.jit, static_argnames=("w_vmem",))
def lstm_predictor_step(x, hs, cs, layers, wproj, bproj,
                        w_vmem: bool = True):
    """One fused predictor AR step.

    x (R, E) embedded last tokens; hs/cs (L, R, H) stacked states;
    ``layers`` = tuple of (wih (E|H, 4H), bih (4H,), whh (H, 4H));
    wproj (H, O), bproj (O,).  Returns (out (R, O), new_hs, new_cs).
    """
    L = len(layers)
    R, E = x.shape
    H = cs.shape[-1]
    O = wproj.shape[1]
    G4 = 4 * H
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    # the interpreter (CPU tests) cannot consume memory-space-constrained
    # arrays — pin only when actually compiling for TPU
    use_pin = w_vmem and jax.default_backend() == "tpu"

    # pack every matmul weight into ONE (rows, 4H) array (see kernel
    # docstring) and the biases into (L+1, 4H)
    blocks = []
    for (wih, bih, whh) in layers:
        blocks += [wih.astype(x.dtype), whh.astype(x.dtype)]
    blocks.append(jnp.pad(wproj.astype(x.dtype),
                          ((0, 0), (0, G4 - O))))
    wpack = jnp.concatenate(blocks, axis=0)
    brows = [bih.reshape(1, -1).astype(x.dtype) for (_, bih, _) in layers]
    brows.append(jnp.pad(bproj.reshape(1, -1).astype(x.dtype),
                         ((0, 0), (0, G4 - O))))
    bias = jnp.concatenate(brows, axis=0)
    if use_pin:
        wpack = pltpu.with_memory_space_constraint(wpack, pltpu.VMEM)

    out, nhs, ncs = pl.pallas_call(
        functools.partial(_lstm_step_kernel, L=L, E=E, H=H, O=O),
        in_specs=[vm] * 5,
        out_specs=[vm, vm, vm],
        out_shape=[jax.ShapeDtypeStruct((R, O), x.dtype),
                   jax.ShapeDtypeStruct((L, R, H), hs.dtype),
                   jax.ShapeDtypeStruct((L, R, H), cs.dtype)],
        compiler_params=pltpu.CompilerParams(
            # ~14 MB of pinned weights + activations exceed the 16 MB
            # default scoped-vmem budget; the v5e has 128 MB
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, hs, cs, wpack, bias)
    return out, nhs, ncs


def supported(E: int, H: int, O: int, R: int, dtype=jnp.bfloat16) -> bool:
    """Lane/sublane-aligned widths; whole-array blocks (no grid).

    2-byte compute dtypes only: with f32 weights (~28 MB pinned at the
    flagship predictor) the AOT compiler failed with "Too many buffers
    are colored in the alternate memory" — the bf16 program compiles
    and runs.  f32 decode falls back to the XLA step.
    """
    return (E % _LANES == 0 and H % _LANES == 0 and O % _LANES == 0
            and R % 8 == 0 and R <= 4096
            and jnp.dtype(dtype).itemsize == 2)
