"""Serialized model export (StableHLO via jax.export).

Parity target: the reference's torchscript/ONNX export surface
(`wenet/transformer/asr_model.py:611-986`: forward_encoder_chunk,
ctc_activation, forward_attention_decoder for the C++ runtime;
`train_utils.py:483-494` --jit smoke test).  TPU-native equivalent:
`jax.export` serializes the jitted functions to portable StableHLO that any
PJRT runtime (C++, TPU, GPU) can load without Python.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def export_encoder_ctc(model, params, input_dim: int = 80,
                       batch: int = 1, frames: int = 2051,
                       platform: Optional[str] = None) -> bytes:
    """Serialize encoder+ctc-activation (the serving hot path) to
    StableHLO bytes.  Shapes are static (batch, frames)."""
    from jax import export as jexport

    def fn(p, feats, lens):
        enc, enc_lens = model.apply(p, feats, lens,
                                    method=model.forward_encoder)
        logp = model.apply(p, enc, method=model.ctc_logprobs)
        return logp, enc_lens

    feats = jax.ShapeDtypeStruct((batch, frames, input_dim), jnp.float32)
    lens = jax.ShapeDtypeStruct((batch,), jnp.int32)
    platforms = [platform] if platform else None
    exported = jexport.export(
        jax.jit(fn), platforms=platforms
    )(params, feats, lens)
    return exported.serialize()


def load_exported(blob: bytes):
    """Deserialize and return a callable (params, feats, lens) -> outputs."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return exported.call


def export_smoke_test(model, params, input_dim: int = 80) -> bool:
    """`--jit` trainability smoke test analog (`train_utils.py:483-494`):
    fails fast when the model stops being exportable."""
    blob = export_encoder_ctc(model, params, input_dim=input_dim,
                              batch=1, frames=128)
    fn = load_exported(blob)
    import numpy as np

    out = fn(params, jnp.zeros((1, 128, input_dim)),
             jnp.asarray([128], jnp.int32))
    return bool(np.isfinite(np.asarray(out[0])).all())


def save_exported(path: str, blob: bytes) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
