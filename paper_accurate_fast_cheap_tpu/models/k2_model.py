"""K2/HLG lattice decoding surface (optional dependency gate).

Parity target: `wenet/k2/model.py` (303 LoC): HLG onebest / n-best rescore
decoding via k2 + icefall.  k2 is CUDA/torch-native and has no JAX/TPU
build; this module gates the surface cleanly (the reference likewise treats
k2 as an optional extra, `asr_model.py:458-609`) and offers the CTC-only
fallback so configs requesting HLG still decode.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from paper_accurate_fast_cheap_tpu.decode.search import (
    DecodeResult,
    ctc_prefix_beam_search,
)

_K2_MSG = (
    "k2 is not available in this environment (CUDA/torch-only dependency); "
    "HLG lattice decoding falls back to CTC prefix beam search. Install k2 "
    "+ icefall and decode the exported CTC posteriors externally for exact "
    "HLG parity."
)


def k2_available() -> bool:
    try:
        import k2  # noqa: F401

        return True
    except ImportError:
        return False


def hlg_onebest(ctc_logp: np.ndarray, lengths: np.ndarray,
                hlg_path: Optional[str] = None,
                beam_size: int = 10) -> List[DecodeResult]:
    """HLG one-best (`k2/model.py` decode); CTC fallback when k2 absent."""
    if not k2_available():
        import logging

        logging.getLogger(__name__).warning(_K2_MSG)
        return ctc_prefix_beam_search(ctc_logp, lengths,
                                      beam_size=beam_size)
    raise NotImplementedError(
        "k2 present but TPU-side HLG decode is not wired; export the "
        "posteriors and run icefall's HLG decode"
    )
