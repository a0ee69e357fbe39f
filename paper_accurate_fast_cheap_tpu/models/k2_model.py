"""K2/HLG lattice decoding surface (optional dependency gate).

Parity target: `wenet/k2/model.py` (303 LoC): HLG onebest / n-best rescore
decoding via k2 + icefall.  k2 is CUDA/torch-native and has no JAX/TPU
build; this module gates the surface cleanly (the reference likewise treats
k2 as an optional extra, `asr_model.py:458-609`).  When k2 IS importable,
`hlg_onebest` runs the real lattice one-best on the exported CTC
posteriors (torch CPU); when it is not, it falls back to CTC prefix beam
search.  `export_posteriors` writes the posteriors + lengths so the
external icefall HLG pipeline can be run either way.
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
    "HLG lattice decoding falls back to CTC prefix beam search. Use "
    "export_posteriors() and run icefall's HLG decode externally for exact "
    "HLG parity."
)


def k2_available() -> bool:
    try:
        import k2  # noqa: F401

        return True
    except ImportError:
        return False


def export_posteriors(path: str, ctc_logp: np.ndarray,
                      lengths: np.ndarray, keys: Optional[list] = None):
    """Write CTC log-posteriors in an npz the external icefall HLG recipe
    (or `hlg_onebest` on a k2-equipped host) can consume."""
    np.savez(path, ctc_logp=np.asarray(ctc_logp),
             lengths=np.asarray(lengths),
             keys=np.asarray(keys if keys is not None else
                             [str(i) for i in range(len(lengths))]))


def hlg_onebest(ctc_logp: np.ndarray, lengths: np.ndarray,
                hlg_path: Optional[str] = None,
                beam_size: int = 10,
                search_beam: float = 20.0,
                output_beam: float = 8.0,
                min_active_states: int = 30,
                max_active_states: int = 10000) -> List[DecodeResult]:
    """HLG one-best (`k2/model.py` get_lattice + one_best semantics).

    With k2 present and an HLG fst file: real lattice decode on torch CPU.
    Without k2 (this TPU image): CTC prefix beam fallback with a warning.
    """
    if not k2_available() or hlg_path is None:
        import logging

        if not k2_available():
            logging.getLogger(__name__).warning(_K2_MSG)
        else:
            logging.getLogger(__name__).warning(
                "k2 present but no --hlg fst given; CTC fallback")
        return ctc_prefix_beam_search(ctc_logp, lengths,
                                      beam_size=beam_size)
    import k2
    import torch

    hlg = k2.Fsa.from_dict(torch.load(hlg_path, map_location="cpu"))
    logp = torch.from_numpy(np.asarray(ctc_logp, np.float32))
    lens = torch.from_numpy(np.asarray(lengths, np.int32))
    B = logp.shape[0]
    supervision = torch.stack(
        [torch.arange(B, dtype=torch.int32),
         torch.zeros(B, dtype=torch.int32), lens], dim=1)
    lattice = k2.get_lattice(
        logp, supervision, hlg,
        search_beam=search_beam, output_beam=output_beam,
        min_active_states=min_active_states,
        max_active_states=max_active_states,
        subsampling_factor=1,
    )
    best = k2.shortest_path(lattice, use_double_scores=True)
    results = []
    for i in range(B):
        fsa = best[i]
        aux = fsa.aux_labels
        if hasattr(aux, "values"):
            aux = aux.values
        toks = [int(t) for t in aux.tolist() if t > 0]
        score = float(fsa.get_tot_scores(
            use_double_scores=True, log_semiring=False).item()) \
            if hasattr(fsa, "get_tot_scores") else 0.0
        results.append(DecodeResult(tokens=toks, score=score))
    return results
