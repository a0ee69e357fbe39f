"""Emission-latency analysis.

Parity target: `tools/latency_metrics.py` — compare decode-time token
emission times against forced-alignment reference times and report
FirstToken / LastToken / AvgToken delay percentiles (`:206-274`).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import numpy as np


@dataclasses.dataclass
class UttLatency:
    first_token: float
    last_token: float
    avg_token: float


def token_delays(emission_times: Sequence[float],
                 reference_times: Sequence[float]) -> List[float]:
    """Per-token delay = emitted - reference (same token order assumed)."""
    n = min(len(emission_times), len(reference_times))
    return [emission_times[i] - reference_times[i] for i in range(n)]


def utterance_latency(emission_times: Sequence[float],
                      reference_times: Sequence[float]) -> UttLatency:
    d = token_delays(emission_times, reference_times)
    if not d:
        return UttLatency(0.0, 0.0, 0.0)
    return UttLatency(first_token=d[0], last_token=d[-1],
                      avg_token=float(np.mean(d)))


def latency_report(per_utt: List[UttLatency],
                   percentiles=(50, 90, 95, 99)) -> Dict[str, Dict]:
    """Percentile summary over utterances (`latency_metrics.py:206-274`)."""
    out = {}
    for field in ("first_token", "last_token", "avg_token"):
        vals = np.asarray([getattr(u, field) for u in per_utt])
        if len(vals) == 0:
            out[field] = {}
            continue
        out[field] = {
            "mean": float(vals.mean()),
            **{f"p{p}": float(np.percentile(vals, p)) for p in percentiles},
        }
    return out


def ctc_peak_emission_times(ctc_logp: np.ndarray, tokens: Sequence[int],
                            frame_rate: float = 0.04) -> List[float]:
    """Reference times via CTC forced alignment peaks."""
    from paper_accurate_fast_cheap_tpu.ops import ctc_utils

    if not tokens:
        return []
    ali = ctc_utils.force_align(ctc_logp, list(tokens))
    spans = ctc_utils.alignment_to_token_spans(ali)
    return [s[1] * frame_rate for s in spans]
