"""Tracing / profiling / memory observability.

Parity target: SURVEY.md §5 "tracing/profiling" — the reference scatters
nvtx ranges, CUDA memory monitors and wall-clock RTF timers
(`rwkv_wrapper_bidirectional2.py:70-77`, `recognize_wav2.py:44-95`,
`encoder-rtf.py:56-135,491-523`).  TPU-native equivalents: jax.profiler
traces (XLA op-level, viewable in TensorBoard/Perfetto), named annotations,
device memory stats, and a host-RSS monitor thread.
"""
from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace: with trace('/tmp/prof'): step()."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range annotation visible in profiler traces (nvtx analog)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> Dict[str, float]:
    """HBM usage in MB (torch.cuda.max_memory_allocated analog)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    mb = 1024 * 1024
    return {
        "bytes_in_use_mb": stats.get("bytes_in_use", 0) / mb,
        "peak_bytes_in_use_mb": stats.get("peak_bytes_in_use", 0) / mb,
        "bytes_limit_mb": stats.get("bytes_limit", 0) / mb,
    }


class MemoryMonitor:
    """Background max-RSS tracker (`encoder-rtf.py:56-82` equivalent)."""

    def __init__(self, interval_s: float = 1.0):
        self.interval_s = interval_s
        self.max_rss_mb = 0.0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _run(self):
        import resource

        while not self._stop.is_set():
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
            self.max_rss_mb = max(self.max_rss_mb, rss)
            self._stop.wait(self.interval_s)

    def __enter__(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)


class StepTimer:
    """Wall-clock timing with warmup exclusion and RTF computation."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def mean(self, skip_warmup: int = 1) -> float:
        xs = self.times[skip_warmup:] or self.times
        return sum(xs) / max(len(xs), 1)

    def rtf(self, audio_seconds: float, skip_warmup: int = 1) -> float:
        return self.mean(skip_warmup) / max(audio_seconds, 1e-9)
