"""Profiling helpers: jax.profiler trace capture + simple wall-clock scopes
(SURVEY.md §5 — the reference only has wall-clock RTF logging; here we add
device traces viewable in TensorBoard/Perfetto)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def device_trace(outdir: Optional[str]):
    """Capture a jax.profiler trace into `outdir` (no-op when None)."""
    if not outdir:
        yield
        return
    import jax

    with jax.profiler.trace(outdir):
        yield


class Timers:
    """Named wall-clock accumulators (mean/std like the reference streamer's
    exit stats)."""

    def __init__(self):
        self._records: Dict[str, list] = {}

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._records.setdefault(name, []).append(
                time.perf_counter() - t0)

    def summary(self) -> Dict[str, dict]:
        import numpy as np

        return {
            k: {"mean_ms": float(np.mean(v) * 1000),
                "std_ms": float(np.std(v) * 1000),
                "count": len(v)}
            for k, v in self._records.items()
        }
