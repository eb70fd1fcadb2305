"""Profiling helpers: jax.profiler trace capture + simple wall-clock scopes
(SURVEY.md §5 — the reference only has wall-clock RTF logging; here we add
device traces viewable in TensorBoard/Perfetto)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache for this process.

    Every CLI entry point calls this: on the tunneled TPU a fresh process
    otherwise re-pays minutes of remote compile for the big jitted
    transcode/train graphs.  Honors JAX_COMPILATION_CACHE_DIR, defaulting
    to ~/.cache/jax_comp_cache.

    Also honors AUDIODEC_PLATFORM (e.g. =cpu): the axon TPU plugin
    ignores the JAX_PLATFORMS env var, so CPU smoke runs of the CLIs
    (e.g. while the chip is busy training) need this config-level
    override, applied before backend init."""
    import os

    import jax

    plat = os.environ.get("AUDIODEC_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser(
                                      "~/.cache/jax_comp_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: compile cache is best-effort


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
