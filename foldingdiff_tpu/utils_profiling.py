"""
First-class tracing/profiling (SURVEY.md section 5: the reference has only
per-epoch wall-clock prints; here JAX profiler traces and phase timers are
built in).

- `phase_timer(name)`: context manager logging wall time per pipeline phase.
- `maybe_profile(dirname)`: context manager producing an xplane/perfetto trace
  viewable in TensorBoard / Perfetto when dirname is non-empty.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict

_PHASE_TOTALS: Dict[str, float] = defaultdict(float)


@contextlib.contextmanager
def phase_timer(name: str, log: bool = True):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _PHASE_TOTALS[name] += dt
        if log:
            logging.info(f"[phase] {name}: {dt:.2f}s (cumulative {_PHASE_TOTALS[name]:.2f}s)")


def phase_totals() -> Dict[str, float]:
    return dict(_PHASE_TOTALS)


@contextlib.contextmanager
def maybe_profile(dirname: str = ""):
    """JAX profiler trace into dirname when set; no-op otherwise."""
    if not dirname:
        yield
        return
    import jax

    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info(f"Wrote profiler trace to {dirname}")
