"""Tracing / profiling utilities.

The reference has no first-party profiling — examples hand-roll
perf_counter deltas inside callbacks (examples/H2_OptOrbVQE.py:44-60) and
ssvqe.py:296-302 logs optimizer wall time.  Here observability is
structured: a PhaseTimer accumulates per-phase wall times (the OptOrb
outer loops already populate `result.metrics` with it), and
`trace_to` wraps a block in a jax.profiler trace for TensorBoard-level
device profiling.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

logger = logging.getLogger("esoo_tpu")


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    with timer.phase("eigensolver"):
        ...
    timer.totals() -> {"eigensolver": 1.23, ...}
    """

    def __init__(self):
        self._laps: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._laps[name].append(time.perf_counter() - t0)

    @property
    def laps(self) -> Dict[str, List[float]]:
        return dict(self._laps)

    def totals(self) -> Dict[str, float]:
        return {k: sum(v) for k, v in self._laps.items()}

    def report(self) -> str:
        lines = []
        for name, laps in sorted(self._laps.items()):
            lines.append(f"{name:>24}: {sum(laps):8.3f}s over {len(laps)} laps"
                         f" (mean {sum(laps) / len(laps):.4f}s)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """jax.profiler.TraceAnnotation wrapper usable as a context manager."""
    import jax
    return jax.profiler.TraceAnnotation(name)
