"""Per-phase timing instrumentation.

The reference has no observability at all (SURVEY.md section 5.1); the
engine records wall time per phase (parse/encode, precompute, device
sweep, finalize, write) when ``DISTANCE_TPU_TRACE=1``, printing one line
per phase to stderr and accumulating totals for the benchmark harness.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict
from typing import Dict, Iterator

_TOTALS: Dict[str, float] = defaultdict(float)
_COUNTS: Dict[str, int] = defaultdict(int)


def enabled() -> bool:
    return os.environ.get("DISTANCE_TPU_TRACE", "") not in ("", "0")


@contextlib.contextmanager
def phase_timer(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _TOTALS[name] += dt
        _COUNTS[name] += 1
        if enabled():
            print(f"[distance-tpu] {name}: {dt * 1e3:.2f} ms", file=sys.stderr)


def totals() -> Dict[str, float]:
    return dict(_TOTALS)


def reset() -> None:
    _TOTALS.clear()
    _COUNTS.clear()
