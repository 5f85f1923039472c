"""Profiling: jax.profiler traces + per-stage wall-clock timers.

The reference has no tracing at all (SURVEY §5.1 — only ad-hoc FPS counters
in the streaming demo). Here:

- ``profile_trace`` context manager writes a TensorBoard-compatible XLA
  trace (inspect with xprof / TensorBoard profile plugin);
- ``StageTimer`` accumulates named host-side stage timings (decode,
  preprocess, encode, prefill, decode-loop) with block-until-ready
  semantics so device work is attributed correctly.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: Optional[jax.Array] = None) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = [f"{k}: {v['total_s']}s over {v['count']} calls "
                 f"({v['mean_ms']} ms/call)" for k, v in self.summary().items()]
        return "\n".join(lines)
