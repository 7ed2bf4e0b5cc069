"""Pipeline observability: stage timers + XLA profiler traces.

The reference has essentially no tracing (SURVEY §5.1 — vestigial `time`
imports, tqdm progress). Here the selection pipeline's stages (decode /
preprocess / score / select) are timed explicitly and jax.profiler traces
can wrap any region for tensorboard-viewable HLO timelines. The north-star
metric — frames scored/sec/chip — falls out of the stage stats.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates wall-clock per named stage; thread-unsafe by design
    (one per pipeline worker)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def record(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(1, self.counts[name]), 2),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)

    def frames_per_second(self, total_frames: int, stage: str = "score") -> float:
        t = self.totals.get(stage, 0.0)
        return total_frames / t if t > 0 else 0.0


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace when log_dir is set; no-op
    otherwise (so callers can keep the with-block unconditionally)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def device_memory_stats() -> Dict[str, int]:
    """Best-effort per-device memory stats (bytes)."""
    import jax

    out: Dict[str, int] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
            out[str(d)] = stats.get("bytes_in_use", -1)
        except Exception:
            out[str(d)] = -1
    return out
