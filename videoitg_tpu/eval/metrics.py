"""Metric utilities: bootstrap standard errors.

Parity: the reference attaches bootstrap stderr to aggregated metrics
(lmms_eval/api/metrics.py:324+). Deterministic seeding keeps reruns stable.
"""

from __future__ import annotations

import random
from typing import Callable, List, Sequence


def bootstrap_stderr(
    records: Sequence,
    statistic: Callable[[List], float],
    iters: int = 1000,
    seed: int = 1234,
) -> float:
    """Stderr of `statistic` over bootstrap resamples of `records`."""
    n = len(records)
    if n <= 1:
        return 0.0
    rng = random.Random(seed)
    stats = []
    for _ in range(iters):
        sample = [records[rng.randrange(n)] for _ in range(n)]
        stats.append(statistic(sample))
    mean = sum(stats) / len(stats)
    var = sum((s - mean) ** 2 for s in stats) / (len(stats) - 1)
    return var ** 0.5
