"""Collective (multi-process JAX) rank synchronization for evaluation.

The reference gathers per-rank samples/metrics to rank 0 with
torch.distributed.gather_object behind a dist.barrier
(lmms_eval/evaluator.py:553-573). The TPU-native equivalent is
jax.experimental.multihost_utils over the JAX distributed runtime: a
device-backed barrier plus an allgather of serialized records — no shared
filesystem needed (the file-sentinel path in eval/harness.py remains the
fallback for separately-launched, non-jax.distributed rank fleets).

Python objects ride the collective as JSON bytes: gather lengths first,
pad every process's payload to the max, allgather one uint8 array, slice
per the gathered lengths. Verified end-to-end by tests/test_multihost.py,
which runs a real 2-process jax.distributed CPU fleet (Gloo collectives) —
the same code path a TPU pod takes over ICI/DCN.
"""

from __future__ import annotations

import json
from typing import Any, List

import numpy as np


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def barrier(name: str) -> None:
    """Global barrier across all JAX processes (no-op single-process)."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def gather_objects(obj: Any) -> List[Any]:
    """Allgather one JSON-serializable object per process.

    Every process receives the full list, indexed by process id. Must be
    called by ALL processes (it is a collective). Single-process: [obj].
    """
    import jax

    if not is_multiprocess():
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        json.dumps(obj, ensure_ascii=False, default=str).encode("utf-8"),
        dtype=np.uint8,
    )
    lengths = multihost_utils.process_allgather(
        np.array([payload.size], dtype=np.int64)
    ).reshape(-1)
    buf = np.zeros(int(lengths.max()), dtype=np.uint8)
    buf[: payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)  # [P, maxlen]
    return [
        json.loads(bytes(gathered[p, : int(lengths[p])]).decode("utf-8"))
        for p in range(jax.process_count())
    ]
