"""Device mesh construction.

The reference scales with DeepSpeed ZeRO + accelerate DDP over NCCL
(its scripts/zero*.json, lmms_eval/models/videoitg.py:190-219). Here a
single jax.sharding.Mesh with named axes replaces all of it: "dp" shards
videos (the embarrassingly-parallel axis), "tp" shards attention heads and
MLP features inside one video's forward. GSPMD inserts the collectives;
they ride ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Defaults: tp = largest divisor of device count that divides the 8B
    model's 4 KV heads (1, 2, or 4); dp = the rest. On one device both are 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
        if dp is not None:
            tp = n // dp
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != device count ({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (video-batch) axis over dp."""
    return NamedSharding(mesh, P(DP_AXIS))
