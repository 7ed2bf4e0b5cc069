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
SP_AXIS = "sp"
PP_AXIS = "pp"


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    sp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ([pp,] dp, tp[, sp]) mesh over the available devices.

    Defaults: tp = largest divisor of device count that divides the 8B
    model's 4 KV heads (1, 2, or 4); dp = the rest. sp > 1 adds a
    sequence-parallel axis (ring attention shards the LM's long sequence
    over it); pp > 1 adds a leading pipeline axis (decoder stages,
    parallel/pipeline.py) — both axes the reference has no counterpart
    for (SURVEY §2.7, §5.7). pp leads so stage hops ride the slowest
    links (DCN across slices) while dp/tp/sp stay on ICI.
    On one device all axes are 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    per_pipe = n // pp
    assert per_pipe * pp == n, f"pp({pp}) must divide device count ({n})"
    per_seq = per_pipe // sp
    assert per_seq * sp == per_pipe, (
        f"sp({sp}) must divide devices/pp ({per_pipe})")
    if tp is None:
        tp = 4 if per_seq % 4 == 0 else (2 if per_seq % 2 == 0 else 1)
        if dp is not None:
            tp = per_seq // dp
    if dp is None:
        dp = per_seq // tp
    assert dp * tp * sp * pp == n, (
        f"pp({pp}) * dp({dp}) * tp({tp}) * sp({sp}) != devices ({n})")
    if pp > 1:
        axes = (PP_AXIS, DP_AXIS, TP_AXIS) + ((SP_AXIS,) if sp > 1 else ())
        shape = (pp, dp, tp) + ((sp,) if sp > 1 else ())
        return Mesh(np.asarray(devices).reshape(shape), axes)
    if sp == 1:
        # 2-axis layout keeps single-host placements identical to round 1
        # (sp enters as a third axis only when requested).
        arr = np.asarray(devices).reshape(dp, tp)
        return Mesh(arr, (DP_AXIS, TP_AXIS))
    arr = np.asarray(devices).reshape(dp, tp, sp)
    return Mesh(arr, (DP_AXIS, TP_AXIS, SP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (video-batch) axis over dp."""
    return NamedSharding(mesh, P(DP_AXIS))
