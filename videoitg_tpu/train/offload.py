"""Host offload of optimizer state (the ZeRO-3-offload equivalent).

The reference's zero3_offload.json parks optimizer state (and params) in CPU
memory via DeepSpeed. On TPU the native mechanism is memory kinds: arrays
placed with memory_kind="pinned_host" live in host RAM and XLA streams them
across PCIe inside the step. Useful when HBM is the binding constraint
(e.g. full-8B AdamW on few chips); costs step time, saves chips.

TPU-only (the CPU backend has a single memory kind); callers gate on
backend and fall back to device placement.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def host_sharding(mesh=None, spec: P = P()) -> "jax.sharding.Sharding":
    """A pinned-host sharding (replicated by default)."""
    if mesh is None:
        dev = jax.devices()[0]
        return jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
    return NamedSharding(mesh, spec, memory_kind="pinned_host")


def supports_host_offload() -> bool:
    try:
        dev = jax.devices()[0]
        kinds = {m.kind for m in dev.addressable_memories()}
        return "pinned_host" in kinds
    except Exception:
        return False


def offload_opt_state(opt_state, mesh=None):
    """Move every optimizer-state array to pinned host memory, preserving
    each leaf's partitioning (replicating sharded ZeRO-style state would
    materialize a full copy per device and defeat the offload)."""

    def park(x):
        try:
            sh = x.sharding.with_memory_kind("pinned_host")
        except Exception:
            sh = host_sharding(mesh)
        return jax.device_put(x, sh)

    return jax.tree.map(park, opt_state)


def make_offloaded_train_step(step_fn, device_opt_shardings, mesh=None):
    """Wrap a train step so optimizer state lives on the host between steps.

    `device_opt_shardings` must be captured from the on-device optimizer
    state BEFORE offloading (jax.tree.map(lambda x: x.sharding, opt_state)) —
    each step fetches the state back to those placements, updates, and
    parks the result on the host again (the DeepSpeed-offload cadence; jit
    cannot mix host and device operands in one op).
    """

    def wrapped(state, batch):
        fetched = jax.tree.map(jax.device_put, state.opt_state, device_opt_shardings)
        new_state, metrics = step_fn(state._replace(opt_state=fetched), batch)
        new_state = new_state._replace(
            opt_state=offload_opt_state(new_state.opt_state, mesh)
        )
        return new_state, metrics

    return wrapped
