"""Ambient mesh context for shard_map islands.

GSPMD partitions every einsum in the model automatically, but a Pallas
kernel is opaque to it — the flash-attention call must be wrapped in
jax.shard_map with explicit per-axis specs. Threading the mesh through
every model function would pollute the pure functional API, so the engine
installs it here and ops/attention.mha picks it up when dispatching to the
kernel. Attention has no cross-head communication, so head (tp) and batch
(dp) sharding are communication-free inside the island.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

from jax.sharding import Mesh

_ACTIVE: Optional[Tuple[Mesh, str, str, Optional[str]]] = None


@contextlib.contextmanager
def attention_mesh(mesh: Mesh, dp_axis: str = "dp", tp_axis: str = "tp",
                   sp_axis: Optional[str] = None):
    """While active, flash attention runs as a shard_map island over mesh.

    sp_axis (when the mesh carries one with size > 1) additionally shards
    the LM's long sequence via ring attention (parallel/ring_attention.py).
    """
    global _ACTIVE
    prev = _ACTIVE
    if sp_axis is None and "sp" in mesh.shape and mesh.shape["sp"] > 1:
        sp_axis = "sp"
    _ACTIVE = (mesh, dp_axis, tp_axis, sp_axis)
    try:
        yield
    finally:
        _ACTIVE = prev


def current_attention_mesh() -> Optional[Tuple[Mesh, str, str, Optional[str]]]:
    return _ACTIVE


@contextlib.contextmanager
def no_attention_mesh():
    """Suppress the ambient attention mesh (used inside manual shard_map
    islands, where ops/attention.mha must run per-device instead of
    opening a nested island)."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = None
    try:
        yield
    finally:
        _ACTIVE = prev


# ---- pipeline parallelism (pp) -------------------------------------------
# (mesh, pp_axis, microbatches) — consulted by
# models/qwen2.qwen2_hidden_states; see parallel/pipeline.py.
_PIPELINE: Optional[Tuple[Mesh, str, Optional[int]]] = None


@contextlib.contextmanager
def pipeline_mesh(mesh: Mesh, pp_axis: str = "pp",
                  microbatches: Optional[int] = None):
    """While active, the LM decoder stack runs as a GPipe-style microbatch
    pipeline over mesh's pp axis (parallel/pipeline.py). microbatches=None
    defaults to the largest divisor of the batch <= pp."""
    global _PIPELINE
    prev = _PIPELINE
    _PIPELINE = (mesh, pp_axis, microbatches)
    try:
        yield
    finally:
        _PIPELINE = prev


def current_pipeline() -> Optional[Tuple[Mesh, str, Optional[int]]]:
    return _PIPELINE
