"""Model adapter registry — importing registers all adapters."""

from videoitg_tpu.eval.adapters import downstream, videoitg  # noqa: F401
