"""Model adapter registry — importing registers all adapters."""

from videoitg_tpu.eval.adapters import downstream, native_vlm, videoitg  # noqa: F401
