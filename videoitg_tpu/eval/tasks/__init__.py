"""Benchmark task registry — importing this package registers all tasks."""

from videoitg_tpu.eval.tasks import cgbench, longvideobench, mlvu, videomme  # noqa: F401
