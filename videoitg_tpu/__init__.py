"""videoitg_tpu — a TPU-native frame-selection framework for Video-LLMs.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NVlabs/VideoITG:
a dedicated 8B VLM (SigLIP vision tower + MLP projector + bidirectional
Qwen2-7B + sigmoid scoring head) scores uniformly-sampled video frames
against a user instruction and emits Top-K frame indices for any downstream
Video-LLM.

Reference behavior contract: /root/reference (NVlabs/VideoITG).
This package is an independent TPU-first design, not a port.
"""

__version__ = "0.1.0"

from videoitg_tpu.constants import (  # noqa: F401
    DEFAULT_IMAGE_TOKEN,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
)
