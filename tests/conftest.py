"""Test environment: force an 8-device virtual CPU mesh before JAX backends init.

This is the TPU-idiomatic replacement for the reference's (absent)
distributed tests — multi-chip sharding logic runs on a host-platform mesh.

Note: this image's TPU plugin registers itself at interpreter start and sets
the jax_platforms config (env vars alone don't win), so we re-update the
config here; backends are not yet initialized when conftest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
