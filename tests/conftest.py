"""Test config: run everything on an 8-device virtual CPU mesh.

The session's sitecustomize registers the real-TPU "axon" backend and
forces ``jax.config.jax_platforms = "axon,cpu"`` at interpreter startup,
so overriding the env var is not enough — we must update the jax config
itself before any backend initializes (backend init is lazy, so doing it
at conftest import time is early enough).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
