"""Test configuration: run all tests on CPU with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware.

The session environment may register a real TPU platform (axon) via
sitecustomize and force ``jax_platforms`` programmatically, so overriding the
JAX_PLATFORMS env var is not enough — the config flag must be set explicitly
before any backend is initialized. Unit tests must be hermetic and fast; the
bench script is what runs on the chip.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
