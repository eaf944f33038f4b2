"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths execute in CI without TPU hardware."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The preinstalled axon TPU plugin ignores JAX_PLATFORMS; force CPU via the
# config API (must run before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
