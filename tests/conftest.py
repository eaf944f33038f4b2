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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_accumulation():
    """Clear jit caches between test modules: a single pytest process that
    compiles the whole suite's ~100+ XLA:CPU programs eventually SEGFAULTS
    inside backend_compile_and_load on this jaxlib (reproducibly at the
    stereo build_frame program; the same program compiles fine in a fresh
    process). Equal-valued configs share cache entries within a module, so
    the cost is one recompile of the shared programs per module."""
    yield
    jax.clear_caches()
