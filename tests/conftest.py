"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; all sharding tests run against
XLA's host-platform device emulation.  The container's sitecustomize registers
the axon TPU backend unconditionally, so ``JAX_PLATFORMS`` env alone is not
enough — override via jax.config before any computation runs.
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
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the JIT-heavy model tests dominate the suite's
# wall-clock on a 1-core box; warm reruns skip recompilation entirely.
_here = os.path.dirname(os.path.abspath(__file__))
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_here, os.pardir, ".jax_cache_tests")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
