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
# The cache dir is keyed by the HOST CPU feature signature: XLA:CPU AOT
# executables are machine-specific, and this VM's visible CPU profile can
# change across sessions — loading an entry compiled under a different
# profile SIGILLs/aborts mid-test (observed: deterministic-looking aborts in
# whichever test first re-executed a stale entry).
import hashlib  # noqa: E402

_here = os.path.dirname(os.path.abspath(__file__))
try:
    with open("/proc/cpuinfo") as f:
        _flags = next(ln for ln in f if ln.startswith("flags"))
except (OSError, StopIteration):
    _flags = "unknown"
_cpu_sig = hashlib.sha1(_flags.encode()).hexdigest()[:10]
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(_here, os.pardir, f".jax_cache_tests_{_cpu_sig}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
