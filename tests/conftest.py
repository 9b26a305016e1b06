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
# The cache dir is keyed by the LIVE host CPU identity (runtime CPUID via
# the native lib — see se3et_tpu/utils/hostsig.py): XLA:CPU AOT executables
# are machine-specific and this VM live-migrates across CPU SKUs without
# rebooting, so /proc/cpuinfo (boot-time) and boot_id both stayed constant
# while entries went stale (round-3 AND round-4 mid-suite SIGABRTs).
# Stale dirs are pruned.
import shutil  # noqa: E402
import sys  # noqa: E402

_here = os.path.dirname(os.path.abspath(__file__))
_repo_root = os.path.abspath(os.path.join(_here, os.pardir))
sys.path.insert(0, _repo_root)
from se3et_tpu.utils.hostsig import host_signature  # noqa: E402

_cpu_sig = host_signature()
_cache_name = f".jax_cache_tests_{_cpu_sig}"
for _name in os.listdir(_repo_root):
    if _name.startswith(".jax_cache_tests_") and _name != _cache_name:
        shutil.rmtree(os.path.join(_repo_root, _name), ignore_errors=True)
# The CPUID key narrows but does not close the stale-entry hole: XLA's LLVM
# tuning features (+prefer-no-scatter/-gather, observed round 4) vary across
# live-migrations that CPUID leaves don't capture, and loading such an entry
# can abort the process.  A canary SUBPROCESS compiles+executes a fixed
# function against the cache dir before the suite touches it (loading last
# session's entry is precisely the crash-prone operation); on any crash,
# failure, or feature-mismatch log, the dir is wiped and re-seeded.
from tests._cache_canary import ensure_cache_healthy  # noqa: E402

_cache_dir = os.path.join(_repo_root, _cache_name)
if ensure_cache_healthy(_cache_dir) == "wiped":
    sys.stderr.write(
        f"[conftest] poisoned XLA:CPU compile cache wiped: {_cache_dir}\n"
    )
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
