"""XLA:CPU persistent-cache health probe.

The cache stores AOT machine code. This VM live-migrates across CPU SKUs
without rebooting, and XLA's LLVM target features (e.g.
``+prefer-no-scatter``/``+prefer-no-gather``) are tuning decisions that no
CPUID-leaf signature captures — a stale entry can SIGABRT/SIGILL the loading
process mid-suite (round-3 AND round-4 incidents).  A crash cannot be caught
in-process, so the probe runs in a throwaway SUBPROCESS (``python
_cache_canary.py <cache_dir>``): it compiles and EXECUTES a fixed canary
function (stable cache key across sessions) against the suite's cache dir.
On the second and later sessions this loads last session's entry — exactly
the operation that crashes on a stale cache.

:func:`ensure_cache_healthy` is the in-process driver conftest.py calls:
wipes the cache dir unless the probe prints ``CANARY_OK`` and exits 0 with
no machine-feature-mismatch error on stderr.

The canary body includes a gather, a scatter, and a dot so the generated
code touches the vector paths the ``prefer-no-*`` tuning features steer.
"""

import os
import sys

_MISMATCH_MARKER = "doesn't match the machine type"


def ensure_cache_healthy(cache_dir: str, timeout: float = 240.0) -> str:
    """Probe ``cache_dir`` with the canary subprocess; wipe it if poisoned.

    Returns ``"ok"`` (probe passed; also the first-session case, where the
    probe run seeds the canary entry) or ``"wiped"`` (probe crashed, failed,
    or logged an XLA machine-feature mismatch — the dir was deleted and
    re-seeded by a second probe run).  Never raises on a poisoned cache:
    the crash happens in the subprocess, not the test session.
    """
    import shutil
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    argv = [sys.executable, os.path.join(here, "_cache_canary.py"), cache_dir]

    def probe():
        try:
            return subprocess.run(
                argv, capture_output=True, text=True, timeout=timeout
            )
        except subprocess.TimeoutExpired:
            return None

    p = probe()
    ok = (
        p is not None
        and p.returncode == 0
        and "CANARY_OK" in p.stdout
        and _MISMATCH_MARKER not in p.stderr
    )
    if ok:
        return "ok"
    shutil.rmtree(cache_dir, ignore_errors=True)
    probe()  # re-seed the canary entry in the fresh dir (best effort)
    return "wiped"


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", sys.argv[1])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def canary(x, idx, upd):
        g = x[idx]  # gather
        y = x.at[idx].add(upd)  # scatter
        return (g @ g.T).sum() + y.sum()  # dot

    x = jnp.arange(64.0 * 8).reshape(64, 8)
    idx = jnp.asarray(np.arange(0, 64, 2, dtype=np.int32))
    out = float(canary(x, idx, jnp.ones((32, 8))))
    assert np.isfinite(out), out
    print("CANARY_OK", out)


if __name__ == "__main__":
    main()
