"""Host-identity signature for keying XLA:CPU persistent compile caches.

XLA:CPU AOT cache entries embed LLVM ``getHostCPUFeatures``-derived target
features; loading an entry compiled on a different microarchitecture aborts
the process (SIGABRT/SIGILL).  This VM **live-migrates across CPU SKUs
without rebooting**: ``/proc/cpuinfo`` (populated at boot) and the kernel
``boot_id`` both stay constant while the CPUID the compiler actually sees
changes — round-4 evidence: AOT entries written hours earlier in the *same
boot* under the *same cpuinfo-flags hash* failed to load with
``+prefer-no-scatter/+prefer-no-gather`` feature mismatches, and one aborted
the test suite mid-run.

:func:`host_signature` therefore hashes LIVE CPUID (via the native lib's
``se3et_cpuid_signature``) when available, falling back to the old
cpuinfo-flags + boot_id scheme.  Import-safe before jax (no jax imports).
"""

from __future__ import annotations

import ctypes
import hashlib
import os


def _cpuid_string() -> str | None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libse3et_native.so",
    )
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        fn = lib.se3et_cpuid_signature
    except (OSError, AttributeError):
        return None
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int]
    fn.restype = ctypes.c_int
    buf = ctypes.create_string_buffer(160)
    if fn(buf, 160) <= 0:
        return None
    return buf.value.decode("ascii", "replace")


def _proc_string() -> str:
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            parts.append(next(ln for ln in f if ln.startswith("flags")))
    except (OSError, StopIteration):
        parts.append("unknown-flags")
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f.read().strip())
    except OSError:
        parts.append("unknown-boot")
    return "|".join(parts)


def host_signature() -> str:
    """10-hex-char digest of the live host CPU identity."""
    s = _cpuid_string()
    if s is None:
        s = _proc_string()
    return hashlib.sha1(s.encode()).hexdigest()[:10]
