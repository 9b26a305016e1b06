r"""Device memory reporting (port of ``geotransformer/utils/memory.py``)."""

from __future__ import annotations

import jax


def device_mem_usage(device=None) -> float:
    """Peak/live device memory in GiB (torch.cuda.max_memory_allocated analog)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use", 0)
        return peak / (1024**3)
    except Exception:
        live = sum(
            a.nbytes for a in jax.live_arrays() if a.device == dev
        )
        return live / (1024**3)
