"""Compiler options for full-graph jits on TPU.

XLA:TPU's scoped-memory placement pass stages custom-call *outputs* in
scoped VMEM (layout ``S(1)``) when they fit the scoped limit — on top of
whatever the Pallas kernel's own blocks already occupy.  At the default
16 MB limit this aborts compiles that the kernels themselves were carefully
sized for (measured round 4, real v5e):

* the flash RPE forward under ``jvp`` returns (out f32 12.6 MB, rowmax,
  rowsum) — XLA stacked the tuple in scoped VMEM and blew the limit by
  0.7-1.0 MB (``rpe_attention.py:222``), killing every training compile;
* the KITTI-shape Sinkhorn output (256, 129, 129) f32 = 17.04 MB was
  scoped-allocated whole, exceeding the limit on its own
  (``sinkhorn.py:104``).

v5e has 128 MB of VMEM, so raising the scoped limit to 64 MB fixes both —
but it is NOT free: the placement pass uses the extra headroom on the
flagship serving graph too, measured +3.4 ms/pair (71.7 vs 68.3 back-to-
back, round 4).  So the bump is scoped: always on for training graphs
(they cannot compile without it), and on for serving only when a kernel
output alone approaches the 16 MB limit (KITTI's 129x129 patch matrices).

``xla_tpu_scoped_vmem_limit_kib`` is a TPU-only DebugOptions field:
XLA:CPU **rejects** it with ``INVALID_ARGUMENT: No such compile option``
(round-4 shipped regression — every CPU Trainer run died).  The option is
therefore gated on the live backend: these helpers return ``{}`` unless
``jax.default_backend() == "tpu"``.  The backend check is made lazily at
jit-construction time (never at import), so importing this module can
never initialize the TPU backend in a process that does not compute.

``SE3ET_SCOPED_VMEM_KIB`` overrides the limit for A/B runs on TPU
(0 = never pass the option); the platform gate wins over the override —
a CPU run ignores the env var entirely.
"""

from __future__ import annotations

import os

_ENV = os.environ.get("SE3ET_SCOPED_VMEM_KIB")
SCOPED_VMEM_KIB = int(_ENV) if _ENV is not None else 65536


def _is_tpu() -> bool:
    """True iff the default JAX backend is TPU.

    Called only from the ``*_jit_options`` helpers, which in turn are called
    right where a jit is being built for imminent execution — so resolving
    the backend here never initializes a backend that was not about to be
    initialized anyway.
    """
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover — no backend available at all
        return False


def _opts(needed: bool) -> dict:
    if not _is_tpu():
        return {}
    if _ENV is not None:  # explicit A/B override wins both ways (on TPU)
        return (
            {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB}
            if SCOPED_VMEM_KIB > 0 else {}
        )
    return {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB} if needed else {}


def train_jit_options() -> dict:
    """Options for training-graph jits (train steps, val-under-trainer,
    grad profiles): the flash RPE forward's residual tuple lands in scoped
    VMEM under ``jvp``, so TPU training graphs need the raised limit
    unconditionally.  Returns ``{}`` off-TPU."""
    return _opts(True)


def serving_jit_options(model_cfg) -> dict:
    """Serving-forward jit options for this model config.

    Bumps the scoped limit only when a Sinkhorn pallas call's staged output
    (``(num_correspondences, p+1, p+1)`` f32, ``nn/matching.py:78``) is
    close enough to 16 MB that XLA's whole-output scoped allocation can
    abort the compile.  ``_sinkhorn_fused_grad`` splits oversized batches
    across two calls (halving the staged size), so with an even
    correspondence count — every registered config — serving stays on the
    measured-faster default placement everywhere, KITTI included.
    Returns ``{}`` off-TPU.
    """
    p = int(getattr(model_cfg, "num_points_in_patch", 0)) + 1
    corr = int(getattr(model_cfg, "num_correspondences", 0))
    sinkhorn_bytes = 4 * corr * p * p
    if sinkhorn_bytes > 14e6 and corr % 2 == 0:
        sinkhorn_bytes //= 2  # the fused-sinkhorn batch split kicks in
    return _opts(sinkhorn_bytes > 14e6)
