"""Compiler options for full-graph jits on TPU.

XLA:TPU's scoped-memory placement pass stages custom-call *outputs* in
scoped VMEM (layout ``S(1)``) when they fit the scoped limit — on top of
whatever the Pallas kernel's own blocks already occupy.  At the default
16 MB limit this aborts compiles that the kernels themselves were carefully
sized for (measured round 4, real v5e):

* the flash RPE forward under ``jvp`` returns (out f32 12.6 MB, rowmax,
  rowsum) — XLA stacked the tuple in scoped VMEM and blew the limit by
  0.7-1.0 MB (``rpe_attention.py:222``);
* the KITTI-shape Sinkhorn output (256, 129, 129) f32 = 17.04 MB was
  scoped-allocated whole, exceeding the limit on its own
  (``sinkhorn.py:104``).

v5e has 128 MB of VMEM; raising the scoped limit to 64 MB gives the
placement pass and the kernels disjoint headroom.  The flag is a
DebugOptions field, so it forwards through the remote-compile relay
per-compile, and XLA:CPU accepts (and ignores) it — safe for the CPU test
suite and the multichip dryrun.
"""

from __future__ import annotations

SCOPED_VMEM_KIB = 65536

#: pass as ``jax.jit(..., compiler_options=MODEL_JIT_OPTIONS)`` on any jit
#: whose graph contains Pallas kernels at production shapes (serving
#: forward, train step, profiling prefixes).
MODEL_JIT_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB}
