r"""Global matmul-precision policy.

On TPU v5e the MXU natively multiplies in bf16; ``Precision.HIGHEST`` forces
multi-pass fp32-equivalent matmuls (~6x the MXU work).  Policy:

* **Geometry math** (transforms, Procrustes, influence distances, embeddings)
  always runs at ``HIGHEST`` — registration accuracy depends on it.
* **Feature math** (conv contractions, attention scores/values, linears) runs
  at ``FEATURE_PRECISION`` — default ``Precision.DEFAULT`` (single-pass bf16
  multiply, fp32 accumulate), switchable to ``HIGHEST`` for exactness tests.

Tests that assert tight numerical equivariance bounds set
``set_feature_precision('highest')`` via the fixture in tests/conftest.py.
"""

from __future__ import annotations

import jax

GEOMETRY = jax.lax.Precision.HIGHEST
_FEATURE = jax.lax.Precision.DEFAULT


def feature() -> jax.lax.Precision:
    return _FEATURE


def set_feature_precision(mode: str) -> None:
    global _FEATURE
    _FEATURE = {
        "default": jax.lax.Precision.DEFAULT,
        "bf16": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
        "float32": jax.lax.Precision.HIGHEST,
    }[mode]
