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
_COMPUTE_DTYPE = None  # None = float32 activations


def feature() -> jax.lax.Precision:
    return _FEATURE


def compute_dtype():
    """Activation dtype for feature math (None -> float32).

    Set per-model at trace time (``SE3ETModel.__call__``); parameters stay
    fp32, normalization statistics and softmax always run in fp32.
    """
    return _COMPUTE_DTYPE


def set_compute_dtype(dtype_name) -> None:
    global _COMPUTE_DTYPE
    import jax.numpy as jnp

    if dtype_name in (None, "float32", "fp32"):
        _COMPUTE_DTYPE = None
    elif dtype_name in ("bfloat16", "bf16"):
        _COMPUTE_DTYPE = jnp.bfloat16
    else:
        raise ValueError(dtype_name)


def cast_feature(x):
    """Cast an activation tensor to the compute dtype (no-op in fp32 mode)."""
    return x if _COMPUTE_DTYPE is None else x.astype(_COMPUTE_DTYPE)


def set_feature_precision(mode: str) -> None:
    global _FEATURE
    _FEATURE = {
        "default": jax.lax.Precision.DEFAULT,
        "bf16": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
        "float32": jax.lax.Precision.HIGHEST,
    }[mode]
