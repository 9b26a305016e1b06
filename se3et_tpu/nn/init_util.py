r"""Jitted model initialization.

``flax`` ``Module.init`` traces eagerly — on a remote-attached TPU every one of
the thousands of traced ops would dispatch (and compile) individually.  Jitting
the whole init produces a single compiled program.
"""

from __future__ import annotations

import functools

import jax


def jit_init(model, rngs, data, **kwargs):
    """model.init under jit (single compile); kwargs are static."""

    @functools.partial(jax.jit, static_argnames=tuple(kwargs.keys()))
    def _init(rngs, data, **kw):
        return model.init(rngs, data, **kw)

    return _init(rngs, data, **kwargs)
