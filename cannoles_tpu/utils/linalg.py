"""Small linear-algebra helpers that are safe for size-0 arrays.

Julia's ``norm`` returns 0 for empty vectors; ``jnp.max`` over an empty axis
errors.  Sizes are static at trace time, so these branch in Python.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["norm_inf", "norm_1", "norm_2", "check_nan_inf"]


def norm_inf(v):
    if v.size == 0:
        return jnp.zeros((), dtype=v.dtype)
    return jnp.max(jnp.abs(v))


def norm_1(v):
    if v.size == 0:
        return jnp.zeros((), dtype=v.dtype)
    return jnp.sum(jnp.abs(v))


def norm_2(v):
    if v.size == 0:
        return jnp.zeros((), dtype=v.dtype)
    return jnp.sqrt(jnp.vdot(v, v))


def check_nan_inf(v):
    """True if v contains NaN or Inf (reference CaNNOLeS.jl:899-909)."""
    if v.size == 0:
        return jnp.zeros((), dtype=bool)
    return ~jnp.all(jnp.isfinite(v))
