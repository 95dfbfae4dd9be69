"""Fixed-budget CGLS least-squares solver, jit/vmap-native.

Replaces Krylov.jl's CGLS as used by the reference for the least-squares
multiplier estimate  λ = argmin ‖Jcᵀ λ − Jᵀ F‖  (Armand 2012;
``/root/reference/src/CaNNOLeS.jl:507-518, 866-897``).

The loop is a ``lax.while_loop`` with a static iteration cap so it traces
once, vmaps across instance batches (lanes that converge early are masked),
and never synchronizes with the host.  Stopping follows Krylov.jl's CGLS:
‖Bᵀr‖ ≤ atol + rtol·‖Bᵀr₀‖ with atol = rtol = √eps by default.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["cgls"]


class _CGLSCarry(NamedTuple):
    y: jax.Array
    r: jax.Array
    p: jax.Array
    gamma: jax.Array
    k: jax.Array


def cgls(
    B: jax.Array,
    b: jax.Array,
    itmax: Optional[int] = None,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
) -> jax.Array:
    """min_y ‖B y − b‖₂ for dense B (n, p); returns y (p,).

    In exact arithmetic CG on the normal equations converges in rank(B) ≤
    min(n, p) steps; the cap ``itmax`` defaults to n + p (Krylov.jl default).
    """
    n, p = B.shape
    dtype = B.dtype
    if p == 0:
        return jnp.zeros((0,), dtype=dtype)
    if itmax is None:
        itmax = n + p
    eps = float(jnp.finfo(dtype).eps)
    if atol is None:
        atol = eps**0.5
    if rtol is None:
        rtol = eps**0.5

    s0 = B.T @ b
    gamma0 = jnp.vdot(s0, s0)
    tol = atol + rtol * jnp.sqrt(gamma0)
    tol2 = tol * tol

    def cond(c: _CGLSCarry):
        return (c.k < itmax) & (c.gamma > tol2)

    def body(c: _CGLSCarry):
        q = B @ c.p
        delta = jnp.vdot(q, q)
        ok = delta > 0
        alpha = jnp.where(ok, c.gamma / jnp.where(ok, delta, 1.0), 0.0)
        y = c.y + alpha * c.p
        r = c.r - alpha * q
        s = B.T @ r
        gamma_new = jnp.vdot(s, s)
        okg = c.gamma > 0
        beta = jnp.where(okg, gamma_new / jnp.where(okg, c.gamma, 1.0), 0.0)
        pnew = s + beta * c.p
        # a zero-curvature direction means we are done; freeze the iterate
        gamma_next = jnp.where(ok, gamma_new, jnp.zeros_like(gamma_new))
        return _CGLSCarry(y, r, pnew, gamma_next, c.k + 1)

    init = _CGLSCarry(
        # zeros_like keeps s0's varying-manual-axes type so the while_loop
        # carry is vma-consistent under shard_map (fresh zeros are unvarying)
        y=jnp.zeros_like(s0),
        r=b,
        p=s0,
        gamma=gamma0,
        k=jnp.zeros((), dtype=jnp.int32),
    )
    out = lax.while_loop(cond, body, init)
    return out.y
