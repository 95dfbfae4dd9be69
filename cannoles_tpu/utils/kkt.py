"""Independent KKT certificates for a claimed solution.

The reference's benchmark protocol counts a problem as solved when the solver
reports ``status == :first_order`` (/root/reference/docs/src/benchmark.md:81-84),
i.e. trust-the-solver.  This module provides the stronger, solver-independent
check used by our tests and batteries: given ``(x, λ)`` it recomputes the
stationarity and feasibility residuals of

    min ½‖F(x)‖²  s.t.  c(x) = 0

directly with ``jax.grad`` on the objective — no solver internals, no shared
code path with the KKT assembly — so a bug in the solver's dual bookkeeping
cannot certify itself.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..problem import NLSProblem

__all__ = ["KKTResiduals", "kkt_residuals", "is_kkt_point"]


class KKTResiduals(NamedTuple):
    stationarity: jax.Array  # ‖∇(½‖F‖²)(x) − Jc(x)ᵀλ‖∞
    feasibility: jax.Array  # ‖c(x)‖∞
    objective: jax.Array  # ½‖F(x)‖²
    scaled_stationarity: jax.Array  # stationarity / max(1, ‖λ‖₁/p) — reference sd


def kkt_residuals(problem: NLSProblem, x, lam=None, data=None) -> KKTResiduals:
    """First-order optimality residuals at ``(x, λ)``, from scratch.

    Stationarity uses ``jax.grad`` of the scalar objective (reverse mode over
    the *user's* residual function), NOT the solver's ``Jᵀr − Jcᵀλ`` dual
    vector, so it is an independent oracle.
    """
    data = problem.data if data is None else data
    x = jnp.asarray(x)
    if lam is None:
        lam = jnp.zeros((problem.ncon,), dtype=x.dtype)
    lam = jnp.asarray(lam, dtype=x.dtype)

    def obj(z):
        Fz = problem.F(z, data)
        return 0.5 * jnp.vdot(Fz, Fz)

    g = jax.grad(obj)(x)
    if problem.ncon > 0:
        _, vjp_c = jax.vjp(lambda z: problem.c_shifted(z, data), x)
        g = g - vjp_c(lam)[0]
        feas = jnp.max(jnp.abs(problem.c_shifted(x, data)))
        sd = jnp.maximum(
            jnp.asarray(1.0, x.dtype), jnp.sum(jnp.abs(lam)) / problem.ncon
        )
    else:
        feas = jnp.zeros((), dtype=x.dtype)
        sd = jnp.asarray(1.0, x.dtype)
    stat = jnp.max(jnp.abs(g)) if g.size else jnp.zeros((), x.dtype)
    return KKTResiduals(
        stationarity=stat,
        feasibility=feas,
        objective=obj(x),
        scaled_stationarity=stat / sd,
    )


def is_kkt_point(problem: NLSProblem, x, lam=None, *, tol=1e-5, data=None) -> bool:
    """True iff ``(x, λ)`` satisfies the first-order conditions to ``tol``
    (scaled stationarity + feasibility, both ∞-norm)."""
    r = kkt_residuals(problem, x, lam, data=data)
    return bool((r.scaled_stationarity <= tol) & (r.feasibility <= tol))
