"""Scalable equality-constrained NLS battery in the Lukšan–Vlček style.

The reference's benchmark protocol draws on NLSProblems.jl, whose constrained
members (the ``LVcon`` family) come from L. Lukšan & J. Vlček, *Sparse and
partially separable test problems for unconstrained and equality constrained
optimization*, ICS AS CR technical report 767 (1999): a chained partially
separable least-squares objective paired with a classic nonlinear-equation
family as equality constraints, both scalable in n.  This module provides
that capability class rebuilt for this framework — chained NLS objectives ×
{trigonometric-exponential, Broyden tridiagonal, Broyden banded} constraint
systems — vectorized (gather/slice form, no Python loops over n) so a single
compiled solve scales from n=10 unit tests to n≫10⁴ through the matrix-free
and row-sharded paths.

Because these are re-derived from the report's problem classes rather than
transcribed, tests certify solutions with the solver-independent KKT oracle
(:mod:`cannoles_tpu.utils.kkt`) — the same "solved ⇔ first-order" criterion
as the reference protocol (/root/reference/docs/src/benchmark.md:81-84) but
checked from scratch.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..problem import NLSProblem, nls_problem

__all__ = ["lvcon_problem", "lvcon_suite", "LVCON_NAMES", "LVConSpec"]


class LVConSpec(NamedTuple):
    name: str
    build: Callable[[int], NLSProblem]
    default_n: int


# ----------------------------------------------------------------------
# chained least-squares objectives (residual vectors)
# ----------------------------------------------------------------------
def _res_chained_rosenbrock(x):
    # sum_{i<n} 100(x_i^2 - x_{i+1})^2 + (x_i - 1)^2
    return jnp.concatenate([10.0 * (x[:-1] ** 2 - x[1:]), x[:-1] - 1.0])


def _res_chained_wood(x):
    # overlapping Wood groups on (x_i..x_{i+3}), i = 1, 3, 5, ... (odd)
    a, b, c, d = x[0:-3:2], x[1:-2:2], x[2:-1:2], x[3::2]
    s90, s10 = float(np.sqrt(90.0)), float(np.sqrt(10.0))
    return jnp.concatenate(
        [
            10.0 * (a**2 - b),
            a - 1.0,
            s90 * (c**2 - d),
            c - 1.0,
            s10 * (b + d - 2.0),
            (b - d) / s10,
        ]
    )


def _res_chained_powell(x):
    # overlapping Powell-singular groups on (x_i..x_{i+3}), i odd
    a, b, c, d = x[0:-3:2], x[1:-2:2], x[2:-1:2], x[3::2]
    s5, s10 = float(np.sqrt(5.0)), float(np.sqrt(10.0))
    return jnp.concatenate(
        [a + 10.0 * b, s5 * (c - d), (b - 2.0 * c) ** 2, s10 * (a - d) ** 2]
    )


def _res_chained_exponential(x):
    # smooth Cragg–Levy-flavored chain: quartic/cubic powers as residuals
    a, b = x[:-1], x[1:]
    return jnp.concatenate([(jnp.exp(a) - b) ** 2, 10.0 * (b - 1.0)])


# ----------------------------------------------------------------------
# constraint systems on interior nodes k = 2..n-1 (1-based), p = n-2
# ----------------------------------------------------------------------
def _cons_trigexp(x):
    xm, xk, xp = x[:-2], x[1:-1], x[2:]
    return (
        3.0 * xk**3
        + 2.0 * xp
        - 5.0
        + jnp.sin(xk - xp) * jnp.sin(xk + xp)
        + 4.0 * xk
        - xm * jnp.exp(xm - xk)
        - 3.0
    )


def _cons_broyden_tridiag(x):
    xm, xk, xp = x[:-2], x[1:-1], x[2:]
    return (3.0 - 2.0 * xk) * xk - xm - 2.0 * xp + 1.0


def _cons_broyden_banded(x):
    # c_k = (2+5x_k^2)x_k + 1 + sum_{i in J_k} x_i(1+x_i),
    # J_k = {max(1,k-lo)..min(n,k+hi)} \ {k}; interior rows only (p = n-2).
    lo, hi = 5, 1
    n = x.shape[0]
    y = x * (1.0 + x)
    csum = jnp.cumsum(y)

    def window_sum(k):  # sum of y over [k-lo, k+hi] clipped, 0-based k
        loi = jnp.clip(k - lo, 0, n - 1)
        hii = jnp.clip(k + hi, 0, n - 1)
        return csum[hii] - jnp.where(loi > 0, csum[loi - 1], 0.0)

    ks = jnp.arange(1, n - 1)
    s = jnp.vectorize(window_sum)(ks) - y[ks]
    return (2.0 + 5.0 * x[ks] ** 2) * x[ks] + 1.0 + s


# ----------------------------------------------------------------------
# assembled problems
# ----------------------------------------------------------------------
def _even(n: int) -> int:
    n = max(int(n), 6)
    return n if n % 2 == 0 else n + 1


def _make(name, res_fn, cons_fn, x0, n) -> NLSProblem:
    m = int(res_fn(jnp.asarray(x0)).shape[0])
    p = n - 2
    return nls_problem(
        res_fn,
        jnp.asarray(x0),
        m,
        cons_fn,
        jnp.zeros((p,)),
        jnp.zeros((p,)),
        name=f"{name}_{n}",
    )


def lvcon_rosenbrock_trigexp(n: int = 10) -> NLSProblem:
    """Chained Rosenbrock objective, trigonometric-exponential constraints
    (LV TR-767 class 5.1)."""
    n = max(int(n), 4)
    x0 = np.where(np.arange(n) % 2 == 0, -1.2, 1.0)
    return _make("lvcon_rosenbrock_trigexp", _res_chained_rosenbrock, _cons_trigexp, x0, n)


def lvcon_wood_broyden(n: int = 12) -> NLSProblem:
    """Chained Wood objective, Broyden-tridiagonal constraints
    (LV TR-767 class 5.2)."""
    n = _even(n)
    x0 = np.where(np.arange(n) % 2 == 0, -3.0, -1.0)
    return _make("lvcon_wood_broyden", _res_chained_wood, _cons_broyden_tridiag, x0, n)


def lvcon_powell_banded(n: int = 12) -> NLSProblem:
    """Chained Powell-singular objective, Broyden-banded constraints
    (LV TR-767 class 5.3)."""
    n = _even(n)
    x0 = np.full(n, 0.5)  # banded system is mildly nonlinear; start near 0
    x0[::2] = -0.5
    return _make("lvcon_powell_banded", _res_chained_powell, _cons_broyden_banded, x0, n)


def lvcon_exponential_tridiag(n: int = 10) -> NLSProblem:
    """Chained exponential objective, Broyden-tridiagonal constraints
    (LV TR-767 class 5.4 flavor)."""
    n = max(int(n), 4)
    x0 = np.full(n, 0.5)  # x0=0 puts the trig-exp extrapolation step outside
    # the exp() range in the first iteration; 0.5 is the report's spirit
    # (interior, away from the solution) and solves for every method
    return _make(
        "lvcon_exponential_tridiag", _res_chained_exponential, _cons_broyden_tridiag, x0, n
    )


def lvcon_rosenbrock_tridiag(n: int = 10) -> NLSProblem:
    """Chained Rosenbrock objective, Broyden-tridiagonal constraints
    (LV TR-767 class 5.5 flavor)."""
    n = max(int(n), 4)
    x0 = np.where(np.arange(n) % 2 == 0, -1.2, 1.0)
    return _make(
        "lvcon_rosenbrock_tridiag", _res_chained_rosenbrock, _cons_broyden_tridiag, x0, n
    )


_SUITE: List[LVConSpec] = [
    LVConSpec("lvcon_rosenbrock_trigexp", lvcon_rosenbrock_trigexp, 10),
    LVConSpec("lvcon_wood_broyden", lvcon_wood_broyden, 12),
    LVConSpec("lvcon_powell_banded", lvcon_powell_banded, 12),
    LVConSpec("lvcon_exponential_tridiag", lvcon_exponential_tridiag, 10),
    LVConSpec("lvcon_rosenbrock_tridiag", lvcon_rosenbrock_tridiag, 10),
]

LVCON_NAMES = [s.name for s in _SUITE]


def lvcon_problem(name: str, n: int = 0) -> NLSProblem:
    for s in _SUITE:
        if s.name == name:
            return s.build(n or s.default_n)
    raise KeyError(f"unknown LVcon problem {name!r}; have {LVCON_NAMES}")


def lvcon_suite(n: int = 0) -> List[NLSProblem]:
    return [s.build(n or s.default_n) for s in _SUITE]
