"""Basic problem fixtures mirroring the reference test battery
(``/root/reference/test/runtests.jl:56-100``, ``test/mgh01con.jl``,
``test/noFHess-model.jl`` and the README example)."""

from __future__ import annotations

import jax.numpy as jnp

from ..problem import NLSProblem, nls_problem

__all__ = [
    "readme_example",
    "mgh01",
    "mgh01con",
    "mgh01_nofhess",
    "hs6",
    "linear_nls",
    "rosenbrock_nls",
    "chained_rosenbrock",
    "underdetermined",
    "constrained",
]


def readme_example(n: int = 3) -> NLSProblem:
    """ADNLSModel(x -> x, ones(3), 3) — reference doctest (CaNNOLeS.jl:159-168)."""
    return nls_problem(lambda x: x, jnp.ones(n), n, name="readme")


def rosenbrock_nls(x0=(-1.2, 1.0)) -> NLSProblem:
    return nls_problem(
        lambda x: jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)]),
        jnp.asarray(x0, dtype=float),
        2,
        name="MGH01",
    )


mgh01 = rosenbrock_nls


def mgh01con() -> NLSProblem:
    """Constrained Rosenbrock: F = [1-x1; 10(x2-x1²)], c: x1 = 0.5
    (reference test/mgh01con.jl:23-283 — the hand-coded protocol fixture)."""
    return nls_problem(
        lambda x: jnp.array([1 - x[0], 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
        lambda x: jnp.array([x[0] - 0.5]),
        [0.0],
        [0.0],
        name="MGH01CON",
    )


def mgh01_nofhess() -> NLSProblem:
    """Rosenbrock declaring no residual-Hessian capability
    (reference test/noFHess-model.jl:26-98)."""
    return nls_problem(
        lambda x: jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
        has_residual_hessian=False,
        name="MGH01_noFHess",
    )


def hs6(x0=(-1.2, 1.0)) -> NLSProblem:
    """HS6: min ½(x1-1)² s.t. 10(x2-x1²)=0 (reference runtests.jl:116-125)."""
    return nls_problem(
        lambda x: jnp.array([x[0] - 1]),
        jnp.asarray(x0, dtype=float),
        1,
        lambda x: jnp.array([10 * (x[1] - x[0] ** 2)]),
        [0.0],
        [0.0],
        name="HS6",
    )


def linear_nls() -> NLSProblem:
    return nls_problem(
        lambda x: jnp.array([x[0] - 2, x[1] - 3]), -jnp.ones(2), 2, name="linear"
    )


def chained_rosenbrock(n: int = 10, x0_scale: float = 0.9) -> NLSProblem:
    def F(x):
        return jnp.concatenate([10 * (x[1:] - x[:-1] ** 2), x[:-1] - 1])

    return nls_problem(F, x0_scale * jnp.ones(n), 2 * (n - 1), name=f"chained_rosenbrock_{n}")


def underdetermined(n: int = 10, level: float = 1.0) -> NLSProblem:
    def F(x):
        return x[0] - x[1:]

    return nls_problem(F, level * jnp.ones(n), n - 1, name=f"underdetermined_{n}")


def constrained(base: NLSProblem, kind: str = "linear") -> NLSProblem:
    """Attach the reference's test constraints to an unconstrained fixture:
    'linear': sum(x)=1;  'quad': [sum(x²)-5; prod(x)-2]."""
    if kind == "linear":
        c = lambda x: jnp.array([jnp.sum(x) - 1])
        p = 1
    elif kind == "quad":
        c = lambda x: jnp.array([jnp.sum(x**2) - 5, jnp.prod(x) - 2])
        p = 2
    else:
        raise ValueError(kind)
    return nls_problem(
        lambda x, d: base.residual(x, d),
        base.x0,
        base.nequ,
        c,
        jnp.zeros(p),
        jnp.zeros(p),
        data=base.data,
        name=f"{base.name}+{kind}",
    )
