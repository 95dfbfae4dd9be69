"""Convergence suites (reference test/runtests.jl:56-113): unconstrained and
constrained problem batteries against known solutions, over both linear-solve
backends."""

import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import cannoles, nls_problem

N = 10


def F_linear(x):
    return jnp.array([x[0] - 2, x[1] - 3])


def F_Rosen(x):
    return jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)])


def F_larger(x, n):
    return jnp.concatenate(
        [jnp.array([10 * (x[i + 1] - x[i] ** 2) for i in range(n - 1)]),
         jnp.array([x[i] - 1 for i in range(n - 1)])]
    )


def F_under(x, n):
    return jnp.array([x[0] - x[i] for i in range(1, n)])


def c_linear(x):
    return jnp.array([jnp.sum(x) - 1])


def c_quad(x):
    return jnp.array([jnp.sum(x**2) - 5, jnp.prod(x) - 2])


UNCONSTRAINED = [
    (F_linear, -np.ones(2), [2.0, 3.0]),
    (F_Rosen, np.array([-1.2, 1.0]), np.ones(2)),
    (lambda x: F_larger(x, N), 0.9 * np.ones(N), np.ones(N)),
] + [(lambda x, i=i: F_under(x, N), i * np.ones(N), i * np.ones(N)) for i in range(1, 6)]

CONSTRAINED = [
    (F_linear, c_linear, -np.ones(2), [0.0, 1.0]),
    (F_Rosen, c_linear, np.array([-1.2, 1.0]), [0.6188, 0.3812]),
    (lambda x: F_under(x, N), c_linear, np.arange(1.0, N + 1) / N, np.full(N, 1.0 / N)),
    (F_linear, c_quad, np.array([0.9, 1.9]), [1.0, 2.0]),
    (F_Rosen, c_quad, np.array([0.9, 1.9]), [1.0, 2.0]),
    (lambda x: F_larger(x, 3), c_quad, np.array([0.5, 1.0, 1.5]), [1.0647, 1.215, 1.546]),
]


@pytest.mark.parametrize("linsolve", ["ldlt", "eigh"])
@pytest.mark.parametrize("idx", range(len(UNCONSTRAINED)))
def test_unconstrained(idx, linsolve):
    F, x0, xf = UNCONSTRAINED[idx]
    x0 = jnp.asarray(x0)
    nls = nls_problem(F, x0, len(F(x0)))
    stats = cannoles(nls, linsolve=linsolve)
    assert np.allclose(stats.solution, xf, atol=1e-4), (stats.status, stats.solution)


@pytest.mark.parametrize("linsolve", ["ldlt", "eigh"])
@pytest.mark.parametrize("idx", range(len(CONSTRAINED)))
def test_constrained(idx, linsolve):
    F, c, x0, xf = CONSTRAINED[idx]
    x0 = jnp.asarray(x0)
    m = len(c(x0))
    nls = nls_problem(F, x0, len(F(x0)), c, np.zeros(m), np.zeros(m))
    stats = cannoles(nls, linsolve=linsolve)
    assert np.allclose(stats.solution, xf, atol=1e-4), (stats.status, stats.solution)


@pytest.mark.parametrize("method", ["newton", "gauss_newton", "lm", "newton_vanishing"])
def test_methods_on_constrained_rosenbrock(method):
    nls = nls_problem(F_Rosen, jnp.array([-1.2, 1.0]), 2, c_linear, [0.0], [0.0])
    stats = cannoles(nls, method=method)
    assert np.allclose(stats.solution, [0.6188, 0.3812], atol=1e-4), (
        method, stats.status, stats.solution)


def test_f_and_j_matches_separate_calls():
    """F_and_J (linearize-once) must agree exactly with F and jacfwd-J."""
    import jax.numpy as jnp
    import numpy as np
    from cannoles_tpu import nls_problem

    pb = nls_problem(
        lambda x, d: jnp.array([x[0] - d[0], 10 * (x[1] - x[0] ** 2), x[0] * x[1]]),
        jnp.array([-1.2, 1.0]),
        3,
        data=jnp.array([2.0]),
    )
    x = jnp.array([0.3, -0.7])
    F1 = pb.F(x, pb.data)
    J1 = pb.J(x, pb.data)
    F2, J2 = pb.F_and_J(x, pb.data)
    assert np.array_equal(np.asarray(F1), np.asarray(F2))
    assert np.allclose(np.asarray(J1), np.asarray(J2), atol=0, rtol=0)
    assert J2.shape == (3, 2)

    # analytic-override path returns the override verbatim
    pb2 = nls_problem(
        lambda x: x * 2.0, jnp.ones(2), 2,
        jac_residual=lambda x, d: 2.0 * jnp.eye(2),
    )
    F3, J3 = pb2.F_and_J(jnp.ones(2), None)
    assert np.allclose(np.asarray(J3), 2 * np.eye(2))
