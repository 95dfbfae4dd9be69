"""Multiprecision tests (reference test/runtests.jl:102-113): the whole
solver runs in float32 and float64 with eps-derived tolerances
max(1e-4, eps^0.25)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import CaNNOLeSSolver, nls_problem


def F_Rosen(x):
    return jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)])


def c_linear(x):
    return jnp.array([jnp.sum(x) - 1])


@pytest.mark.parametrize("linsolve", ["ldlt", "eigh"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_multiprecision(dtype, linsolve):
    x0 = jnp.array([-1.2, 1.0], dtype=dtype)
    nls = nls_problem(F_Rosen, x0, 2, c_linear, [0.0], [0.0])
    solver = CaNNOLeSSolver(nls, linsolve=linsolve, dtype=dtype)
    stats = solver.solve(x0=x0)
    eps = float(jnp.finfo(dtype).eps)
    tol = max(1e-4, eps**0.25)
    assert np.allclose(stats.solution, [0.6188, 0.3812], atol=tol), (
        stats.status, stats.solution)
    assert np.asarray(stats.solution).dtype == np.dtype(dtype)
