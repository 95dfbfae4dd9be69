"""Condensed (Schur) KKT backend: must reproduce the full-KKT trajectory
(identical inertia decisions by the Schur complement identity
In(W) = In(K) + (0, m, 0)) while factorizing only an (n+p)-square system."""

import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import CaNNOLeSSolver, cannoles, nls_problem


def F_Rosen(x):
    return jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)])


def c_linear(x):
    return jnp.array([jnp.sum(x) - 1])


def c_quad(x):
    return jnp.array([jnp.sum(x**2) - 5, jnp.prod(x) - 2])


CASES = [
    ("rosen_unc", F_Rosen, None, [-1.2, 1.0], [1.0, 1.0]),
    ("rosen_lin", F_Rosen, c_linear, [-1.2, 1.0], [0.6188, 0.3812]),
    ("rosen_quad", F_Rosen, c_quad, [0.9, 1.9], [1.0, 2.0]),
]


@pytest.mark.parametrize("name,F,c,x0,xf", CASES, ids=[c[0] for c in CASES])
def test_condensed_matches_full(name, F, c, x0, xf):
    x0 = jnp.asarray(x0)
    if c is None:
        nls = nls_problem(F, x0, len(F(x0)))
    else:
        m = len(c(x0))
        nls = nls_problem(F, x0, len(F(x0)), c, np.zeros(m), np.zeros(m))
    full = cannoles(nls, kkt="full")
    cond = cannoles(nls, kkt="condensed")
    assert full.status == cond.status == "first_order"
    # the two factorization seams may take different rho paths (same as the
    # reference's ma57-vs-ldlfactorizations seam) — compare outcomes, not
    # bit-exact trajectories
    assert abs(full.iter - cond.iter) <= 2, (full.iter, cond.iter)
    assert np.allclose(full.solution, xf, atol=1e-4)
    assert np.allclose(cond.solution, xf, atol=1e-4)


def test_condensed_large_m():
    """m >> n regime: condensed factorizes (n+p)² instead of (n+m+p)²."""
    t = jnp.linspace(0, 1, 400)
    y = 2.5 * jnp.exp(-1.3 * t)

    def F(x):
        return x[0] * jnp.exp(-x[1] * t) - y

    nls = nls_problem(F, jnp.array([1.0, 0.0]), 400)
    for method in ("newton", "gauss_newton", "lm"):
        stats = cannoles(nls, kkt="condensed", method=method)
        assert stats.status in ("first_order", "small_residual")
        assert np.allclose(stats.solution, [2.5, 1.3], atol=1e-5), (method, stats.solution)


def test_condensed_in_batch():
    from cannoles_tpu.parallel.batch import vsolve

    def residual(x, d):
        return jnp.array([x[0] - d[0], 10 * (x[1] - x[0] ** 2)])

    pb = nls_problem(
        residual, jnp.array([-1.2, 1.0]), 2,
        lambda x, d: jnp.array([x[0] + x[1] - d[1]]), [0.0], [0.0],
        data=jnp.ones((2,)),
    )
    solver = CaNNOLeSSolver(pb, method="lm", kkt="condensed")
    B = 8
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(scale=0.2, size=(B, 2)) + np.array([-1.2, 1.0]))
    res = vsolve(pb, x0s, data_batch=jnp.ones((B, 2)), solver=solver)
    assert res.solved_mask().all(), res.summary()
