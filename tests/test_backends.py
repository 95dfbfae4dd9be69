"""End-to-end solver runs through every linear-solve backend seam:
blocked-jnp LDLᵀ, eigh (robust/pivoted analog), Pallas fused kernel
(interpret mode on CPU), and the native C++ host library."""

import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import CaNNOLeSSolver, cannoles, nls_problem
from cannoles_tpu.ops.cpp_ldlt import cpp_available


def _mgh01con():
    return nls_problem(
        lambda x: jnp.array([1 - x[0], 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
        lambda x: jnp.array([x[0] - 0.5]),
        [0.0],
        [0.0],
    )


BACKENDS = ["ldlt", "eigh", "pallas"] + (["cpp"] if cpp_available() else [])
CONDENSED_BACKENDS = BACKENDS + ["chol"]


@pytest.mark.parametrize("linsolve", BACKENDS)
def test_backend_solves_constrained(linsolve):
    stats = cannoles(_mgh01con(), linsolve=linsolve)
    assert stats.status == "first_order", (linsolve, stats.status)
    assert np.allclose(stats.solution, [0.5, 0.25], atol=1e-6), (linsolve, stats.solution)


@pytest.mark.parametrize("linsolve", CONDENSED_BACKENDS)
def test_backend_batched(linsolve):
    from cannoles_tpu.parallel.batch import vsolve

    pb = _mgh01con()
    solver = CaNNOLeSSolver(pb, linsolve=linsolve, kkt="condensed")
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(scale=0.3, size=(6, 2)) + np.array([-1.2, 1.0]))
    res = vsolve(pb, x0s, solver=solver)
    assert res.solved_mask().all(), (linsolve, res.summary())
    assert np.allclose(res.solution, [0.5, 0.25], atol=1e-6)


def test_cpp_matches_jnp_pivots():
    if not cpp_available():
        pytest.skip("no g++ toolchain")
    import jax

    from cannoles_tpu.ops.cpp_ldlt import cpp_ldlt_factor_solve
    from cannoles_tpu.ops.ldlt import inertia_success, ldlt_factor, ldlt_solve

    rng = np.random.default_rng(3)
    n = 5
    for trial in range(4):
        A = rng.normal(size=(9, 9))
        W = jnp.asarray(A + A.T + (trial - 1) * np.eye(9))
        rhs = jnp.asarray(rng.normal(size=9))
        x, ok = cpp_ldlt_factor_solve(W, rhs, n, 1e-13)
        fac = ldlt_factor(W, 1e-13)
        ok_j = inertia_success(fac.vec, fac.mat, n, 1e-13)
        assert bool(ok) == bool(ok_j)
        if bool(ok):
            xj = ldlt_solve(fac, rhs, 1e-13)
            assert np.allclose(x, xj, atol=1e-10)


def test_auto_escalation_recovers_ldlt_breakdown():
    """linsolve='auto' (cannoles default): the unpivoted LDLᵀ misjudges the
    KKT inertia on brown_almost_linear+linear (true inertia is correct at
    ρ=0 while the fixed-order pivot signs claim failure → ρ over-escalates →
    non-descent), and the *in-loop* exact-inertia eigh retry ladder — entered
    per KKT system at rho-ladder exhaustion, one solver instance, one
    compiled program — recovers first_order: the reference's two-backend
    seam (CaNNOLeS.jl:317-332) run in the fast-first direction."""
    from cannoles_tpu import CaNNOLeSSolver, cannoles
    from cannoles_tpu.models.basic import constrained
    from cannoles_tpu.models.mgh import mgh_problem

    pb = constrained(mgh_problem("brown_almost_linear"), "linear")
    fast = CaNNOLeSSolver(pb, method="newton", linsolve="ldlt").solve(
        atol=0.0, rtol=1e-5, max_time=60
    )
    assert fast.status == "exception"  # documents the ldlt-only breakdown
    stats = cannoles(pb, atol=0.0, rtol=1e-5, max_time=120)
    assert stats.status == "first_order"
