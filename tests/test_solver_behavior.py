"""Callback, re-solve, small-residual and degraded-capability behavior
(reference test/runtests.jl:38-54, 116-214)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import CaNNOLeSSolver, cannoles, nls_problem


def _hs6():
    return nls_problem(
        lambda x: jnp.array([x[0] - 1]),
        jnp.array([-1.2, 1.0]),
        1,
        lambda x: jnp.array([10 * (x[1] - x[0] ** 2)]),
        [0.0],
        [0.0],
        name="HS6",
    )


def test_callback_user_stop():
    """Stop at iteration 4 via stats.status = 'user' (runtests.jl:38-54)."""
    nls = nls_problem(
        lambda x: jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
        lambda x: jnp.array([x[0] * x[1] - 1]),
        [0.0],
        [0.0],
    )

    def cb(problem, state, stats):
        if stats.iter == 4:
            stats.status = "user"

    stats = cannoles(nls, callback=cb)
    assert stats.status == "user"
    assert stats.iter == 4


def test_resolve_new_x0():
    """Same solver, new initial guess (runtests.jl:116-138)."""
    nls = _hs6()
    solver = CaNNOLeSSolver(nls)
    stats = solver.solve()
    assert stats.status == "first_order"
    assert np.allclose(stats.solution, [1.0, 1.0], atol=1e-6)

    stats = solver.solve(x0=jnp.full(2, 10.0))
    assert stats.status == "first_order"
    assert np.allclose(stats.solution, [1.0, 1.0], atol=1e-6)


def test_resolve_different_problem_same_dims():
    """Different problem of identical dimensions (runtests.jl:173-203)."""
    nls = _hs6()
    solver = CaNNOLeSSolver(nls)
    stats = solver.solve()
    assert np.allclose(stats.solution, [1.0, 1.0], atol=1e-6)

    nls2 = nls_problem(
        lambda x: jnp.array([x[0]]),
        jnp.array([-1.2, 1.0]),
        1,
        lambda x: jnp.array([10 * (x[1] - x[0] ** 2)]),
        [0.0],
        [0.0],
        name="shifted HS6",
    )
    solver2 = solver.reset(nls2)
    stats = solver2.solve()
    assert stats.status == "first_order"
    assert np.allclose(stats.solution, [0.0, 0.0], atol=1e-6)


def test_small_residual_status():
    """HS6 driven to small_residual with Fatol=1e-6 (runtests.jl:140-171)."""
    nls = _hs6()
    stats = cannoles(nls, atol=1e-15, rtol=0.0, Fatol=1e-6, Frtol=0.0)
    assert stats.status == "small_residual"
    assert abs(stats.objective) < 1e-6

    # from a near-solution start
    stats = cannoles(
        nls, x=jnp.array([0.99999, 0.99999]), atol=1e-15, rtol=0.0, Fatol=1e-6, Frtol=0.0
    )
    assert stats.status == "small_residual"
    assert abs(stats.objective) < 1e-6


def test_nofhess_model():
    """A problem without residual-Hessian support solves with gauss_newton
    and errors with the default newton (runtests.jl:205-214)."""
    nls = nls_problem(
        lambda x: jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
        has_residual_hessian=False,
        name="MGH01_noFHess",
    )
    stats = cannoles(nls, method="gauss_newton")
    assert np.allclose(stats.solution, [1.0, 1.0], atol=1e-6)
    stats = cannoles(nls, method="Newton_noFHess")  # reference alias
    assert np.allclose(stats.solution, [1.0, 1.0], atol=1e-6)
    with pytest.raises(NotImplementedError):
        cannoles(nls)


def test_solver_specific_counters():
    nls = _hs6()
    stats = cannoles(nls)
    sp = stats.solver_specific
    assert sp["nlinsolve"] > 0
    assert sp["nfact"] >= sp["nlinsolve"]
    assert sp["neval_residual"] > 0
    assert sp["internal_msg"] == ""


def test_warm_start_with_multiplier():
    nls = nls_problem(
        lambda x: jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
        lambda x: jnp.array([x[0] + x[1] - 1]),
        [0.0],
        [0.0],
    )
    solver = CaNNOLeSSolver(nls, use_initial_multiplier=True)
    # start near the optimum with the (near-)optimal multiplier: must converge
    # to a first-order point that is primal-feasible
    stats = solver.solve(x0=jnp.array([0.62, 0.38]), lam0=jnp.array([-0.17]))
    assert stats.status == "first_order"
    assert stats.primal_feas < 1e-6
    assert np.allclose(stats.solution, [0.6188, 0.3812], atol=1e-3)


def test_newton_vanishing_drops_hessian_term():
    """newton_vanishing: the second-order term Σrᵢ∇²Fᵢ must drop once
    ‖F‖² ≤ 1e-8 (documented semantics, hessian_approx.jl:55-60 — a
    deliberate deviation from the reference, whose Newton_vanishing ctor
    returns plain Newton; see PARITY.md)."""
    nls = nls_problem(
        lambda x: jnp.array([x[0] ** 2 - 1, x[1]]),
        jnp.array([2.0, 1.0]),
        2,
        name="vanishing_probe",
    )
    sv = CaNNOLeSSolver(nls, method="newton_vanishing")
    sn = CaNNOLeSSolver(nls, method="newton")
    x = jnp.array([2.0, 1.0])
    lam = jnp.zeros((0,))
    damp = jnp.ones(())

    # far from the solution: ‖F‖² > 1e-8 ⇒ identical exact-Newton block
    F_big = nls.F(x, None)
    r_big = F_big
    H_v = sv._H_block(x, lam, r_big, F_big, nls.J(x, None), damp, None)
    H_n = sn._H_block(x, lam, r_big, F_big, nls.J(x, None), damp, None)
    assert np.allclose(H_v, H_n)
    assert float(jnp.abs(H_n).max()) > 0  # the term is genuinely nonzero

    # inside the small-residual region: the block must vanish even though
    # the SAME r would give a nonzero Σrᵢ∇²Fᵢ contraction
    F_small = jnp.array([3e-5, 3e-5])  # ‖F‖² = 1.8e-9 ≤ 1e-8
    H_v = sv._H_block(x, lam, r_big, F_small, nls.J(x, None), damp, None)
    H_n = sn._H_block(x, lam, r_big, F_small, nls.J(x, None), damp, None)
    assert np.allclose(H_v, 0.0)
    assert float(jnp.abs(H_n).max()) > 0

    # end-to-end: the method drives the zero-residual problem through the
    # switch to the solution
    stats = cannoles(nls, method="newton_vanishing")
    assert stats.status in ("first_order", "small_residual")
    assert np.allclose(np.abs(stats.solution), [1.0, 0.0], atol=1e-6)
    stats = cannoles(nls, method="Newton_vanishing")  # reference alias
    assert stats.status in ("first_order", "small_residual")
