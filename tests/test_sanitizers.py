"""Sanitizer-style checks (SURVEY.md §5 race-detection analog): tracer-leak
detection around the compiled steps and NaN-robustness of the breakdown
paths."""

import jax
import jax.numpy as jnp
import numpy as np

from cannoles_tpu import CaNNOLeSSolver, nls_problem


def _pb():
    return nls_problem(
        lambda x: jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
        lambda x: jnp.array([jnp.sum(x) - 1]),
        [0.0],
        [0.0],
    )


def test_no_tracer_leaks():
    solver = CaNNOLeSSolver(_pb())
    with jax.checking_leaks():
        stats = solver.solve()
    assert stats.status == "first_order"


def test_breakdown_paths_stay_finite():
    """Singular/indefinite KKT moments must be handled by pivot-skip + rho
    bumps, never by NaN propagation: the terminal state of a problem whose
    Gauss-Newton matrix is singular at the start must be finite."""
    # rank-deficient Jacobian at x0 (duplicate residuals)
    pb = nls_problem(
        lambda x: jnp.array([x[0] - 1, x[0] - 1, (x[1] - 2) ** 2]),
        jnp.array([5.0, 2.0]),  # second residual's gradient vanishes at x0
        3,
    )
    solver = CaNNOLeSSolver(pb)
    stats = solver.solve()
    assert stats.status in ("first_order", "small_residual")
    assert np.isfinite(stats.solution).all()
    assert np.allclose(stats.solution, [1.0, 2.0], atol=1e-3)


def test_deterministic_rerun():
    """Two runs of the same compiled solve produce bit-identical states
    (deterministic reductions — SURVEY.md §5)."""
    solver = CaNNOLeSSolver(_pb())
    s1 = solver.solve()
    state1 = solver.last_state
    s2 = solver.solve()
    state2 = solver.last_state
    assert np.array_equal(np.asarray(state1.x), np.asarray(state2.x))
    assert np.array_equal(np.asarray(state1.dual), np.asarray(state2.dual))
    assert int(state1.nfact) == int(state2.nfact)
