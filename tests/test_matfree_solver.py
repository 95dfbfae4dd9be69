"""Matrix-free Gauss–Newton engine (core/matfree.py).

Checks: agreement with the dense solver on the reference fixtures, large
problems where the Jacobian is never materialized, constrained convergence,
CG-divergence → rho-bump behavior, and row-sharded execution on the
8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import cannoles, nls_problem, solve_matfree
from cannoles_tpu.models.basic import mgh01con


def test_matches_dense_on_rosenbrock():
    pb = nls_problem(
        lambda x: jnp.array([x[0] - 1.0, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
    )
    st = solve_matfree(pb)
    assert st.status == "first_order"
    np.testing.assert_allclose(st.solution, [1.0, 1.0], atol=1e-6)


def test_matches_dense_constrained():
    pb = mgh01con()
    dense = cannoles(pb, method="gauss_newton")
    mf = solve_matfree(pb)
    assert mf.status == "first_order"
    np.testing.assert_allclose(mf.solution, dense.solution, atol=1e-5)
    np.testing.assert_allclose(mf.multipliers, dense.multipliers, atol=1e-4)


def test_rejects_newton_method():
    pb = mgh01con()
    with pytest.raises(ValueError, match="Gauss"):
        solve_matfree(pb, method="newton")


def test_large_curve_fit_no_jacobian():
    """m=20_000, n=64: the dense J would be 10 MB (fine) but we assert the
    solve never materializes it by checking peak live-array growth stays
    vector-sized — structurally: the state has no (m, n) leaf."""
    m, n = 20_000, 64
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.linspace(0.0, 1.0, m))
    w_true = jnp.asarray(rng.normal(size=n) / np.arange(1, n + 1))
    basis_freq = jnp.arange(1, n + 1, dtype=t.dtype)

    def model(w, tt):
        # sum_k w_k sin(k * pi * t) — evaluated matrix-free per residual
        return jnp.sin(jnp.pi * tt[:, None] * basis_freq[None, :]) @ w

    y = model(w_true, t) + 0.0
    pb = nls_problem(
        lambda w, d: model(w, d["t"]) - d["y"],
        jnp.zeros(n),
        m,
        data={"t": t, "y": y},
        name="large_curvefit",
    )
    from cannoles_tpu import MatrixFreeSolver

    solver = MatrixFreeSolver(pb, cg_maxiter=200)
    st = solver.solve(max_time=120.0)
    assert st.status in ("first_order", "small_residual"), st.status
    np.testing.assert_allclose(st.solution, w_true, atol=1e-5)
    # the compiled state must hold no matrix-shaped leaf
    for leaf in jax.tree.leaves(solver.last_state):
        assert np.ndim(leaf) < 2


def test_constrained_large():
    """Row-heavy constrained problem: fit + one equality constraint."""
    m, n = 5_000, 16
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n))
    x_true = jnp.asarray(rng.normal(size=n))
    b = A @ x_true

    pb = nls_problem(
        lambda x, d: d["A"] @ x - d["b"],
        jnp.zeros(n),
        m,
        lambda x: jnp.array([jnp.sum(x) - 1.0]),
        [0.0],
        [0.0],
        data={"A": A, "b": b},
    )
    st = solve_matfree(pb)
    assert st.status in ("first_order", "small_residual")
    assert abs(float(np.sum(st.solution)) - 1.0) < 1e-6
    # KKT: dual feasibility at the solution
    assert st.dual_feas < 1e-4


def test_cg_divergence_bumps_rho():
    """Rank-deficient J at the start: CG at rho=0 cannot converge on the
    singular operator, the rho ladder must engage (nfact > 1) and the solve
    still succeeds."""
    pb = nls_problem(
        # residual ignores x[1] at x0 — J is rank-1 at the initial point
        lambda x: jnp.array([x[0] - 1.0, (x[0] - 1.0) * 2.0, x[1] * x[0] ** 2]),
        jnp.array([0.0, 3.0]),
        3,
    )
    from cannoles_tpu import MatrixFreeSolver

    solver = MatrixFreeSolver(pb)
    st = solver.solve()
    assert st.status in ("first_order", "small_residual")
    assert st.solver_specific["nfact"] >= st.solver_specific["nlinsolve"]


def test_row_sharded_matfree():
    """data leaves sharded over the 8-device mesh: per-residual rows live
    on their devices; vjp contractions to n trigger XLA all-reduces."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    m, n = 4_096, 8
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n))
    x_true = jnp.asarray(rng.normal(size=n))
    b = A @ x_true
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("rows",))
    rows = NamedSharding(mesh, P("rows"))
    data = {"A": jax.device_put(A, rows), "b": jax.device_put(b, rows)}

    pb = nls_problem(
        lambda x, d: d["A"] @ x - d["b"], jnp.zeros(n), m, data=data
    )
    st = solve_matfree(pb)
    assert st.status in ("first_order", "small_residual")
    np.testing.assert_allclose(st.solution, x_true, atol=1e-6)
