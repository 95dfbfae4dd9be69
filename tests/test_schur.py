"""Row-block sharded large-problem path (BASELINE config 4): one big
curve-fitting NLS with the residual dimension sharded over the device mesh;
the condensed backend reduces it through JᵀJ/JᵀF all-reduces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import CaNNOLeSSolver, nls_problem
from cannoles_tpu.parallel.schur import make_row_mesh, solve_row_sharded


def _curvefit_problem(m=8192, noise=0.0, seed=0):
    """y(t) = a1 exp(-b1 t) + a2 exp(-b2 t) + c, m observations."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 4.0, m)
    true = np.array([2.0, 1.5, 1.0, 0.4, 0.5])

    def model(x, t):
        return x[0] * jnp.exp(-x[1] * t) + x[2] * jnp.exp(-x[3] * t) + x[4]

    y = np.asarray(model(jnp.asarray(true), jnp.asarray(t)))
    y = y + noise * rng.normal(size=m)

    def residual(x, d):
        return model(x, d["t"]) - d["y"]

    x0 = jnp.array([1.0, 1.0, 0.5, 0.1, 0.0])
    data = {"t": jnp.asarray(t), "y": jnp.asarray(y)}
    return nls_problem(residual, x0, m, data=data, name="curvefit"), true


def test_row_sharded_matches_unsharded():
    pb, true = _curvefit_problem(m=8192)
    mesh = make_row_mesh()  # 8 virtual CPU devices
    stats = solve_row_sharded(pb, mesh, method="gauss_newton")
    assert stats.status in ("first_order", "small_residual"), stats.status
    assert np.allclose(stats.solution, true, atol=1e-5), stats.solution

    # unsharded single-device reference run
    solver = CaNNOLeSSolver(pb, method="gauss_newton", kkt="condensed")
    ref = solver.solve()
    assert np.allclose(stats.solution, ref.solution, atol=1e-8)
    assert stats.iter == ref.iter


def test_row_sharded_constrained():
    m = 4096
    rng = np.random.default_rng(1)
    t = np.linspace(0.0, 1.0, m)
    y = 2.5 * np.exp(-1.3 * t)

    def residual(x, d):
        return x[0] * jnp.exp(-x[1] * d["t"]) - d["y"]

    # constraint: x0 - 2*x1 = -0.1  (holds at the LS solution (2.5, 1.3))
    def cons(x, d):
        return jnp.array([x[0] - 2 * x[1]])

    pb = nls_problem(
        residual,
        jnp.array([1.0, 0.0]),
        m,
        cons,
        [-0.1],
        [-0.1],
        data={"t": jnp.asarray(t), "y": jnp.asarray(y)},
    )
    stats = solve_row_sharded(pb, make_row_mesh())
    assert stats.status == "first_order", stats.status
    assert abs(stats.solution[0] - 2 * stats.solution[1] + 0.1) < 1e-8
    assert np.allclose(stats.solution, [2.5, 1.3], atol=1e-2)


def test_row_sharded_requires_data():
    pb = nls_problem(lambda x: x - 1.0, jnp.zeros(3), 3)
    with pytest.raises(ValueError, match="per-residual"):
        solve_row_sharded(pb, make_row_mesh())
