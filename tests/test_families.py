"""Large-scale problem families: curve fitting + gauge-constrained bundle
adjustment (BASELINE config 4 workloads)."""

import jax.numpy as jnp
import numpy as np

from cannoles_tpu import CaNNOLeSSolver
from cannoles_tpu.models.families import bundle_adjustment, curve_fit_family


def test_curve_fit_family():
    pb = curve_fit_family(m=2048, dtype=jnp.float64)
    stats = CaNNOLeSSolver(pb, method="gauss_newton", kkt="condensed").solve()
    assert stats.status in ("first_order", "small_residual")
    assert np.allclose(stats.solution, [2.0, 1.5, 1.0, 0.4, 0.5], atol=1e-5)


def test_bundle_adjustment_recovers_scene():
    pb, x_true = bundle_adjustment(n_cams=3, n_pts=16, noise=0.0)
    assert pb.ncon == 7  # 6 pinned-pose + 1 scale gauge constraints
    stats = CaNNOLeSSolver(pb, method="gauss_newton", kkt="condensed").solve(
        max_time=120.0
    )
    assert stats.status == "first_order", stats.status
    assert stats.primal_feas < 1e-8
    assert np.abs(np.asarray(stats.solution) - x_true).max() < 1e-3


def test_bundle_adjustment_row_sharded():
    """The same BA problem with reprojection rows sharded over the mesh."""
    from cannoles_tpu.parallel.schur import make_row_mesh, solve_row_sharded

    pb, x_true = bundle_adjustment(n_cams=4, n_pts=16, noise=0.0)
    stats = solve_row_sharded(pb, make_row_mesh(), method="gauss_newton")
    assert stats.status == "first_order", stats.status
    assert np.abs(np.asarray(stats.solution) - x_true).max() < 1e-3
