"""MGH battery sanity: every problem evaluates, differentiates, and the
easy/zero-residual subset solves to its certified optimum (benchmark
protocol analog of /root/reference/docs/src/benchmark.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import CaNNOLeSSolver
from cannoles_tpu.models.mgh import mgh_suite

SUITE = mgh_suite()

# problems expected to reach their certified Σf² at the standard start with
# the default newton method and f64 (the harder ones are exercised in the
# benchmark battery instead)
EASY = {
    "rosenbrock", "beale", "helical_valley", "bard", "gaussian",
    "powell_singular", "wood", "kowalik_osborne", "box3d",
    "ext_rosenbrock", "ext_powell", "variably_dimensioned",
    "brown_almost_linear", "discrete_boundary_value", "discrete_integral",
    "broyden_tridiagonal", "broyden_banded", "linear_full_rank",
    "osborne1", "watson", "jennrich_sampson", "brown_dennis",
}


@pytest.mark.parametrize("spec", SUITE, ids=[s.name for s in SUITE])
def test_evaluates_and_differentiates(spec):
    pb = spec.make()
    F0 = pb.F(pb.x0, pb.data)
    assert F0.shape == (pb.nequ,)
    assert bool(jnp.all(jnp.isfinite(F0)))
    J0 = pb.J(pb.x0, pb.data)
    assert J0.shape == (pb.nequ, pb.nvar)
    assert bool(jnp.all(jnp.isfinite(J0)))


@pytest.mark.parametrize(
    "spec", [s for s in SUITE if s.name in EASY and s.fmin is not None],
    ids=[s.name for s in SUITE if s.name in EASY and s.fmin is not None],
)
def test_solves_to_certified_minimum(spec):
    pb = spec.make()
    solver = CaNNOLeSSolver(pb)
    stats = solver.solve(max_time=120.0)
    assert stats.status in ("first_order", "small_residual"), (spec.name, stats.status)
    got = 2 * stats.objective  # MGH certifies Σ fᵢ² = 2·(½‖F‖²)
    tol = max(1e-6, 1e-4 * max(1.0, abs(spec.fmin)))
    assert got <= spec.fmin + tol, (spec.name, got, spec.fmin)
