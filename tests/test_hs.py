"""Constrained (Hock–Schittkowski) NLS battery — solve status + certified
optimum checks with the full KKT path."""

import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import CaNNOLeSSolver
from cannoles_tpu.models.hs import hs_suite

SUITE = hs_suite()

# hs27: near-degenerate multiplier behavior (the aug-Lag update λ ← λ − c/δ
# with δ at its floor) stalls this regularization-method class near the
# optimum — it reaches 2f ≈ f* = 0.04 but exhausts max_eval tightening the
# KKT residual.  hs46: converges to a non-global first-order point.
HARD = {"hs27"}
LOCAL_MIN_OK = {"hs46"}


@pytest.mark.parametrize("spec", SUITE, ids=[s.name for s in SUITE])
def test_hs_solves(spec):
    pb = spec.make()
    solver = CaNNOLeSSolver(pb)
    stats = solver.solve(max_time=60.0)
    if spec.name in HARD:
        # must still land near the optimum even if the status is budget-bound
        assert 2 * stats.objective <= spec.fstar * 1.01 + 1e-4
        assert stats.primal_feas < 1e-2
        # ... and the documented delta_min workaround must solve it exactly
        fixed = CaNNOLeSSolver(pb, delta_min=1e-4).solve(max_time=60.0)
        assert fixed.status == "first_order", fixed.status
        assert abs(2 * fixed.objective - spec.fstar) < 1e-6
        return
    assert stats.status in ("first_order", "small_residual"), (spec.name, stats.status)
    assert stats.primal_feas < 1e-6, (spec.name, stats.primal_feas)
    if spec.fstar is not None and spec.name not in LOCAL_MIN_OK:
        got = 2 * stats.objective
        tol = max(1e-6, 1e-5 * max(1.0, abs(spec.fstar)))
        assert got <= spec.fstar + tol, (spec.name, got, spec.fstar)
