"""Batched multistart: must reach the certified global optimum on problems
where the standard start converges to a local minimum (capability beyond the
serial reference)."""

import numpy as np

from cannoles_tpu import CaNNOLeSSolver
from cannoles_tpu.models.mgh import mgh_problem
from cannoles_tpu.models.basic import mgh01con
from cannoles_tpu.parallel.multistart import multistart


def test_multistart_beats_local_minimum():
    pb = mgh_problem("freudenstein_roth")
    single = CaNNOLeSSolver(pb).solve(atol=0.0, rtol=1e-5)
    assert 2 * single.objective > 1.0  # standard start lands at the 48.98 local min
    ms = multistart(pb, n_starts=32, atol=0.0, rtol=1e-5, max_iter=150)
    assert ms.status == "first_order"
    assert 2 * ms.objective < 1e-6  # global optimum f* = 0


def test_multistart_constrained():
    ms = multistart(mgh01con(), n_starts=16, scale=0.5)
    assert ms.status == "first_order"
    assert ms.primal_feas < 1e-8
    assert np.allclose(ms.solution, [0.5, 0.25], atol=1e-6)
    assert ms.solver_specific["n_solved"] >= 14
