"""Batched bundle adjustment: many independent gauge-constrained scenes in
one compiled vsolve (the production shape of BASELINE config 5)."""

import numpy as np

from cannoles_tpu import CaNNOLeSSolver, vsolve
from cannoles_tpu.models.families import bundle_adjustment_batch


def test_batched_scenes_solve():
    pb, x0s, datas, trues = bundle_adjustment_batch(n_scenes=4, n_cams=3, n_pts=10)
    solver = CaNNOLeSSolver(pb, method="gauss_newton", kkt="condensed")
    res = vsolve(pb, x0s, data_batch=datas, solver=solver, max_iter=60)
    assert res.solved_mask().all(), res.summary()
    assert np.abs(res.solution - trues).max() < 5e-2
    # feasibility of the per-scene gauge constraints
    assert np.abs(np.asarray(res.states.cx)).max() < 1e-6
