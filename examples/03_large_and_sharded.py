#!/usr/bin/env python
"""One large problem: condensed Schur solve + row-sharding over a mesh.

python examples/03_large_and_sharded.py --cpu      # 8 virtual devices
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if "--cpu" in sys.argv:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    from cannoles_tpu.utils.testing import force_cpu

    force_cpu()

import jax.numpy as jnp
import numpy as np

from cannoles_tpu import CaNNOLeSSolver
from cannoles_tpu.models.families import bundle_adjustment, curve_fit_family
from cannoles_tpu.parallel.schur import make_row_mesh, solve_row_sharded

# ---- large curve fit, single device, two-level-Cholesky condensed solve --
pb = curve_fit_family(m=8192, dtype=jnp.float32)
solver = CaNNOLeSSolver(pb, method="gauss_newton", kkt="condensed", linsolve="chol")
stats = solver.solve()
print("curve fit 8192 rows:", stats.status, stats.solution)

# ---- same problem with residual rows sharded over all devices ------------
stats = solve_row_sharded(pb, make_row_mesh())
print("row-sharded:", stats.status, "iters:", stats.iter)

# ---- equality-constrained bundle adjustment (gauge fixed by constraints) -
ba, x_true = bundle_adjustment(n_cams=4, n_pts=24)
stats = CaNNOLeSSolver(ba, method="gauss_newton", kkt="condensed").solve()
err = np.abs(np.asarray(stats.solution) - x_true).max()
print(f"bundle adjustment: {stats.status}, scene error {err:.2e}")
