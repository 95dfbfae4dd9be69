#!/usr/bin/env python
"""Headline benchmark: batched LM instances/s per chip.

Target from BASELINE.json: >= 1000 batched LM constrained-NLS instances/s per
v5p chip (the reference is a single-CPU solver with no published numbers —
BASELINE.md).  vs_baseline = value / 1000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever the default JAX platform is (TPU under the driver).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cannoles_tpu import CaNNOLeSSolver, nls_problem
    from cannoles_tpu.parallel.batch import vsolve

    dtype = jnp.float32

    # Constrained curve-fit family: per-instance data shifts the residual and
    # the constraint, so the batch is a genuine instance sweep, not one
    # problem replicated.
    def residual(x, d):
        return jnp.array([x[0] - d[0], 10 * (x[1] - x[0] ** 2) - d[1]])

    def cons(x, d):
        return jnp.array([x[0] + x[1] - d[2]])

    problem = nls_problem(
        residual,
        jnp.array([-1.2, 1.0], dtype=dtype),
        2,
        cons,
        [0.0],
        [0.0],
        data=jnp.zeros((3,), dtype=dtype),
        name="bench_lm_family",
    )

    # measured fastest on-chip: full KKT + fused batched Pallas factor-solve,
    # sequential 4096-chunks for straggler control
    solver = CaNNOLeSSolver(problem, method="lm", linsolve="pallas", kkt="full", dtype=dtype)

    B, CHUNK = 16384, 4096
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(scale=0.5, size=(B, 2)) + [-1.2, 1.0], dtype=dtype)
    datas = jnp.asarray(
        np.stack(
            [
                1.0 + 0.2 * rng.normal(size=B),
                0.1 * rng.normal(size=B),
                1.0 + 0.2 * rng.normal(size=B),
            ],
            axis=1,
        ),
        dtype=dtype,
    )

    def once():
        r = vsolve(problem, x0s, data_batch=datas, solver=solver, max_iter=50, chunk_size=CHUNK)
        jax.block_until_ready(r.states.x)
        return r

    res = once()  # warmup / compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = once()
    dt = (time.perf_counter() - t0) / reps

    summ = res.summary()
    value = B / dt
    print(
        f"# devices={jax.devices()} B={B} chunk={CHUNK} time/solve-batch={dt:.4f}s "
        f"solved={summ['solved']}/{B} mean_iter={summ['mean_iter']:.1f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "batched_lm_instances_per_s_per_chip",
                "value": round(value, 1),
                "unit": "instances/s",
                "vs_baseline": round(value / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
