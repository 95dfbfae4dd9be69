#!/usr/bin/env python
"""Headline benchmark: batched LM instances/s per chip.

Target from BASELINE.json: >= 1000 batched LM constrained-NLS instances/s per
v5p chip (the reference is a single-CPU solver with no published numbers —
BASELINE.md).  vs_baseline = value / 1000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Resilience: the best-known configuration (B=16384, chunk=4096, fused Pallas
kernel — measured 160k inst/s on a healthy v5e) can take minutes of XLA/Mosaic
compile on a cold or degraded toolchain, so the bench climbs a ladder of
configurations small→large under a wall-clock budget (env BENCH_BUDGET,
default 450 s) and reports the best completed measurement.
"""

import json
import os
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA/Mosaic compilation cache: on a cold toolchain each ladder
# rung costs minutes of compile (measured 301 s for the first rung alone),
# which starves the wall-clock budget.  The cache is keyed on program +
# topology, so a pre-warmed run makes later runs pure measurement.
_CACHE = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent / ".jax_cache"),
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_problem(dtype):
    from cannoles_tpu import nls_problem

    def residual(x, d):
        return jnp.array([x[0] - d[0], 10 * (x[1] - x[0] ** 2) - d[1]])

    def cons(x, d):
        return jnp.array([x[0] + x[1] - d[2]])

    return nls_problem(
        residual,
        jnp.array([-1.2, 1.0], dtype=dtype),
        2,
        cons,
        [0.0],
        [0.0],
        data=jnp.zeros((3,), dtype=dtype),
        name="bench_lm_family",
    )


def run_config(problem, linsolve, B, chunk, dtype, reps=3):
    from cannoles_tpu import CaNNOLeSSolver
    from cannoles_tpu.parallel.batch import vsolve

    solver = CaNNOLeSSolver(problem, method="lm", linsolve=linsolve, kkt="full", dtype=dtype)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(scale=0.5, size=(B, 2)) + [-1.2, 1.0], dtype=dtype)
    datas = jnp.asarray(
        np.stack(
            [1 + 0.2 * rng.normal(size=B), 0.1 * rng.normal(size=B), 1 + 0.2 * rng.normal(size=B)],
            axis=1,
        ),
        dtype=dtype,
    )

    def once():
        r = vsolve(
            problem, x0s, data_batch=datas, solver=solver, max_iter=50, chunk_size=chunk
        )
        jax.block_until_ready(r.states.x)
        return r

    res = once()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        res = once()
    dt = (time.perf_counter() - t0) / reps
    return B / dt, res.summary(), dt


def main():
    dtype = jnp.float32
    problem = build_problem(dtype)
    budget = float(os.environ.get("BENCH_BUDGET", 450))
    t0 = time.time()

    # (linsolve, B, chunk) — cheapest compile first, best-known config last
    ladder = [
        ("ldlt", 2048, None),
        ("pallas", 4096, None),
        ("pallas", 16384, 4096),
        # same per-chunk compiled fn as the previous rung (chunk=4096), so
        # this costs no extra compile — only amortizes dispatch further
        ("pallas", 32768, 4096),
    ]
    if os.environ.get("BENCH_B"):
        ladder = [("pallas", int(os.environ["BENCH_B"]),
                   int(os.environ.get("BENCH_CHUNK", 0)) or None)]

    best = None
    for linsolve, B, chunk in ladder:
        elapsed = time.time() - t0
        if best is not None and elapsed > budget * 0.5:
            break
        try:
            value, summ, dt = run_config(problem, linsolve, B, chunk, dtype)
        except Exception as e:  # noqa: BLE001 — keep the best completed rung
            print(f"# config {linsolve}/B={B}/chunk={chunk} failed: {e}", file=sys.stderr)
            continue
        print(
            f"# {linsolve} B={B} chunk={chunk}: {value:.0f} inst/s "
            f"solved={summ['solved']}/{B} t={dt:.4f}s (elapsed {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )
        if best is None or value > best:
            best = value

    if best is None:
        print(json.dumps({"metric": "batched_lm_instances_per_s_per_chip",
                          "value": 0.0, "unit": "instances/s", "vs_baseline": 0.0}))
        return
    print(
        json.dumps(
            {
                "metric": "batched_lm_instances_per_s_per_chip",
                "value": round(best, 1),
                "unit": "instances/s",
                "vs_baseline": round(best / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
