#!/usr/bin/env python
"""Performance profiles (Dolan–Moré) across solver configurations — the
analog of the reference's SolverBenchmark recipe
(``/root/reference/docs/src/benchmark.md:95-99``: profiles on elapsed_time
and neval_residual).

    python benchmarks/perf_profile.py --cpu
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def performance_profile(costs: np.ndarray, taus: np.ndarray) -> np.ndarray:
    """costs: (n_problems, n_solvers), np.inf = failed.
    Returns rho(tau): (n_taus, n_solvers) fraction of problems solved within
    tau x best cost."""
    best = np.nanmin(np.where(np.isfinite(costs), costs, np.nan), axis=1)
    ratios = costs / best[:, None]
    return np.stack([(ratios <= t).mean(axis=0) for t in taus])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.cpu:
        from cannoles_tpu.utils.testing import force_cpu

        force_cpu()

    from cannoles_tpu import CaNNOLeSSolver
    from cannoles_tpu.models.hs import hs_suite
    from cannoles_tpu.models.mgh import mgh_suite

    configs = [
        ("newton/full", dict(method="newton", kkt="full")),
        ("newton/condensed", dict(method="newton", kkt="condensed")),
        ("gauss_newton/condensed", dict(method="gauss_newton", kkt="condensed")),
        ("lm/condensed", dict(method="lm", kkt="condensed")),
    ]
    problems = [(s.name, s.make) for s in mgh_suite()] + [
        (s.name, s.make) for s in hs_suite()
    ]

    time_costs = np.full((len(problems), len(configs)), np.inf)
    eval_costs = np.full_like(time_costs, np.inf)
    for i, (pname, make) in enumerate(problems):
        for j, (cname, kw) in enumerate(configs):
            try:
                pb = make()
                solver = CaNNOLeSSolver(pb, **kw)
                solver.solve(atol=0.0, rtol=1e-5, max_time=0.1)  # warm compile
                t0 = time.perf_counter()
                stats = solver.solve(atol=0.0, rtol=1e-5, max_time=30.0)
                dt = time.perf_counter() - t0
                if stats.status in ("first_order", "small_residual"):
                    time_costs[i, j] = dt
                    eval_costs[i, j] = stats.solver_specific["neval_residual"]
            except Exception:
                pass
        print(f"{pname:28s} " + " ".join(
            f"{configs[j][0]}:{'ok' if np.isfinite(time_costs[i, j]) else '--'}"
            for j in range(len(configs))
        ), flush=True)

    taus = np.array([1.0, 2.0, 5.0, 10.0, 100.0])
    prof_t = performance_profile(time_costs, taus)
    prof_e = performance_profile(eval_costs, taus)
    names = [c[0] for c in configs]
    print("\nperformance profile (elapsed time):  tau :", [f"{n}" for n in names])
    for t, row in zip(taus, prof_t):
        print(f"  tau={t:<6g}" + "  ".join(f"{v:.2f}" for v in row))
    print("performance profile (neval_residual):")
    for t, row in zip(taus, prof_e):
        print(f"  tau={t:<6g}" + "  ".join(f"{v:.2f}" for v in row))

    out = dict(
        configs=names,
        problems=[p[0] for p in problems],
        taus=taus.tolist(),
        profile_time=prof_t.tolist(),
        profile_evals=prof_e.tolist(),
        solved_per_config=np.isfinite(time_costs).sum(axis=0).tolist(),
    )
    print(json.dumps({"solved_per_config": out["solved_per_config"], "n": len(problems)}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
