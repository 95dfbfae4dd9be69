#!/usr/bin/env python
"""MGH battery runner — the reference benchmark protocol
(``/root/reference/docs/src/benchmark.md``): solve every problem with
``atol = 0, rtol = 1e-5``, 'solved' ⇔ status ∈ {first_order, small_residual},
report per-problem status/iterations/evals/time and the overall solve rate
(BASELINE parity bar: ≥95% of reference-solved problems).

Usage:
    python benchmarks/mgh_battery.py [--cpu] [--method newton] [--kkt full]
                                     [--json out.json]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU + float64")
    ap.add_argument("--method", default="newton")
    ap.add_argument("--kkt", default="full")
    ap.add_argument("--linsolve", default="ldlt")
    ap.add_argument("--max-time", type=float, default=60.0)
    ap.add_argument("--extended", action="store_true",
                    help="append 20 dimensional variants from the MGH paper")
    ap.add_argument(
        "--constrained",
        action="store_true",
        help="run MGH problems with the reference test constraints attached "
        "(runtests.jl:82-100 style): sum(x)=1 over a curated subset",
    )
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.cpu:
        from cannoles_tpu.utils.testing import force_cpu

        force_cpu()

    from cannoles_tpu import CaNNOLeSSolver
    from cannoles_tpu.models.mgh import mgh_suite

    suite = mgh_suite(extended=args.extended)
    if args.constrained:
        from cannoles_tpu.models.basic import constrained

        CURATED = {
            "rosenbrock", "beale", "helical_valley", "powell_singular", "wood",
            "ext_rosenbrock", "ext_powell", "broyden_tridiagonal",
            "broyden_banded", "brown_almost_linear", "variably_dimensioned",
            "trigonometric", "discrete_boundary_value", "chebyquad",
        }
        from cannoles_tpu.models.mgh import MGHSpec

        suite = [
            MGHSpec(s.name + "+linear", (lambda s=s: constrained(s.make(), "linear")), None)
            for s in suite
            if s.name in CURATED
        ]

    rows = []
    for spec in suite:
        pb = spec.make()
        t0 = time.time()
        try:
            first = "ldlt" if args.linsolve == "auto" else args.linsolve
            solver = CaNNOLeSSolver(pb, method=args.method, linsolve=first, kkt=args.kkt)
            stats = solver.solve(atol=0.0, rtol=1e-5, max_time=args.max_time)
            if args.linsolve == "auto" and stats.status == "exception":
                # robust-backend escalation (reference two-backend seam)
                solver = CaNNOLeSSolver(pb, method=args.method, linsolve="eigh", kkt=args.kkt)
                stats = solver.solve(atol=0.0, rtol=1e-5, max_time=args.max_time)
            row = dict(
                name=spec.name,
                nvar=pb.nvar,
                nequ=pb.nequ,
                status=stats.status,
                solved=stats.status in ("first_order", "small_residual"),
                iter=stats.iter,
                fsumsq=2 * stats.objective,
                fmin=spec.fmin,
                dual_feas=stats.dual_feas,
                neval=stats.solver_specific.get("neval_residual", -1),
                nfact=stats.solver_specific.get("nfact", -1),
                time=time.time() - t0,
            )
        except Exception as e:  # noqa: BLE001 — battery must survive one bad problem
            row = dict(
                name=spec.name, nvar=pb.nvar, nequ=pb.nequ, status=f"error:{e}",
                solved=False, iter=-1, fsumsq=float("nan"), fmin=spec.fmin,
                dual_feas=float("nan"), neval=-1, nfact=-1, time=time.time() - t0,
            )
        rows.append(row)
        print(
            f"{row['name']:28s} {row['status']:<16s} iter={row['iter']:<4} "
            f"Σf²={row['fsumsq']:<12.5g} t={row['time']:.2f}s",
            flush=True,
        )

    solved = sum(r["solved"] for r in rows)
    # optimum reached where certified: Σf² ≤ fmin + tol
    certified = [r for r in rows if r["fmin"] is not None]
    at_opt = sum(
        r["fsumsq"] <= r["fmin"] + max(1e-5, 1e-4 * max(1.0, abs(r["fmin"])))
        for r in certified
        if r["solved"]
    )
    summary = dict(
        n=len(rows),
        solved=solved,
        solve_rate=solved / len(rows),
        certified=len(certified),
        at_certified_optimum=at_opt,
        method=args.method,
        kkt=args.kkt,
        linsolve=args.linsolve,
    )
    print(json.dumps(summary))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(summary=summary, rows=rows), f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
