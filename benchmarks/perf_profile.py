#!/usr/bin/env python
"""Performance profiles (Dolan–Moré) across solver configurations — the
analog of the reference's SolverBenchmark recipe
(``/root/reference/docs/src/benchmark.md:95-99``: profiles on elapsed_time
and neval_residual).

The reference protocol is explicitly *comparative* (vs tron/trunk,
docs/src/benchmark.md:26-47); no Julia toolchain exists in this container,
so the external comparators are

* unconstrained battery (55 problems): ``scipy.optimize.least_squares``
  (TRF and LM — the standard production NLS solvers);
* constrained battery (35 problems — HS + constrained-MGH + LV chained):
  ``scipy.optimize.minimize`` (SLSQP and trust-constr) on
  ``min ½‖F(x)‖² s.t. c(x) = 0``.

Fairness rules: scipy gets the same analytic-AD derivatives (jitted, warmed
before timing), the same ``atol=0 / rtol=1e-5`` budget, and its result is
judged by OUR solver-independent KKT oracle evaluated at its solution
(``cannoles_tpu.utils.kkt``; scipy's own ftol/xtol statuses are not trusted
as 'solved') — the multiplier for the judgment is the least-squares
(Armand 2012) estimate at the returned point, the same estimator our
solver initializes with.

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

    configs = [
        ("newton/full", dict(method="newton", kkt="full")),
        ("newton/condensed", dict(method="newton", kkt="condensed")),
        ("gauss_newton/condensed", dict(method="gauss_newton", kkt="condensed")),
        ("lm/condensed", dict(method="lm", kkt="condensed")),
    ]
    # the full 90-problem battery (55 unconstrained MGH + 35 constrained:
    # 14 constrained-MGH + 16 HS + 5 LV chained) — same collection as
    # full_battery.py
    from full_battery import collect

    problems = [(name, make) for _family, name, make, _fstar in collect()]

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

    # ---- external comparator: scipy.optimize.least_squares (TRF, LM) ----
    # unconstrained battery only (scipy least_squares has no equality
    # constraints); solved ⇔ our first-order criterion holds at its answer
    import jax
    import jax.numpy as jnp
    from scipy.optimize import least_squares

    uncon_idx = []
    scipy_names = ["scipy-trf", "scipy-lm"]
    scipy_time = np.full((len(problems), 2), np.inf)
    scipy_eval = np.full((len(problems), 2), np.inf)
    for i, (pname, make) in enumerate(problems):
        pb = make()
        if pb.ncon > 0:
            continue
        uncon_idx.append(i)
        F = jax.jit(lambda x, pb=pb: pb.F(jnp.asarray(x), pb.data))
        J = jax.jit(lambda x, pb=pb: pb.J(jnp.asarray(x), pb.data))
        x0 = np.asarray(pb.x0, float)
        g0 = np.abs(np.asarray(J(x0)).T @ np.asarray(F(x0))).max()
        epstol = 0.0 + 1e-5 * g0  # the protocol's ϵtol = atol + rtol·‖∇L⁰‖
        fun = lambda x: np.asarray(F(x))  # noqa: E731
        jac = lambda x: np.asarray(J(x))  # noqa: E731
        fun(x0), jac(x0)  # warm the jit (our timings exclude compile too)
        for k, smethod in enumerate(("trf", "lm")):
            if smethod == "lm" and pb.nequ < pb.nvar:
                continue  # scipy 'lm' requires m >= n
            try:
                t0 = time.perf_counter()
                r = least_squares(
                    fun, x0, jac=jac, method=smethod,
                    xtol=1e-12, ftol=1e-12, gtol=1e-12, max_nfev=100000,
                )
                dt = time.perf_counter() - t0
                gend = np.abs(jac(r.x).T @ fun(r.x)).max()
                # small-residual exit, reference default Fatol = √eps
                # (2√fx ≤ Fatol + Frtol·2√fx⁰ with the Frtol·eps term moot)
                small = 2 * np.sqrt(float(r.cost)) <= np.sqrt(
                    float(np.finfo(np.float64).eps)
                )
                if gend <= epstol or small:
                    scipy_time[i, k] = dt
                    scipy_eval[i, k] = r.nfev
            except Exception:
                pass
        print(
            f"{pname:28s} scipy trf:"
            f"{'ok' if np.isfinite(scipy_time[i, 0]) else '--'} "
            f"lm:{'ok' if np.isfinite(scipy_time[i, 1]) else '--'}",
            flush=True,
        )

    # ---- external comparator (constrained): scipy.optimize.minimize ----
    # SLSQP + trust-constr on min ½‖F(x)‖² s.t. c(x) = 0, analytic AD
    # gradient/Jacobians, judged by OUR independent KKT oracle at their
    # returned point with the least-squares multiplier estimate (the same
    # Armand-2012 estimator our solver initializes with) — the reference
    # protocol's comparative leg over the equality-constrained set
    # (/root/reference/docs/src/benchmark.md:26-47)
    from scipy.optimize import NonlinearConstraint, minimize

    con_idx = []
    scipy_con_names = ["scipy-slsqp", "scipy-trustconstr"]
    scipy_con_time = np.full((len(problems), 2), np.inf)
    scipy_con_eval = np.full((len(problems), 2), np.inf)
    for i, (pname, make) in enumerate(problems):
        pb = make()
        if pb.ncon == 0:
            continue
        con_idx.append(i)
        Ff = jax.jit(lambda x, pb=pb: pb.F(jnp.asarray(x), pb.data))
        gf = jax.jit(
            jax.grad(
                lambda x, pb=pb: 0.5
                * jnp.vdot(pb.F(x, pb.data), pb.F(x, pb.data))
            )
        )
        cf = jax.jit(lambda x, pb=pb: pb.c_shifted(jnp.asarray(x), pb.data))
        Jcf = jax.jit(lambda x, pb=pb: pb.Jc(jnp.asarray(x), pb.data))
        x0 = np.asarray(pb.x0, float)
        fun = lambda x: 0.5 * float(np.sum(np.asarray(Ff(x)) ** 2))  # noqa: E731
        grad = lambda x: np.asarray(gf(jnp.asarray(x)))  # noqa: E731
        cfun = lambda x: np.asarray(cf(x))  # noqa: E731
        cjac = lambda x: np.asarray(Jcf(x))  # noqa: E731
        fun(x0), grad(x0), cfun(x0), cjac(x0)  # warm the jits

        def _lam_ls(x):
            g = grad(x)
            Jc = cjac(x)
            lam, *_ = np.linalg.lstsq(Jc.T, g, rcond=None)
            return lam

        # the protocol's ϵtol = rtol·‖∇L⁰‖ with the init least-squares λ
        g0v = grad(x0) - cjac(x0).T @ _lam_ls(x0)
        epstol = 1e-5 * max(np.abs(g0v).max(), 1e-300)

        def _solved(x):
            from cannoles_tpu.utils.kkt import kkt_residuals

            r = kkt_residuals(pb, jnp.asarray(x), jnp.asarray(_lam_ls(x)))
            return float(r.scaled_stationarity) <= epstol and float(
                r.feasibility
            ) <= np.sqrt(epstol)

        for k, smethod in enumerate(("slsqp", "trust-constr")):
            try:
                t0 = time.perf_counter()
                if smethod == "slsqp":
                    r = minimize(
                        fun, x0, jac=grad, method="SLSQP",
                        constraints=[{"type": "eq", "fun": cfun, "jac": cjac}],
                        options=dict(maxiter=2000, ftol=1e-14),
                    )
                else:
                    r = minimize(
                        fun, x0, jac=grad, method="trust-constr",
                        constraints=NonlinearConstraint(
                            cfun, 0.0, 0.0, jac=cjac
                        ),
                        options=dict(maxiter=5000, gtol=1e-12, xtol=1e-14),
                    )
                dt = time.perf_counter() - t0
                if _solved(r.x):
                    scipy_con_time[i, k] = dt
                    scipy_con_eval[i, k] = r.nfev
            except Exception:
                pass
        print(
            f"{pname:28s} scipy slsqp:"
            f"{'ok' if np.isfinite(scipy_con_time[i, 0]) else '--'} "
            f"trust-constr:{'ok' if np.isfinite(scipy_con_time[i, 1]) else '--'}",
            flush=True,
        )

    taus = np.array([1.0, 2.0, 5.0, 10.0, 100.0])
    prof_t = performance_profile(time_costs, taus)
    prof_e = performance_profile(eval_costs, taus)
    names = [c[0] for c in configs]

    # joint unconstrained profile: our configs + scipy columns
    ui = np.asarray(uncon_idx, int)
    ucols_t = np.concatenate([time_costs[ui], scipy_time[ui]], axis=1)
    ucols_e = np.concatenate([eval_costs[ui], scipy_eval[ui]], axis=1)
    uprof_t = performance_profile(ucols_t, taus)
    uprof_e = performance_profile(ucols_e, taus)
    unames = names + scipy_names
    print("\nperformance profile (elapsed time):  tau :", [f"{n}" for n in names])
    for t, row in zip(taus, prof_t):
        print(f"  tau={t:<6g}" + "  ".join(f"{v:.2f}" for v in row))
    print("performance profile (neval_residual):")
    for t, row in zip(taus, prof_e):
        print(f"  tau={t:<6g}" + "  ".join(f"{v:.2f}" for v in row))
    print(f"\nunconstrained battery ({len(ui)} problems) vs scipy:", unames)
    print(" time profile:")
    for t, row in zip(taus, uprof_t):
        print(f"  tau={t:<6g}" + "  ".join(f"{v:.2f}" for v in row))
    print(" nfev profile:")
    for t, row in zip(taus, uprof_e):
        print(f"  tau={t:<6g}" + "  ".join(f"{v:.2f}" for v in row))

    # joint constrained profile: our configs + the minimize columns
    ci = np.asarray(con_idx, int)
    ccols_t = np.concatenate([time_costs[ci], scipy_con_time[ci]], axis=1)
    ccols_e = np.concatenate([eval_costs[ci], scipy_con_eval[ci]], axis=1)
    cprof_t = performance_profile(ccols_t, taus)
    cprof_e = performance_profile(ccols_e, taus)
    cnames = names + scipy_con_names
    print(f"\nconstrained battery ({len(ci)} problems) vs scipy:", cnames)
    print(" time profile:")
    for t, row in zip(taus, cprof_t):
        print(f"  tau={t:<6g}" + "  ".join(f"{v:.2f}" for v in row))
    print(" nfev profile:")
    for t, row in zip(taus, cprof_e):
        print(f"  tau={t:<6g}" + "  ".join(f"{v:.2f}" for v in row))

    out = dict(
        configs=names,
        problems=[p[0] for p in problems],
        taus=taus.tolist(),
        profile_time=prof_t.tolist(),
        profile_evals=prof_e.tolist(),
        solved_per_config=np.isfinite(time_costs).sum(axis=0).tolist(),
        unconstrained=dict(
            configs=unames,
            problems=[problems[i][0] for i in uncon_idx],
            profile_time=uprof_t.tolist(),
            profile_evals=uprof_e.tolist(),
            solved_per_config=np.isfinite(ucols_t).sum(axis=0).tolist(),
            time_costs=ucols_t.tolist(),
            eval_costs=ucols_e.tolist(),
        ),
        constrained=dict(
            configs=cnames,
            problems=[problems[i][0] for i in con_idx],
            profile_time=cprof_t.tolist(),
            profile_evals=cprof_e.tolist(),
            solved_per_config=np.isfinite(ccols_t).sum(axis=0).tolist(),
            time_costs=ccols_t.tolist(),
            eval_costs=ccols_e.tolist(),
        ),
    )
    print(json.dumps({
        "solved_per_config": out["solved_per_config"], "n": len(problems),
        "unconstrained_solved": out["unconstrained"]["solved_per_config"],
        "n_unconstrained": len(ui),
        "constrained_solved": out["constrained"]["solved_per_config"],
        "n_constrained": len(ci),
    }))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
