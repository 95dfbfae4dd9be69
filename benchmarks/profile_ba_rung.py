#!/usr/bin/env python
"""Stage attribution for the batched bundle-adjustment bench rung.

The BA rung (bench.py: 256 scenes, 3 cams x 16 pts, condensed KKT N=73,
f32, Pallas lanes-batched LDLT) runs at ~0.14% model-FLOP utilization.
VERDICT item: attribute the budget across the candidate costs — the
factorization kernel, the Jacobian build (AD), the J'J condensation, and
the residual evaluations (line search + trial steps) — by timing each
stage STANDALONE on device (in-graph repetition differencing, same
methodology as bench.py) at the exact counts the solved batch reports.

The stage sum is compared against the measured full-solve device time; the
gap is attributed to everything else (KKT assembly scatter, state pytree
select/where traffic, CGLS init, control flow).

    python benchmarks/profile_ba_rung.py [--json out.json]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def device_time(make_fn, *args, R1=1, R2=13, tries=3):
    """Device-side seconds per repetition via in-graph differencing."""
    f1, f2 = make_fn(R1), make_fn(R2)
    for f in (f1, f2):
        float(f(*args))

    def t(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0

    t1 = min(t(f1) for _ in range(tries))
    t2 = min(t(f2) for _ in range(tries))
    return max((t2 - t1) / (R2 - R1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cannoles_tpu import CaNNOLeSSolver
    from cannoles_tpu.models.families import bundle_adjustment_batch
    from cannoles_tpu.ops.pallas_ldlt import batched_ldlt_solve_pallas
    from cannoles_tpu.parallel.batch import vsolve

    dtype = jnp.float32
    B, n_cams, n_pts = 256, 3, 16
    pb, x0s, datas, _ = bundle_adjustment_batch(B, n_cams, n_pts, dtype=dtype)
    n, m, p = pb.nvar, pb.nequ, pb.ncon
    N = n + p  # condensed KKT size
    solver = CaNNOLeSSolver(
        pb, method="gauss_newton", kkt="condensed", linsolve="pallas", dtype=dtype
    )
    res = vsolve(pb, x0s, data_batch=datas, solver=solver, max_iter=40)
    nlin = np.asarray(res.states.nlinsolve)
    nfact = np.asarray(res.states.nfact)
    nF = np.asarray(res.states.neval_F)
    iters = np.asarray(res.states.iter)
    counts = dict(
        mean_outer=float(iters.mean()),
        mean_nlinsolve=float(nlin.mean()),
        mean_nfact=float(nfact.mean()),
        mean_neval_F=float(nF.mean()),
    )
    print(f"# counts: {counts}", flush=True)

    cfg = solver.make_config(max_iter=40)
    lam0s = jnp.zeros((B, p), dtype)
    vrun = jax.vmap(solver._run_compiled, in_axes=(0, 0, None, 0))

    # ---- full solve ----
    def mk_full(R):
        @jax.jit
        def f(xs):
            def body(i, acc):
                st = vrun(xs + acc * 1e-9, lam0s, cfg, datas)
                return acc + st.x[0, 0]

            return lax.fori_loop(0, R, body, jnp.zeros((), dtype))

        return f

    t_full = device_time(mk_full, x0s, R1=1, R2=9)

    # representative per-lane iterate (the solved points; stages are timed
    # at realistic data, counts scale per-batch)
    xs = jnp.asarray(res.states.x)

    # ---- stage: factorization kernel (per KKT attempt) ----
    rng = np.random.default_rng(0)
    G = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
    W = G @ jnp.swapaxes(G, -1, -2) + 10.0 * jnp.eye(N, dtype=dtype)
    rhs = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))

    def mk_kern(R):
        @jax.jit
        def f(Wb):
            def body(i, acc):
                x, d = batched_ldlt_solve_pallas(Wb + acc * 1e-12, rhs, 1e-7)
                return acc + x[0, 0]

            return lax.fori_loop(0, R, body, jnp.zeros((), dtype))

        return f

    t_kern1 = device_time(mk_kern, W, R1=2, R2=26)

    # ---- stage: Jacobian build (F_and_Jt via linearize) ----
    def mk_jac(R):
        @jax.jit
        def f(xb):
            def body(i, acc):
                F, JT = jax.vmap(pb.F_and_Jt)(xb + acc * 1e-9, datas)
                return acc + JT[0, 0, 0] + F[0, 0]

            return lax.fori_loop(0, R, body, jnp.zeros((), dtype))

        return f

    t_jac1 = device_time(mk_jac, xs, R1=2, R2=26)

    # ---- stage: J'J condensation + KKT assembly ----
    JTs = jax.vmap(pb.Jt)(xs, datas)
    Jcs = jax.vmap(pb.Jc)(xs, datas)

    def mk_cond(R):
        @jax.jit
        def f(JTb):
            def body(i, acc):
                H = jnp.zeros((B, n, n), dtype)
                K = jax.vmap(solver._assemble_condensed, in_axes=(0, 0, 0, None))(
                    H, JTb + acc * 1e-12, Jcs, jnp.asarray(1e-3, dtype)
                )
                return acc + K[0, 0, 0]

            return lax.fori_loop(0, R, body, jnp.zeros((), dtype))

        return f

    t_cond1 = device_time(mk_cond, JTs, R1=2, R2=26)

    # ---- stage: residual evaluation (line-search / trial cost) ----
    def mk_res(R):
        @jax.jit
        def f(xb):
            def body(i, acc):
                F = jax.vmap(pb.F)(xb + acc * 1e-9, datas)
                return acc + F[0, 0]

            return lax.fori_loop(0, R, body, jnp.zeros((), dtype))

        return f

    t_res1 = device_time(mk_res, xs, R1=2, R2=50)

    stages = {
        "kernel_per_batch_attempt_ms": t_kern1 * 1e3,
        "jacobian_per_batch_build_ms": t_jac1 * 1e3,
        "condensation_per_batch_ms": t_cond1 * 1e3,
        "residual_per_batch_eval_ms": t_res1 * 1e3,
    }
    # scale by the solved batch's counts (vmapped lanes run in lockstep to
    # the max lane, so the honest multiplier is the MAX count, not the mean
    # — a while_loop over a batch executes until every lane is done)
    mult = dict(
        kernel=float(nfact.max()),
        jacobian=float(nlin.max()) + 1.0,  # init + per-inner trial rebuild
        condensation=float(nlin.max()),
        residual=float(nF.max()),
    )
    total = dict(
        kernel_ms=t_kern1 * 1e3 * mult["kernel"],
        jacobian_ms=t_jac1 * 1e3 * mult["jacobian"],
        condensation_ms=t_cond1 * 1e3 * mult["condensation"],
        residual_ms=t_res1 * 1e3 * mult["residual"],
    )
    accounted = sum(total.values())
    out = dict(
        B=B, N=N, n=n, m=m, p=p,
        counts=counts,
        max_counts={k: float(v) for k, v in mult.items()},
        full_solve_ms=t_full * 1e3,
        stage_unit_ms={k: round(v, 4) for k, v in stages.items()},
        stage_total_ms={k: round(v, 3) for k, v in total.items()},
        accounted_ms=round(accounted, 3),
        other_ms=round(t_full * 1e3 - accounted, 3),
        scenes_per_s_device=round(B / t_full, 1),
    )
    print(json.dumps(out, indent=1))
    if args.json:
        pathlib.Path(args.json).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
