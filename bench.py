#!/usr/bin/env python
"""Headline benchmark: batched LM instances/s per chip + compute-representative
rungs (batched bundle adjustment, one large dense NLS) with a FLOP-model MFU
estimate.

Target from BASELINE.json: >= 1000 batched LM constrained-NLS instances/s per
v5p chip (the reference is a single-CPU solver with no published numbers —
BASELINE.md).  vs_baseline = value / 1000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"extra" carries the compute-bound rungs:

* ``ba_scenes_per_s`` / ``ba_solved`` / ``ba_mfu_pct`` — 256 independent
  gauge-constrained bundle-adjustment scenes (66 params, 96 reprojection
  residuals, 7 equality constraints; condensed KKT N=73) in one compiled
  vsolve with the Pallas lanes-batched LDLᵀ kernel.
* ``large_ms_per_solve`` / ``large_mfu_pct`` — one 8192x1024 dense NLS,
  Gauss-Newton + condensed Schur + two-level Cholesky (BASELINE config 4).

MFU model (documented lower bound, not a profiler number): counts only the
provable dense-algebra FLOPs actually executed, read from the solver's own
counters — Jacobian builds (n JVPs ~ 2x residual cost each), J'J
condensation (2mn^2), factorizations ((2/3)N^3 per attempt from nfact) —
divided by DEVICE-SIDE time and the chip's bf16 peak (v5e 197 TF/s, v5p 459
TF/s).  Device-side time comes from in-graph repetition differencing
(``device_time_per_rep``): the axon tunnel adds ~25 ms fixed overhead per
dispatched call, which at millisecond workloads overstates time 10x (round
2's recorded 5.7% MFU at "28 ms/solve" was ~90% tunnel overhead — the same
solve measures 2.6 ms device-side).  Wall-clock per-dispatch numbers are
still reported alongside for continuity.  Elementwise work, triangular
solves and residual evaluations are excluded from the FLOP count, so true
utilization is strictly higher.

Resilience: every default rung is a Pallas- or Cholesky-backed program whose
cold XLA compile is seconds (the compile-heavy vmapped `ldlt` rung that
starved round 2's run is opt-in via BENCH_LDLT=1).  Rungs run under a
wall-clock budget (env BENCH_BUDGET, default 450 s) with a persistent
compilation cache (`.jax_cache/`, on disk and primed by the builder's runs
so the driver's rerun in this working tree starts warm; gitignored — a
truly fresh checkout pays the ~25 s ladder warmup measured in "extra");
every completed rung is reported, and "extra"
carries warmup (compile) and total wall-clock so compile regressions are
visible in the record.
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

# bf16 peak FLOP/s per chip by device kind (public spec sheets)
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,       # v5p
    "TPU v4": 275e12,
}


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return 197e12  # conservative default


def flop_model(*, n, m, p, kkt, nlinsolve, nfact, residual_flops):
    """Provable LOWER-BOUND dense-algebra FLOPs of one solve, from the
    solver's own counters.

    nlinsolve = KKT systems solved (1 Jacobian + 1 condensation each),
    nfact     = factorization attempts (rho-bump retries included).
    residual_flops = FLOPs of ONE residual evaluation F(x) (problem model).
    Jacobian build via jacfwd = n JVPs billed at exactly 1x residual cost
    each — exact for linear/elementwise-dominated residuals, an undercount
    for transcendental-heavy ones.  The constraint Jacobian, elementwise
    work, triangular solves and line-search evaluations are all excluded,
    so the resulting MFU is a floor, never an estimate.
    """
    N = (n + p) if kkt == "condensed" else (n + m + p)
    per_solve = n * residual_flops         # one (m, n) Jacobian build
    if kkt == "condensed":
        per_solve += 2 * m * n * n         # J'J condensation matmul
    per_fact = (2.0 / 3.0) * N**3          # LDL^T / Cholesky elimination
    return nlinsolve * per_solve + nfact * per_fact


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
    """One ladder rung.  The timed runs INCLUDE the host-side rescue pass,
    so the reported rate is the full cost of reaching the reported solved
    count — not a pre-rescue rate paired with a post-rescue count (round-4
    advisor finding).  Since round 5 the rescue is expected to be a no-op:
    the rare f32 Dϕ ≥ 0 line-search aborts (bad unpivoted factorizations
    that pass the pivot-sign inertia test) are repaired IN-GRAPH by the
    solver's ``descent_rescue`` — an `enabled`-masked gate-on ρ ladder that
    re-solves exactly the non-descent lanes inside the compiled program
    (measured +13 ms on the B=65536 rung vs ~150 ms of host dispatch for
    the old subset re-solve, and ~14% for gating everywhere).
    Returns the failure breakdown pre-rescue and the final solved count."""
    from cannoles_tpu import CaNNOLeSSolver
    from cannoles_tpu.core.status import MSG, status_name
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

    # Straggler cap (round 5): a vmapped chunk runs in lockstep to its
    # slowest lane, and rare pathological lanes burn 100s–1000s of inner
    # iterations (measured: sum of per-chunk max nlinsolve 997 on this rung
    # vs a p99 of 8 — stragglers, not throughput, set the chunk wall).
    # max_eval=48 bounds the fast pass (p99 lane needs 18 evals); capped
    # lanes exit `max_eval` and the rescue's budget stage re-solves them as
    # a small gathered subset at the reference budgets.  Measured at
    # B=65536: 425k -> 498-513k inst/s (542-562k with chunk=16384 on good
    # runs), still 65536/65536; on a straggler-heavy batch (second half of
    # a 131072 draw): 83k -> 323k.  Small batches skip the cap: the
    # rescue's fixed dispatch cost (~75 ms of host/tunnel round trips)
    # outweighs the straggler saving below ~16k lanes.
    cap = {} if B < 16384 else {"max_eval": 48}

    def once(rescue):
        r = vsolve(
            problem, x0s, data_batch=datas, solver=solver, max_iter=50,
            chunk_size=chunk, rescue=rescue, **cap,
        )
        jax.block_until_ready(r.states.x)
        return r

    # compile + warmup, and capture the pre-rescue failure breakdown
    pre = once(False)
    bad = ~pre.solved_mask()
    breakdown = {}
    if bad.any():
        st = np.asarray(pre.states.status)[bad]
        ms = np.asarray(pre.states.msg)[bad]
        for s, m in zip(st, ms):
            key = status_name(int(s)) + (f":{MSG[int(m)]}" if int(m) else "")
            breakdown[key] = breakdown.get(key, 0) + 1
    res = once(True)  # warm the rescue-pass compiled shapes
    t0 = time.perf_counter()
    for _ in range(reps):
        res = once(True)  # timed region INCLUDES the rescue pass
    dt = (time.perf_counter() - t0) / reps
    summ = res.summary()
    summ["breakdown_pre_rescue"] = breakdown
    return B / dt, summ, dt


def device_time_per_rep(make_fn, *args, R1=2, R2=32, tries=4):
    """Device-side seconds per repetition via in-graph repetition
    differencing: the axon tunnel adds ~25 ms fixed overhead per dispatched
    call (and block_until_ready does not reliably block), so wall-clock
    per-call timing overstates small on-chip workloads by an order of
    magnitude.  Chain R reps inside one jit with a strict data dependency,
    return (t(R2) − t(R1)) / (R2 − R1); the scalar fetch is the barrier.
    The spread R2 − R1 divides the tunnel's per-call jitter (~±4 ms
    observed), so the round-3 10-rep spread left ±0.4 ms noise on ms-scale
    quantities; round 4 widened it to 30 reps (±0.13 ms)."""
    f1, f2 = make_fn(R1), make_fn(R2)
    for f in (f1, f2):
        float(f(*args))  # compile + warm
    def t(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0
    t1 = min(t(f1) for _ in range(tries))
    t2 = min(t(f2) for _ in range(tries))
    return max((t2 - t1) / (R2 - R1), 1e-9)


def run_ba_rung(reps=3):
    """Batched bundle adjustment: the compute-representative constrained rung
    (condensed KKT N=73, Pallas fused kernel)."""
    from jax import lax

    from cannoles_tpu import CaNNOLeSSolver
    from cannoles_tpu.models.families import bundle_adjustment_batch
    from cannoles_tpu.parallel.batch import vsolve

    dtype = jnp.float32
    B, n_cams, n_pts = 256, 3, 16
    pb, x0s, datas, _ = bundle_adjustment_batch(B, n_cams, n_pts, dtype=dtype)
    solver = CaNNOLeSSolver(
        pb, method="gauss_newton", kkt="condensed", linsolve="pallas", dtype=dtype
    )

    def once():
        r = vsolve(pb, x0s, data_batch=datas, solver=solver, max_iter=40)
        jax.block_until_ready(r.states.x)
        return r

    res = once()
    t0 = time.perf_counter()
    for _ in range(reps):
        res = once()
    dt = (time.perf_counter() - t0) / reps

    # device-side batch time (dispatch-free)
    cfg = solver.make_config(max_iter=40)
    vrun = jax.vmap(solver._run_compiled, in_axes=(0, 0, None, 0))
    lam0s = jnp.zeros((B, pb.ncon), dtype)

    def mk(R):
        @jax.jit
        def f(x0s):
            def body(i, acc):
                st = vrun(x0s + acc * 1e-9, lam0s, cfg, datas)
                return acc + st.x[0, 0]
            return lax.fori_loop(0, R, body, jnp.zeros((), dtype))
        return f

    dt_dev = device_time_per_rep(mk, x0s, R1=1, R2=13)

    n, m, p = pb.nvar, pb.nequ, pb.ncon
    # BA residual: per reprojection ~60 flops (Rodrigues + projection)
    res_flops = 60 * m
    total = float(
        sum(
            flop_model(
                n=n, m=m, p=p, kkt="condensed",
                nlinsolve=int(nl), nfact=int(nf), residual_flops=res_flops,
            )
            for nl, nf in zip(np.asarray(res.states.nlinsolve), np.asarray(res.states.nfact))
        )
    )
    mfu = total / dt_dev / _peak_flops() * 100
    summ = res.summary()
    return B / dt, B / dt_dev, f"{summ['solved']}/{B}", mfu, dt


def run_large_rung():
    """One large dense NLS (8192x1024), Gauss-Newton + condensed + two-level
    Cholesky (BASELINE config 4)."""
    from cannoles_tpu import CaNNOLeSSolver, nls_problem

    dtype = jnp.float32
    m, n = 8192, 1024
    rng = np.random.default_rng(0)
    B1 = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32) / np.sqrt(n))
    B2 = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32) / np.sqrt(n))
    xtrue = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def model(x, d):
        return d["B1"] @ x + 0.1 * jnp.sin(d["B2"] @ x)

    data = {"B1": B1, "B2": B2}
    data["y"] = model(xtrue, data)
    pb = nls_problem(
        lambda x, d: model(x, d) - d["y"], jnp.zeros(n, dtype), m, data=data,
        name=f"bench_large_{m}x{n}",
    )
    from jax import lax

    s = CaNNOLeSSolver(
        pb, method="gauss_newton", kkt="condensed", linsolve="chol",
        block_size=256, dtype=dtype,
    )
    cfg = s.make_config(max_iter=30)
    st = s._run_fn(pb.x0, pb.y0, cfg, pb.data)
    jax.block_until_ready(st.x)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        st = s._run_fn(pb.x0, pb.y0, cfg, pb.data)
        jax.block_until_ready(st.x)
    dt = (time.perf_counter() - t0) / reps

    # device-side per-solve (dispatch-free); also the explicit-bf16 commit
    # mode (condensation + gate follow the chosen precision)
    def mk_chain(solver, config):
        def make(R):
            def f(x0):
                def body(i, acc):
                    stt = solver._run_compiled(x0 + acc * 1e-9, pb.y0, config, pb.data)
                    return acc + stt.x[0]
                return lax.fori_loop(0, R, body, jnp.zeros((), dtype))
            return solver._jit(f)
        return make

    dt_dev = device_time_per_rep(mk_chain(s, cfg), pb.x0)
    s16 = CaNNOLeSSolver(
        pb, method="gauss_newton", kkt="condensed", linsolve="chol",
        dtype=dtype, matmul_precision="bfloat16", quality_gate=False,
    )
    dt_bf16 = device_time_per_rep(mk_chain(s16, s16.make_config(max_iter=30)), pb.x0)

    # residual = 2 dense matvecs (+ sin): ~4mn flops
    total = flop_model(
        n=n, m=m, p=0, kkt="condensed",
        nlinsolve=int(st.nlinsolve), nfact=int(st.nfact), residual_flops=4 * m * n,
    )
    mfu = total / dt_dev / _peak_flops() * 100
    err = float(jnp.max(jnp.abs(st.x - xtrue)))
    return dt * 1e3, dt_dev * 1e3, dt_bf16 * 1e3, mfu, int(st.status), err


def main():
    dtype = jnp.float32
    problem = build_problem(dtype)
    budget = float(os.environ.get("BENCH_BUDGET", 450))
    t0 = time.time()

    # (linsolve, B, chunk).  All-pallas ladder: the Pallas fused-kernel
    # programs compile cold in single-digit seconds (measured: 1.7 s for the
    # chunked B=32768 program, XLA graph is tiny because the factorization is
    # one custom-kernel call), whereas the old `ldlt` rung — blocked-jnp
    # elimination + batched triangular solves vmapped at N=5 — cost 15+ min
    # of cold XLA compile and starved the whole ladder in round 2
    # (BENCH_r02.json).  The ldlt backend stays available for comparison via
    # BENCH_LDLT=1; it is not on the default path.
    ladder = [
        ("pallas", 4096, None),
        ("pallas", 32768, 4096),
        ("pallas", 65536, 4096),
        ("pallas", 65536, 16384),
    ]
    if os.environ.get("BENCH_LDLT"):
        ladder.insert(0, ("ldlt", 2048, None))
    if os.environ.get("BENCH_B"):
        ladder = [("pallas", int(os.environ["BENCH_B"]),
                   int(os.environ.get("BENCH_CHUNK", 0)) or None)]

    best = None
    best_summ = None
    warmup_total = 0.0
    for linsolve, B, chunk in ladder:
        elapsed = time.time() - t0
        if best is not None and elapsed > budget * 0.6:
            break
        try:
            tw = time.time()
            value, summ, dt = run_config(problem, linsolve, B, chunk, dtype)
            warmup = time.time() - tw - 3 * dt  # compile + first run
            warmup_total += warmup
        except Exception as e:  # noqa: BLE001 — keep the best completed rung
            print(f"# config {linsolve}/B={B}/chunk={chunk} failed: {e}", file=sys.stderr)
            continue
        frac = summ["solved"] / B
        print(
            f"# {linsolve} B={B} chunk={chunk}: {value:.0f} inst/s "
            f"solved={summ['solved']}/{B} (pre-rescue failures: "
            f"{summ['breakdown_pre_rescue'] or 'none'}) t={dt:.4f}s "
            f"warmup={warmup:.0f}s (elapsed {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )
        if frac < 0.99:
            # solved-rate gate (raised from the round-3 implicit pass-through):
            # a config that can't solve 99% even after the gate-on rescue does
            # not get to claim the headline
            print(
                f"# {linsolve} B={B}: solved rate {frac:.4f} < 0.99 — "
                "excluded from headline", file=sys.stderr,
            )
            continue
        if best is None or value > best:
            best = value
            best_summ = summ

    def attempt_twice(fn, label):
        """Run a rung with ONE retry: the axon tunnel occasionally drops a
        remote_compile response mid-read (observed: 'response body closed
        before all bytes were read'); a transient failure must not cost the
        round its payload."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            print(f"# {label} attempt 1 failed ({e}); retrying", file=sys.stderr)
            return fn()

    extra = {}
    if time.time() - t0 < budget * 0.8:
        try:
            sps, sps_dev, solved, mfu, dt = attempt_twice(run_ba_rung, "BA rung")
            extra.update(
                ba_scenes_per_s=round(sps, 1),
                ba_scenes_per_s_device=round(sps_dev, 1),
                ba_solved=solved,
                ba_mfu_pct=round(mfu, 3),
            )
            print(
                f"# BA rung: {sps:.0f} scenes/s wall, {sps_dev:.0f} device "
                f"solved={solved} mfu={mfu:.3f}% t={dt:.4f}s "
                f"(elapsed {time.time()-t0:.0f}s)",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            print(f"# BA rung failed: {e}", file=sys.stderr)
    if time.time() - t0 < budget * 0.9:
        try:
            ms, ms_dev, ms_bf16, mfu, status, err = attempt_twice(
                run_large_rung, "large rung"
            )
            extra.update(
                large_ms_per_solve=round(ms, 2),
                large_ms_device=round(ms_dev, 2),
                large_ms_device_bf16=round(ms_bf16, 2),
                large_mfu_pct=round(mfu, 1),
            )
            print(
                f"# large rung: {ms:.1f} ms/solve wall, {ms_dev:.2f} device, "
                f"{ms_bf16:.2f} bf16-commit; mfu={mfu:.1f}% status={status} "
                f"err={err:.2e} (elapsed {time.time()-t0:.0f}s)",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            print(f"# large rung failed: {e}", file=sys.stderr)
    extra["warmup_s"] = round(warmup_total, 1)
    extra["total_s"] = round(time.time() - t0, 1)
    if best_summ is not None:
        extra["headline_solved"] = f"{best_summ['solved']}"
        if best_summ["breakdown_pre_rescue"]:
            extra["headline_failures_pre_rescue"] = best_summ["breakdown_pre_rescue"]

    if best is None:
        print(json.dumps({"metric": "batched_lm_instances_per_s_per_chip",
                          "value": 0.0, "unit": "instances/s", "vs_baseline": 0.0,
                          "extra": extra}))
        return
    print(
        json.dumps(
            {
                "metric": "batched_lm_instances_per_s_per_chip",
                "value": round(best, 1),
                "unit": "instances/s",
                "vs_baseline": round(best / 1000.0, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
