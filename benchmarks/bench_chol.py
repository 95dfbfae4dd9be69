#!/usr/bin/env python
"""Owned Pallas blocked Cholesky vs XLA cholesky — device-side study.

Measurement notes (hard-won): the axon tunnel adds ~25 ms fixed dispatch
overhead per jitted call and `block_until_ready` does not reliably block, so
naive per-call timing is meaningless at these sizes.  This bench chains R
factorizations inside ONE jitted `lax.fori_loop` with a strict data
dependency, returns a scalar (no large fetch), and reports
(t(R2) − t(R1)) / (R2 − R1) — pure device time per factorization.

Outcome on TPU v5e (RESULTS.md "owned-kernel study"): XLA's cholesky is
3–8x faster device-side at N = 512–2048, so the solver default stays XLA
(`pallas_chol_min` opt-in).  The kernel remains the owned seam with the
MA57-analog raw-pivot signal.

    python benchmarks/bench_chol.py [--json out.json]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def scalar_bench(make_fn, *args, R1=4, R2=44):
    """Device-time per iteration via in-graph repetition differencing."""
    f1, f2 = make_fn(R1), make_fn(R2)
    for f in (f1, f2):
        float(f(*args))  # compile + warm
    def t(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0
    t1 = min(t(f1) for _ in range(3))
    t2 = min(t(f2) for _ in range(3))
    return (t2 - t1) / (R2 - R1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from cannoles_tpu.utils.testing import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.scipy.linalg import cho_solve

    from cannoles_tpu.ops.pallas_chol import block_cho_solve, pallas_cholesky

    rows = []
    for N in (256, 512, 1024, 2048, 4096):
        rng = np.random.default_rng(0)
        G = rng.normal(size=(N, N)).astype(np.float32)
        A = jnp.asarray(G @ G.T + N * np.eye(N, dtype=np.float32))
        b = jnp.asarray(rng.normal(size=N).astype(np.float32))

        def mk_xla(R):
            @jax.jit
            def f(M0):
                return lax.fori_loop(
                    0, R, lambda i, M: M + 1e-8 * jnp.linalg.cholesky(M), M0
                )[0, 0]
            return f

        def mk_pal(R):
            @jax.jit
            def f(M0):
                return lax.fori_loop(
                    0, R,
                    lambda i, M: M + 1e-8 * pallas_cholesky(M, tol=1e-7, nb=128).L,
                    M0,
                )[0, 0]
            return f

        row = {"N": N}
        row["xla_fact_ms"] = scalar_bench(mk_xla, A) * 1e3
        row["pal_fact_ms"] = scalar_bench(mk_pal, A) * 1e3
        row["fact_speedup_pal_over_xla"] = row["xla_fact_ms"] / row["pal_fact_ms"]
        # correctness cross-check
        x_ref = np.asarray(
            jax.jit(lambda A, b: cho_solve((jnp.linalg.cholesky(A), True), b))(A, b)
        )
        x_pal = np.asarray(
            jax.jit(
                lambda A, b: block_cho_solve(pallas_cholesky(A, tol=1e-7, nb=128), b)
            )(A, b)
        )
        row["rel_err"] = float(
            np.max(np.abs(x_pal - x_ref)) / (np.max(np.abs(x_ref)) + 1e-30)
        )
        rows.append(row)
        print(
            f"N={N:5d}  device-side fact: xla {row['xla_fact_ms']:.3f} ms | "
            f"pallas {row['pal_fact_ms']:.3f} ms "
            f"({row['fact_speedup_pal_over_xla']:.2f}x)  rel_err {row['rel_err']:.1e}",
            flush=True,
        )
    if args.json:
        pathlib.Path(args.json).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
