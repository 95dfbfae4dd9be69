#!/usr/bin/env python
"""Config-4 benchmark: one large dense NLS (default 10240 residuals x 1024
vars), Gauss-Newton + condensed Schur reduction.

Single chip:           python benchmarks/bench_large.py
Row-sharded (k dev):   python benchmarks/bench_large.py --shard [--cpu 8]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", type=int, default=10240)
    ap.add_argument("-n", type=int, default=1024)
    ap.add_argument("--cpu", type=int, default=0)
    ap.add_argument("--shard", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from cannoles_tpu.utils.testing import force_cpu

        force_cpu(n_devices=args.cpu, x64=False)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cannoles_tpu import CaNNOLeSSolver, nls_problem

    dtype = jnp.float32
    m, n = args.m, args.n
    rng = np.random.default_rng(0)
    B1 = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32) / np.sqrt(n))
    B2 = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32) / np.sqrt(n))
    xtrue = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def model(x, t):
        return t["B1"] @ x + 0.1 * jnp.sin(t["B2"] @ x)

    data = {"B1": B1, "B2": B2}
    data["y"] = model(xtrue, data)

    pb = nls_problem(
        lambda x, d: model(x, d) - d["y"], jnp.zeros(n, dtype), m, data=data,
        name=f"large_{m}x{n}",
    )

    if args.shard:
        from cannoles_tpu.parallel.schur import make_row_mesh, solve_row_sharded

        t0 = time.perf_counter()
        stats = solve_row_sharded(pb, make_row_mesh(), max_iter=30)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        stats = solve_row_sharded(pb, make_row_mesh(), max_iter=30)
        tr = time.perf_counter() - t0
        print(f"sharded: compile+run={tc:.1f}s run={tr:.3f}s status={stats.status} iters={stats.iter}")
        return

    s = CaNNOLeSSolver(pb, method="gauss_newton", kkt="condensed", linsolve="chol", block_size=128, dtype=dtype)
    cfg = s.make_config(max_iter=30)
    t0 = time.perf_counter()
    st = s._run_fn(pb.x0, pb.y0, cfg, pb.data)
    jax.block_until_ready(st.x)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    st = s._run_fn(pb.x0, pb.y0, cfg, pb.data)
    jax.block_until_ready(st.x)
    tr = time.perf_counter() - t0
    err = float(jnp.max(jnp.abs(st.x - xtrue)))
    print(
        f"{m}x{n}: compile+run={tc:.1f}s run={tr*1e3:.1f}ms status={int(st.status)} "
        f"iters={int(st.iter)} nfact={int(st.nfact)} err={err:.2e}"
    )


if __name__ == "__main__":
    main()
