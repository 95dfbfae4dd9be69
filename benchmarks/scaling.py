#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE config 5 / stage E).

Shards a large instance batch over 1..N devices and reports throughput +
efficiency.  On this container real hardware is one chip, so multi-device
numbers come from the virtual CPU mesh (--cpu N); on a pod the same script
measures ICI/DCN scaling directly.

    python benchmarks/scaling.py --cpu 8 -B 4096
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0, help="force N virtual CPU devices")
    ap.add_argument("-B", type=int, default=4096)
    args = ap.parse_args()

    if args.cpu:
        from cannoles_tpu.utils.testing import force_cpu

        force_cpu(n_devices=args.cpu, x64=False)

    import jax.numpy as jnp
    import numpy as np

    from cannoles_tpu import nls_problem
    from cannoles_tpu.parallel.multihost import scaling_bench

    def residual(x, d):
        return jnp.array([x[0] - d[0], 10 * (x[1] - x[0] ** 2) - d[1]])

    def cons(x, d):
        return jnp.array([x[0] + x[1] - d[2]])

    pb = nls_problem(
        residual, jnp.array([-1.2, 1.0]), 2, cons, [0.0], [0.0],
        data=jnp.zeros((3,)), name="scaling_family",
    )
    rng = np.random.default_rng(0)
    B = args.B
    x0s = rng.normal(scale=0.5, size=(B, 2)) + [-1.2, 1.0]
    datas = np.stack(
        [1 + 0.2 * rng.normal(size=B), 0.1 * rng.normal(size=B), 1 + 0.2 * rng.normal(size=B)],
        axis=1,
    )
    if args.cpu:
        print(
            "# NOTE: virtual CPU devices share one physical CPU — efficiency "
            "numbers here validate the sharded program, not hardware scaling."
        )
    rows = scaling_bench(pb, x0s, datas)
    # label every row so downstream consumers can't mistake virtual-mesh
    # program validation for hardware scaling evidence
    import jax

    mesh_kind = (
        "virtual_cpu_shared_core" if (args.cpu or jax.default_backend() == "cpu")
        else "hardware"
    )
    for r in rows:
        r["mesh"] = mesh_kind
        print(
            f"devices={r['devices']:<3d} throughput={r['throughput']:.0f}/s "
            f"speedup={r['speedup']:.2f} efficiency={r['efficiency']*100:.0f}% "
            f"[{mesh_kind}]"
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
