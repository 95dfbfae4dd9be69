"""Multi-host execution: distributed init, global meshes, scaling harness.

BASELINE config 5: a 100k-instance constrained-NLS sweep sharded across a
multi-host pod slice, with psum'd batch convergence statistics.  The
communication design (SURVEY.md §2.3): JAX collectives compiled onto ICI
within a slice and DCN across slices — XLA owns transport, there is no
custom NCCL-equivalent to write.

On a real pod each host calls :func:`init_distributed` then builds the
global mesh over all devices; in tests the same code runs on N virtual CPU
devices (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.solver import CaNNOLeSSolver
from ..problem import NLSProblem

__all__ = [
    "init_distributed",
    "global_batch_mesh",
    "batch_convergence_stats",
    "scaling_bench",
]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op if single-process or already up)."""
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # single-process / already initialized


def global_batch_mesh(axis_name: str = "batch") -> Mesh:
    """1-D mesh over every device of every host (ICI + DCN)."""
    return Mesh(np.asarray(jax.devices()), axis_names=(axis_name,))


def batch_convergence_stats(states, mesh: Mesh, axis_name: str = "batch"):
    """Cross-device reduction of batch-level convergence statistics — the
    psum pattern of config 5.  Returns a replicated dict of scalars."""

    @jax.jit
    def reduce(status, iters, normdual):
        solved = jnp.sum((status == 1) | (status == 2))
        return {
            "solved": solved,
            "n": jnp.asarray(status.shape[0], jnp.int32),
            "total_iters": jnp.sum(iters),
            "max_dual_feas": jnp.max(normdual),
        }

    out = reduce(states.status, states.iter, states.normdual)
    return {k: np.asarray(v).item() for k, v in out.items()}


def scaling_bench(
    problem: NLSProblem,
    x0_batch,
    data_batch=None,
    device_counts: Optional[Sequence[int]] = None,
    *,
    method: str = "lm",
    kkt: str = "condensed",
    max_iter: int = 50,
    reps: int = 3,
) -> List[Dict]:
    """Measure vsolve throughput at increasing device counts and report
    scaling efficiency vs the single-device run.

    The instance batch is sharded over the first k devices for each k in
    ``device_counts``; efficiency = (throughput_k / k) / (throughput_1 / 1).
    A 1-device baseline row is inserted automatically if ``device_counts``
    does not start at 1, so the reported efficiency is always absolute (the
    ≥80%-at-2-hosts target is measured against a true single-device run);
    each row also carries ``baseline_devices`` naming the normalization.
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    device_counts = list(device_counts)
    if device_counts and device_counts[0] != 1:
        device_counts.insert(0, 1)
    solver = CaNNOLeSSolver(problem, method=method, kkt=kkt)
    x0_batch = jnp.asarray(x0_batch, solver.dtype)
    B = x0_batch.shape[0]
    lam0 = jnp.zeros((B, problem.ncon), solver.dtype)
    cfg = solver.make_config(max_iter=max_iter)
    run = jax.jit(
        jax.vmap(
            solver._run_compiled,
            in_axes=(0, 0, None, None if data_batch is None else 0),
        )
    )

    results: List[Dict] = []
    base = None
    for k in device_counts:
        mesh = Mesh(np.asarray(devices[:k]), axis_names=("batch",))
        sh = NamedSharding(mesh, P("batch"))
        xs = jax.device_put(x0_batch, sh)
        ls = jax.device_put(lam0, sh)
        ds = (
            None
            if data_batch is None
            else jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), data_batch)
        )
        states = run(xs, ls, cfg, ds)
        jax.block_until_ready(states.x)  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            states = run(xs, ls, cfg, ds)
            jax.block_until_ready(states.x)
        dt = (time.perf_counter() - t0) / reps
        thr = B / dt
        if base is None:
            base = thr
        results.append(
            {
                "devices": k,
                "throughput": thr,
                "time": dt,
                "speedup": thr / base,
                "efficiency": (thr / k) / (base / device_counts[0]),
                "baseline_devices": device_counts[0],
            }
        )
    return results
