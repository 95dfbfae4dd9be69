"""Instance-batch data parallelism: vmapped solves, sharded across a mesh.

This is parallelism axis #1 of the TPU build (SURVEY.md §2.3): the reference
is a single-CPU solver, so batching thousands of NLS instances is new
capability mandated by the BASELINE north star.  The entire solver state
machine (init → outer while_loop → status) is vmapped — per-instance control
flow (rho bumps, backtracking, inner-loop lengths, convergence) runs in
masked lanes, and one diverging instance cannot stall or kill the batch
(unlike the reference, which raises; SURVEY.md §5 failure handling).

Sharding: the batch axis is laid out over a ``jax.sharding.Mesh`` with
``NamedSharding(P('batch'))``; XLA partitions the vmapped program across
devices with zero communication in the solve itself, and batch-level
convergence statistics are reduced with ``psum``-style collectives
(``summarize``)."""

from __future__ import annotations

import dataclasses
import time
import warnings
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.solver import CaNNOLeSSolver, SolverState
from ..core.status import Status
from ..problem import NLSProblem

__all__ = ["vsolve", "BatchResult", "make_batch_mesh"]


@dataclasses.dataclass
class BatchResult:
    """Batched terminal states + host-side summary accessors."""

    states: SolverState  # every leaf has a leading batch axis

    @property
    def solution(self):
        return np.asarray(self.states.x)

    @property
    def multipliers(self):
        return np.asarray(self.states.lam)

    @property
    def status(self):
        return np.asarray(self.states.status)

    @property
    def objective(self):
        return np.asarray(self.states.fx)

    @property
    def iterations(self):
        return np.asarray(self.states.iter)

    @property
    def dual_feas(self):
        return np.asarray(self.states.normdual)

    def solved_mask(self) -> np.ndarray:
        st = self.status
        return (st == Status.FIRST_ORDER) | (st == Status.SMALL_RESIDUAL)

    def summary(self) -> Dict[str, Any]:
        st = self.status
        return {
            "n": int(st.shape[0]),
            "solved": int(self.solved_mask().sum()),
            "first_order": int((st == Status.FIRST_ORDER).sum()),
            "small_residual": int((st == Status.SMALL_RESIDUAL).sum()),
            "exception": int((st == Status.EXCEPTION).sum()),
            "mean_iter": float(self.iterations.mean()),
            "max_iter": int(self.iterations.max()),
        }


def make_batch_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("batch",))


def vsolve(
    problem: NLSProblem,
    x0_batch,
    lam0_batch=None,
    data_batch=None,
    *,
    solver: Optional[CaNNOLeSSolver] = None,
    method: str = "newton",
    linsolve: str = "auto",
    mesh: Optional[Mesh] = None,
    max_iter: int = 100,
    chunk_size: Optional[int] = None,
    max_time: Optional[float] = None,
    rescue: bool = False,
    **numeric,
) -> BatchResult:
    """Solve a batch of instances of one problem family in a single compiled
    program (BASELINE configs 3 & 5).

    ``x0_batch``: (B, nvar).  ``data_batch``: optional pytree whose leaves
    carry a leading B axis, parameterizing per-instance problem data.  With a
    ``mesh``, the batch axis is sharded across its devices.

    ``max_time``: approximate wall-clock budget in seconds (reference budget
    semantics, CaNNOLeS.jl:123-125).  A compiled batch cannot be interrupted
    mid-flight, so the budget is enforced *between chunks*: dispatch switches
    to sequential host-driven chunks (``chunk_size`` lanes each, default
    ``min(B, 1024)``), the deadline is checked after each chunk, and lanes
    never dispatched return with status ``max_time``.  Accuracy is therefore
    ± one chunk's solve time; requires ``mesh=None``.

    ``rescue``: re-solve the unsolved lanes (only) with the backward-error
    quality gate forced on, from their ORIGINAL starts, and merge.  The f32
    unpivoted LDLᵀ occasionally delivers a non-descent direction on an
    ill-conditioned early iterate (line-search abort, the reference's
    Dϕ ≥ 0 error); the gate demotes those factorizations so the ρ ladder
    regularizes instead.  Running gated everywhere costs a measured ~14%
    batch throughput at tiny N, so the default path stays ungated and the
    rescue pays the gate only for the (typically ≲0.5%) failed lanes —
    measured 4085/4096 → 4096/4096 on the headline rung at full speed.
    """
    problem.validate_for_solve()
    if solver is None:
        # linsolve='auto' under vmap: the lanes-batched Pallas LDLᵀ kernel is
        # the measured-best batched backend (RESULTS.md kernel table: 2.6×
        # faster inside the full solver and far more f32-robust than the
        # vmapped blocked-jnp path) wherever the full KKT fits its VMEM cap;
        # beyond the cap fall back to 'ldlt'.
        if linsolve == "auto":
            from ..core.solver import _pallas_batch_cap

            N = problem.nvar + problem.nequ + problem.ncon
            linsolve = "pallas" if N <= _pallas_batch_cap() else "ldlt"
        solver = CaNNOLeSSolver(problem, method=method, linsolve=linsolve)
    x0_batch = jnp.asarray(x0_batch, dtype=solver.dtype)
    B = x0_batch.shape[0]
    if lam0_batch is None:
        lam0_batch = jnp.broadcast_to(
            jnp.asarray(problem.y0, dtype=solver.dtype), (B, problem.ncon)
        )
    cfg = solver.make_config(max_iter=max_iter, **numeric)

    if max_time is not None:
        if mesh is not None:
            raise ValueError(
                "vsolve(max_time=...) requires mesh=None: the budget is "
                "enforced by host-driven chunk dispatch"
            )
        return _vsolve_deadline(
            solver, x0_batch, lam0_batch, data_batch, cfg, chunk_size, max_time
        )

    use_chunks = (
        chunk_size is not None and mesh is None and B % chunk_size == 0 and B > chunk_size
    )
    # chunk_size == B asks for exactly one chunk — the flat vmap IS that; no
    # warning.  Otherwise a silent fallback would hand a user asking for
    # straggler control a potentially much larger compile — say so.
    if chunk_size is not None and not use_chunks and not (mesh is None and chunk_size == B):
        warnings.warn(
            f"vsolve: chunk_size={chunk_size} ignored "
            f"({'mesh is set' if mesh is not None else f'chunking requires chunk_size < B dividing B (B={B})'}); "
            "running one flat vmap over the whole batch",
            stacklevel=2,
        )
    run = solver.batch_runner(
        data_batched=data_batch is not None,
        batch_shape=(B, chunk_size) if use_chunks else None,
    )

    if mesh is not None:
        sh = NamedSharding(mesh, P("batch"))
        x0_batch = jax.device_put(x0_batch, sh)
        lam0_batch = jax.device_put(lam0_batch, sh)
        if data_batch is not None:
            data_batch = jax.tree.map(lambda a: jax.device_put(a, sh), data_batch)

    states = run(x0_batch, lam0_batch, cfg, data_batch)
    result = BatchResult(states=states)
    if rescue and not solver.quality_gate:
        result = _rescue_unsolved(
            solver, result, x0_batch, lam0_batch, data_batch, cfg
        )
    return result


def _rescue_unsolved(solver, result, x0_batch, lam0_batch, data_batch, cfg):
    """Two-stage re-solve of the unsolved lanes, merged back in place.

    Stage 1: the same backend with the backward-error quality gate forced
    on (repairs the Dϕ ≥ 0 line-search aborts — bad unpivoted f32
    factorizations that the gate demotes into the ρ ladder).  Stage 2: any
    lane still unsolved goes to the exact-inertia ``eigh`` backend — the
    reference's two-backend seam (CaNNOLeS.jl:317-332).  Stage 2 exists
    because a small tail of knife-edge f32 instances sits exactly at the
    gate threshold: XLA's batch-shape-dependent matmul tiling flips their
    gate verdict with batch composition (measured: the same lane solves
    alone, fails among 127 easy lanes, solves among 8 hard ones), whereas
    eigh is deterministic and needs no gate.  Vmapped eigh is ~70× slower
    per lane, which is irrelevant on a ≲0.2% subset.

    Each rescue subset is padded to the next power of two (lane-0
    duplicates) so repeated calls hit at most log2(B) compiled shapes."""

    def _pass(res, sibling):
        idx = np.nonzero(~res.solved_mask())[0]
        if idx.size == 0:
            return res
        k = 1 << (int(idx.size) - 1).bit_length()
        pad = np.zeros(k, dtype=idx.dtype)
        pad[: idx.size] = idx
        sel = jnp.asarray(pad)
        ds = (
            None
            if data_batch is None
            else jax.tree.map(lambda a: a[sel], data_batch)
        )
        run = sibling.batch_runner(data_batched=data_batch is not None)
        sub = run(x0_batch[sel], lam0_batch[sel], cfg, ds)
        merged = jax.tree.map(
            lambda full, part: jnp.asarray(full).at[jnp.asarray(idx)].set(
                part[: idx.size]
            ),
            res.states,
            sub,
        )
        return BatchResult(states=merged)

    common = dict(
        method=solver.method,
        kkt=solver.kkt,
        use_initial_multiplier=solver.use_initial_multiplier,
        always_accept_extrapolation=solver.always_accept_extrapolation,
        lm_damping=solver.lm_damping,
        block_size=solver.block_size,
        params=solver.params,
        matmul_precision=solver.matmul_precision,
        dtype=solver.dtype,
    )
    result = _pass(
        result,
        CaNNOLeSSolver(
            solver.problem,
            linsolve=solver.linsolve,
            quality_gate=True,
            robust_fallback=solver.robust_fallback,
            **common,
        ),
    )
    if (~result.solved_mask()).any():
        # eigh handles either KKT form (exact inertia on the indefinite
        # dense system); the solver's form is kept
        result = _pass(
            result,
            CaNNOLeSSolver(solver.problem, linsolve="eigh", **common),
        )
    return result


def _vsolve_deadline(solver, x0_batch, lam0_batch, data_batch, cfg, chunk_size, max_time):
    """Host-driven chunked dispatch with a wall-clock deadline between chunks.

    Lanes in chunks never dispatched are initialized (one residual/constraint
    evaluation — needed for an honest terminal state) and stamped
    ``Status.MAX_TIME`` unless the init itself already terminated them."""
    B = x0_batch.shape[0]
    chunk = min(B, 1024 if chunk_size is None else int(chunk_size))
    t0 = time.time()

    vrun = solver.batch_runner(data_batched=data_batch is not None, batch_shape=None)
    cache = getattr(solver, "_vinit_fns", None)
    if cache is None:
        cache = solver._vinit_fns = {}
    key = data_batch is not None
    vinit = cache.get(key)
    if vinit is None:
        vinit = cache[key] = jax.jit(
            jax.vmap(solver._init_state, in_axes=(0, 0, None, 0 if key else None))
        )

    out = []
    expired = False
    for lo in range(0, B, chunk):
        hi = min(lo + chunk, B)
        xc, lc = x0_batch[lo:hi], lam0_batch[lo:hi]
        dc = None if data_batch is None else jax.tree.map(lambda a: a[lo:hi], data_batch)
        if expired:
            st = vinit(xc, lc, cfg, dc)
            st = st._replace(
                status=jnp.where(
                    st.status == Status.UNKNOWN,
                    jnp.full_like(st.status, Status.MAX_TIME),
                    st.status,
                )
            )
        else:
            st = vrun(xc, lc, cfg, dc)
            jax.block_until_ready(st.x)
            expired = (time.time() - t0) > max_time
        out.append(st)
    states = jax.tree.map(lambda *ls: jnp.concatenate(ls, axis=0), *out)
    return BatchResult(states=states)
