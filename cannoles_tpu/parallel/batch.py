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
    # the solver vsolve ran with (auto-construction is observable/reusable)
    solver: Optional[CaNNOLeSSolver] = None

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
    kkt: str = "auto",
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

    ``kkt``: 'auto' (default — same measured-best policy as ``cannoles()``:
    condensed (n+p)² Schur form for m ≫ n families) | 'full' | 'condensed'.
    Ignored when ``solver`` is passed.

    ``max_time``: approximate wall-clock budget in seconds (reference budget
    semantics, CaNNOLeS.jl:123-125).  A compiled batch cannot be interrupted
    mid-flight, so the budget is enforced *between chunks*: dispatch switches
    to sequential host-driven chunks (``chunk_size`` lanes each, default
    ``min(B, 1024)``), the deadline is checked after each chunk, and lanes
    never dispatched return with status ``max_time``.  Accuracy is therefore
    ± one chunk's solve time; requires ``mesh=None``.

    ``rescue``: re-solve the unsolved lanes (only) with the backward-error
    quality gate forced on, from their ORIGINAL starts, then any still-
    unsolved lanes on the exact-inertia ``eigh`` backend, and merge.  The
    f32 unpivoted LDLᵀ occasionally delivers a non-descent direction on an
    ill-conditioned early iterate (line-search abort, the reference's
    Dϕ ≥ 0 error); the gate demotes those factorizations so the ρ ladder
    regularizes instead.  Running gated everywhere costs a measured ~14%
    batch throughput at tiny N, so the default path stays ungated and the
    rescue pays the gate only for the (typically ≲0.5%) failed lanes —
    measured 4085/4096 → 4096/4096 on the headline rung at full speed.
    Composes with every dispatch mode: under ``max_time`` the rescue runs
    only if budget remains and only on dispatched lanes; with a solver that
    already runs gated, the identical stage 1 is skipped and the eigh stage
    still runs (no silently-ignored kwarg combinations).
    """
    problem.validate_for_solve()
    if solver is None:
        # kkt='auto' routes through the same measured-best policy as
        # cannoles() (resolve_auto): a batched m ≫ n family gets the
        # condensed (n+p)² Schur form, not the full (n+m+p)² system.
        # linsolve='auto' under vmap: the lanes-batched Pallas LDLᵀ kernel is
        # the measured-best batched backend (RESULTS.md kernel table: 2.6×
        # faster inside the full solver and far more f32-robust than the
        # vmapped blocked-jnp path) wherever the KKT — full OR condensed
        # quasi-definite — fits its VMEM cap; beyond the cap fall back to
        # the two-level 'chol' (condensed GN/LM) or blocked 'ldlt'.
        from ..core.solver import _check_available_method, _pallas_batch_cap, resolve_auto

        method_r = _check_available_method(method)
        if kkt == "auto":
            _, kkt, _ = resolve_auto(problem, method_r, "auto", "auto")
        if linsolve == "auto":
            n, m, p = problem.nvar, problem.nequ, problem.ncon
            N = (n + p) if kkt == "condensed" else (n + m + p)
            if N <= _pallas_batch_cap():
                linsolve = "pallas"
            elif kkt == "condensed" and method_r in ("gauss_newton", "lm"):
                linsolve = "chol"
            else:
                linsolve = "ldlt"
        solver = CaNNOLeSSolver(problem, method=method, linsolve=linsolve, kkt=kkt)
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
        result, remaining = _vsolve_deadline(
            solver, x0_batch, lam0_batch, data_batch, cfg, chunk_size, max_time
        )
        if rescue and remaining > 0:
            # honor rescue under deadline dispatch (round-4 finding: it was
            # silently dropped).  Only dispatched-but-failed lanes are
            # eligible — lanes stamped max_time were never run, and the
            # budget already spoke for them; the rescue itself runs only
            # while budget remains.
            eligible = result.status != Status.MAX_TIME
            result = _rescue_unsolved(
                solver, result, x0_batch, lam0_batch, data_batch, cfg,
                skip_stage1=solver.quality_gate, eligible=eligible,
            )
        return result

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
    result = BatchResult(states=states, solver=solver)
    if rescue:
        result = _rescue_unsolved(
            solver, result, x0_batch, lam0_batch, data_batch, cfg,
            skip_stage1=solver.quality_gate,
        )
    return result


def _rescue_unsolved(
    solver, result, x0_batch, lam0_batch, data_batch, cfg,
    skip_stage1: bool = False, eligible=None,
):
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

    ``skip_stage1``: when the caller's solver already runs gated, stage 1
    would be an identical re-run — skip straight to the eigh stage (round-4
    advisor finding: rescue must not silently no-op for gated solvers).
    ``eligible``: optional boolean lane mask restricting which unsolved
    lanes may be rescued (deadline dispatch excludes never-run lanes).

    Each rescue subset is padded to the next power of two so repeated calls
    hit at most log2(B) compiled shapes; pad slots carry the OUT-OF-RANGE
    index B, so the jitted scatter-merge drops them (``mode='drop'``) and a
    pad lane can never overwrite a real lane's state.

    Dispatch economy (round-5 finding): with the rescue inside the timed
    region, its cost is dominated not by device compute (the subset is
    ≲0.2% of lanes) but by host-side overhead per repetition — re-tracing a
    freshly constructed sibling solver and dispatching one un-jitted
    ``.at[].set`` merge per state leaf (~25 ms tunnel latency each, ~30
    leaves).  The siblings are therefore cached on the primary solver, the
    (x0, λ0, data) gather is one jitted call, and the merge is one jitted
    call — four dispatches per pass total.

    Budget caps are LIFTED in the rescue passes: the rescue re-solves with
    the reference eval/inner budgets (CaNNOLeS.jl:123-125) even when the
    caller capped them.  This is the straggler-mitigation contract — a
    vmapped chunk runs in lockstep to its slowest lane, so the fast pass
    may cap ``max_eval`` to bound chunk spin (lanes exceeding it exit
    ``max_eval``/``stalled``), and the rescue re-solves exactly that tail
    as a small gathered subset where a long solve costs only itself."""

    # reference budgets for the re-solve, regardless of fast-path caps
    cfg = cfg._replace(
        max_eval=jnp.asarray(100000, jnp.int32),
        max_inner=jnp.asarray(10000, jnp.int32),
    )

    def _pass(res, sibling, only=None):
        bad = ~res.solved_mask()
        if eligible is not None:
            bad &= np.asarray(eligible)
        if only is not None:
            bad &= only
        idx = np.nonzero(bad)[0]
        if idx.size == 0:
            return res
        B = x0_batch.shape[0]
        k = 1 << (int(idx.size) - 1).bit_length()
        pad = np.full(k, B, dtype=np.int64)  # B = out of range → merge drops
        pad[: idx.size] = idx
        sel_in = jnp.asarray(np.minimum(pad, B - 1))  # in-range for gather
        xg, lg, dg = _gather_tree((x0_batch, lam0_batch, data_batch), sel_in)
        run = sibling.batch_runner(data_batched=data_batch is not None)
        sub = run(xg, lg, cfg, dg)
        merged = _scatter_merge(res.states, sub, jnp.asarray(pad))
        return BatchResult(states=merged, solver=res.solver)

    cache = solver.__dict__.setdefault("_rescue_siblings", {})

    def _sibling(kind):
        sib = cache.get(kind)
        if sib is None:
            common = dict(
                method=solver.method,
                kkt=solver.kkt,
                use_initial_multiplier=solver.use_initial_multiplier,
                always_accept_extrapolation=solver.always_accept_extrapolation,
                lm_damping=solver.lm_damping,
                multiplier_refit=solver.multiplier_refit,
                block_size=solver.block_size,
                params=solver.params,
                matmul_precision=solver.matmul_precision,
                dtype=solver.dtype,
            )
            if kind == "gated":
                sib = CaNNOLeSSolver(
                    solver.problem,
                    linsolve=solver.linsolve,
                    quality_gate=True,
                    robust_fallback=solver.robust_fallback,
                    **common,
                )
            else:
                # eigh handles either KKT form (exact inertia on the
                # indefinite dense system); the solver's form is kept
                sib = CaNNOLeSSolver(solver.problem, linsolve="eigh", **common)
            cache[kind] = sib
        return sib

    # Stage 0 — budget-limited lanes (stalled / max_iter / max_eval) re-run
    # on the PRIMARY solver with the reference budgets: they don't need a
    # different backend, they need budget.  Re-solving them gated instead
    # can land on the backward-error gate's knife edge (batch-shape-
    # dependent verdicts, measured: 88/88 budget-stalled lanes broke with
    # ρ-exhaustion under the gate at one subset shape) and punt
    # convergent-but-slow straggler lanes onto the expensive eigh tail.
    budget_lanes = np.isin(
        np.asarray(result.status),
        (int(Status.STALLED), int(Status.MAX_ITER), int(Status.MAX_EVAL)),
    )
    if budget_lanes.any():
        result = _pass(result, solver, only=budget_lanes)
    if not skip_stage1:
        result = _pass(result, _sibling("gated"))
    if (~result.solved_mask()).any():
        result = _pass(result, _sibling("eigh"))
    return result


@jax.jit
def _gather_tree(tree, sel):
    return jax.tree.map(lambda a: a[sel], tree)


@jax.jit
def _scatter_merge(full_states, part_states, sel):
    """Write the rescued lanes back; out-of-range pad indices are dropped."""
    return jax.tree.map(
        lambda f, p: f.at[sel].set(p, mode="drop"), full_states, part_states
    )


def _vsolve_deadline(solver, x0_batch, lam0_batch, data_batch, cfg, chunk_size, max_time):
    """Host-driven chunked dispatch with a wall-clock deadline between chunks.

    Lanes in chunks never dispatched are initialized (one residual/constraint
    evaluation — needed for an honest terminal state) and stamped
    ``Status.MAX_TIME`` unless the init itself already terminated them.
    Returns ``(BatchResult, remaining_budget_seconds)`` so the caller can
    decide whether a rescue pass still fits the budget."""
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
    return BatchResult(states=states, solver=solver), max_time - (time.time() - t0)
