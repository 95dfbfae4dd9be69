"""Solver status codes and execution stats.

Jittable restatement of SolverCore.jl's ``GenericExecutionStats`` /
``get_status`` as used by the reference (``/root/reference/src/CaNNOLeS.jl:
576-586, 834-862``): the status is an int32 carried in the solver-state
pytree (so it survives jit/vmap/while_loop), decoded to a symbol-like string
on the host.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict

import jax.numpy as jnp

__all__ = ["Status", "ExecutionStats", "status_name", "get_status_code", "MSG"]


class Status(enum.IntEnum):
    UNKNOWN = 0
    FIRST_ORDER = 1
    SMALL_RESIDUAL = 2
    STALLED = 3
    MAX_ITER = 4
    MAX_EVAL = 5
    MAX_TIME = 6
    EXCEPTION = 7
    USER = 8


_NAMES = {
    Status.UNKNOWN: "unknown",
    Status.FIRST_ORDER: "first_order",
    Status.SMALL_RESIDUAL: "small_residual",
    Status.STALLED: "stalled",
    Status.MAX_ITER: "max_iter",
    Status.MAX_EVAL: "max_eval",
    Status.MAX_TIME: "max_time",
    Status.EXCEPTION: "exception",
    Status.USER: "user",
}


def status_name(code: int) -> str:
    return _NAMES[Status(int(code))]


# internal_msg codes (reference CaNNOLeS.jl:639-649 + line-search errors)
MSG = {
    0: "",
    1: "ρ → ∞",
    2: "Failure in Newton step computation",
    3: "d → ∞ or NaN",
    4: "f → ∞",
    5: "Dϕ ≥ 0 (not a descent direction)",
    6: "α too small",
}


def get_status_code(
    *,
    optimal,
    small_residual,
    broken,
    evals,
    max_eval,
    iter_=None,
    max_iter=None,
    stalled=None,
):
    """Branch-free status resolution; later writes = higher priority.

    Mirrors the reference's use of SolverCore.get_status (CaNNOLeS.jl:576,
    :836): optimal > small_residual > stalled > max_iter > max_eval >
    exception.  max_time and user are decided host-side by the driver.
    """
    status = jnp.zeros((), dtype=jnp.int32)
    status = jnp.where(broken, Status.EXCEPTION, status)
    status = jnp.where(evals > max_eval, Status.MAX_EVAL, status)
    if iter_ is not None and max_iter is not None:
        status = jnp.where(
            (max_iter >= 0) & (iter_ > max_iter), Status.MAX_ITER, status
        )
    if stalled is not None:
        status = jnp.where(stalled, Status.STALLED, status)
    status = jnp.where(small_residual, Status.SMALL_RESIDUAL, status)
    status = jnp.where(optimal, Status.FIRST_ORDER, status)
    return status.astype(jnp.int32)


@dataclasses.dataclass
class ExecutionStats:
    """Host-side result object (GenericExecutionStats analog).

    Mutable so the user callback can flip ``status`` to ``'user'`` to stop
    the run (reference callback contract, CaNNOLeS.jl:139-156).
    """

    status: str = "unknown"
    solution: Any = None
    objective: float = float("nan")
    dual_feas: float = float("nan")
    primal_feas: float = float("nan")
    multipliers: Any = None
    iter: int = 0
    elapsed_time: float = 0.0
    solver_specific: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def status_reliable(self) -> bool:
        return True

    @property
    def solution_reliable(self) -> bool:
        return self.solution is not None

    @property
    def objective_reliable(self) -> bool:
        return self.objective == self.objective

    def __repr__(self):
        return (
            f"ExecutionStats(status={self.status!r}, objective={self.objective:.6g}, "
            f"dual_feas={self.dual_feas:.3g}, primal_feas={self.primal_feas:.3g}, "
            f"iter={self.iter}, time={self.elapsed_time:.3g}s)"
        )
