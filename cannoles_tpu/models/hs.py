"""Equality-constrained NLS battery: Hock–Schittkowski problems whose
objectives are sums of squares (the constrained counterpart of the MGH
suite; the reference's benchmark set draws the same problems through
NLSProblems.jl/CUTEst — ``/root/reference/docs/src/benchmark.md:13-17``).

``fstar`` records the certified optimal Σfᵢ² (= HS objective) where known.
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..problem import NLSProblem, nls_problem

__all__ = ["hs_suite", "hs_problem", "HS_NAMES", "HSSpec"]

_SQ2 = float(np.sqrt(2.0))


class HSSpec(NamedTuple):
    name: str
    make: Callable[[], NLSProblem]
    fstar: Optional[float]  # certified min of Σ fᵢ²


def _p(F, x0, m, c, lcon, name) -> NLSProblem:
    lcon = jnp.zeros(lcon) if isinstance(lcon, int) else jnp.asarray(lcon)
    return nls_problem(
        F, jnp.asarray(x0, dtype=float), m, c, lcon, lcon, name=name
    )


def hs6():
    return _p(
        lambda x: jnp.array([1 - x[0]]),
        [-1.2, 1.0], 1,
        lambda x: jnp.array([10 * (x[1] - x[0] ** 2)]), 1, "hs6",
    )


def hs26():
    return _p(
        lambda x: jnp.array([x[0] - x[1], (x[1] - x[2]) ** 2]),
        [-2.6, 2.0, 2.0], 2,
        lambda x: jnp.array([(1 + x[1] ** 2) * x[0] + x[2] ** 4 - 3]), 1, "hs26",
    )


def hs27():
    return _p(
        lambda x: jnp.array([(x[0] - 1) / 10.0, x[1] - x[0] ** 2]),
        [2.0, 2.0, 2.0], 2,
        lambda x: jnp.array([x[0] + x[2] ** 2 + 1]), 1, "hs27",
    )


def hs28():
    return _p(
        lambda x: jnp.array([x[0] + x[1], x[1] + x[2]]),
        [-4.0, 1.0, 1.0], 2,
        lambda x: jnp.array([x[0] + 2 * x[1] + 3 * x[2] - 1]), 1, "hs28",
    )


def hs42():
    return _p(
        lambda x: jnp.array([x[0] - 1, x[1] - 2, x[2] - 3, x[3] - 4]),
        [1.0, 1.0, 1.0, 1.0], 4,
        lambda x: jnp.array([x[0] - 2, x[2] ** 2 + x[3] ** 2 - 2]), 2, "hs42",
    )


def hs46():
    return _p(
        lambda x: jnp.array(
            [x[0] - x[1], x[2] - 1, (x[3] - 1) ** 2, (x[4] - 1) ** 3]
        ),
        [_SQ2 / 2, 1.75, 0.5, 2.0, 2.0], 4,
        lambda x: jnp.array(
            [x[0] ** 2 * x[3] + jnp.sin(x[3] - x[4]) - 1,
             x[1] + x[2] ** 4 * x[3] ** 2 - 2]
        ), 2, "hs46",
    )


def hs48():
    return _p(
        lambda x: jnp.array([x[0] - 1, x[1] - x[2], x[3] - x[4]]),
        [3.0, 5.0, -3.0, 2.0, -2.0], 3,
        lambda x: jnp.array(
            [jnp.sum(x) - 5, x[2] - 2 * (x[3] + x[4]) - 3]
        ), 2, "hs48",
    )


def hs49():
    return _p(
        lambda x: jnp.array(
            [x[0] - x[1], x[2] - 1, (x[3] - 1) ** 2, (x[4] - 1) ** 3]
        ),
        [10.0, 7.0, 2.0, -3.0, 0.8], 4,
        lambda x: jnp.array(
            [x[0] + x[1] + x[2] + 4 * x[3] - 7, x[2] + 5 * x[4] - 6]
        ), 2, "hs49",
    )


def hs50():
    return _p(
        lambda x: jnp.array(
            [x[0] - x[1], x[1] - x[2], (x[2] - x[3]) ** 2, x[3] - x[4]]
        ),
        [35.0, -31.0, 11.0, 5.0, -5.0], 4,
        lambda x: jnp.array(
            [x[0] + 2 * x[1] + 3 * x[2] - 6,
             x[1] + 2 * x[2] + 3 * x[3] - 6,
             x[2] + 2 * x[3] + 3 * x[4] - 6]
        ), 3, "hs50",
    )


def hs51():
    return _p(
        lambda x: jnp.array(
            [x[0] - x[1], x[1] + x[2] - 2, x[3] - 1, x[4] - 1]
        ),
        [2.5, 0.5, 2.0, -1.0, 0.5], 4,
        lambda x: jnp.array(
            [x[0] + 3 * x[1] - 4, x[2] + x[3] - 2 * x[4], x[1] - x[4]]
        ), 3, "hs51",
    )


def hs52():
    return _p(
        lambda x: jnp.array(
            [4 * x[0] - x[1], x[1] + x[2] - 2, x[3] - 1, x[4] - 1]
        ),
        [2.0, 2.0, 2.0, 2.0, 2.0], 4,
        lambda x: jnp.array(
            [x[0] + 3 * x[1], x[2] + x[3] - 2 * x[4], x[1] - x[4]]
        ), 3, "hs52",
    )


def hs53():
    # HS53 objective is already a sum of squares; its ±10 box bounds are
    # inactive at x* = (-33, 11, 27, -5, 11)/43 and are dropped (the
    # reference rejects bounds outright, CaNNOLeS.jl:408-410).
    return _p(
        lambda x: jnp.array(
            [x[0] - x[1], x[1] + x[2] - 2, x[3] - 1, x[4] - 1]
        ),
        [2.0] * 5, 4,
        lambda x: jnp.array(
            [x[0] + 3 * x[1], x[2] + x[3] - 2 * x[4], x[1] - x[4]]
        ), 3, "hs53",
    )


def hs60():
    # (x1-1)^2 + (x1-x2)^2 + (x2-x3)^4 with one nonlinear equality; the ±10
    # bounds are inactive at x* ≈ (1.1049, 1.1967, 1.5353) and dropped.
    return _p(
        lambda x: jnp.array([x[0] - 1, x[0] - x[1], (x[1] - x[2]) ** 2]),
        [2.0, 2.0, 2.0], 3,
        lambda x: jnp.array(
            [x[0] * (1 + x[1] ** 2) + x[2] ** 4 - 4 - 3 * _SQ2]
        ), 1, "hs60",
    )


def hs61():
    # Quadratic 4x1²+2x2²+2x3²−33x1+16x2−24x3 written as the completed
    # square ‖F‖² − 172.0625: F = [2(x1−33/8), √2(x2+4), √2(x3−6)].  Same
    # minimizer; fstar below records the Σf² value (HS f* = −143.6461422).
    return _p(
        lambda x: jnp.array(
            [2 * (x[0] - 33 / 8), _SQ2 * (x[1] + 4), _SQ2 * (x[2] - 6)]
        ),
        [0.0, 0.0, 0.0], 3,
        lambda x: jnp.array(
            [3 * x[0] - 2 * x[1] ** 2 - 7, 4 * x[0] - x[2] ** 2 - 11]
        ), 2, "hs61",
    )


def hs77():
    return _p(
        lambda x: jnp.array(
            [x[0] - 1, x[0] - x[1], x[2] - 1, (x[3] - 1) ** 2, (x[4] - 1) ** 3]
        ),
        [2.0] * 5, 5,
        lambda x: jnp.array(
            [x[0] ** 2 * x[3] + jnp.sin(x[3] - x[4]) - 2 * _SQ2,
             x[1] + x[2] ** 4 * x[3] ** 2 - 8 - _SQ2]
        ), 2, "hs77",
    )


def hs79():
    return _p(
        lambda x: jnp.array(
            [x[0] - 1, x[0] - x[1], x[1] - x[2], (x[2] - x[3]) ** 2, (x[3] - x[4]) ** 2]
        ),
        [2.0] * 5, 5,
        lambda x: jnp.array(
            [x[0] + x[1] ** 2 + x[2] ** 3 - 2 - 3 * _SQ2,
             x[1] - x[2] ** 2 + x[3] + 2 - 2 * _SQ2,
             x[0] * x[4] - 2]
        ), 3, "hs79",
    )


_SUITE: List[HSSpec] = [
    HSSpec("hs6", hs6, 0.0),
    HSSpec("hs26", hs26, 0.0),
    HSSpec("hs27", hs27, 0.04),
    HSSpec("hs28", hs28, 0.0),
    HSSpec("hs42", hs42, 13.8578643763),  # 28 - 10*sqrt(2)
    HSSpec("hs46", hs46, 0.0),
    HSSpec("hs48", hs48, 0.0),
    HSSpec("hs49", hs49, 0.0),
    HSSpec("hs50", hs50, 0.0),
    HSSpec("hs51", hs51, 0.0),
    HSSpec("hs52", hs52, 5.32664756),  # 1859/349
    HSSpec("hs53", hs53, 4.09302326),  # 176/43
    HSSpec("hs60", hs60, 0.0325682003),
    HSSpec("hs61", hs61, 28.4163578),  # −143.6461422 + 172.0625
    HSSpec("hs77", hs77, 0.24150513),
    HSSpec("hs79", hs79, 0.0787768209),
]

HS_NAMES = [s.name for s in _SUITE]
_BY_NAME: Dict[str, HSSpec] = {s.name: s for s in _SUITE}


def hs_problem(name: str) -> NLSProblem:
    return _BY_NAME[name].make()


def hs_suite() -> List[HSSpec]:
    return list(_SUITE)
