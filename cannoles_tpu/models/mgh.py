"""Moré–Garbow–Hillstrom (1981) 35-problem nonlinear least-squares battery.

This is the benchmark problem set named by the build targets (BASELINE
configs 3/5; the reference's benchmark recipe uses the same family through
NLSProblems.jl, ``/root/reference/docs/src/benchmark.md:13-17``).  Each
problem is a pure-JAX residual with the standard starting point; where the
literature certifies a minimum of Σfᵢ² it is recorded in ``fmin`` (None =
unknown/zero-residual ambiguous) for benchmark verification.

All residuals are written vectorized (no Python loops over traced values) so
they jit, vmap and grad cleanly; data tables are module-level constants.
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..problem import NLSProblem, nls_problem

__all__ = ["mgh_problem", "mgh_suite", "MGH_NAMES", "MGHSpec"]


class MGHSpec(NamedTuple):
    name: str
    make: Callable[[], NLSProblem]
    fmin: Optional[float]  # certified min of Σ fᵢ² (= 2·objective), if known


def _p(F, x0, m, name) -> NLSProblem:
    return nls_problem(F, jnp.asarray(x0, dtype=float), m, name=name)


# ----------------------------------------------------------------------
# data tables
# ----------------------------------------------------------------------
_BARD_Y = np.array(
    [0.14, 0.18, 0.22, 0.25, 0.29, 0.32, 0.35, 0.39, 0.37, 0.58, 0.73, 0.96, 1.34, 2.10, 4.39]
)
_GAUSS_Y = np.array(
    [0.0009, 0.0044, 0.0175, 0.0540, 0.1295, 0.2420, 0.3521, 0.3989,
     0.3521, 0.2420, 0.1295, 0.0540, 0.0175, 0.0044, 0.0009]
)
_MEYER_Y = np.array(
    [34780., 28610., 23650., 19630., 16370., 13720., 11540., 9744.,
     8261., 7030., 6005., 5147., 4427., 3820., 3307., 2872.]
)
_KOW_Y = np.array(
    [0.1957, 0.1947, 0.1735, 0.1600, 0.0844, 0.0627, 0.0456, 0.0342, 0.0323, 0.0235, 0.0246]
)
_KOW_U = np.array([4.0, 2.0, 1.0, 0.5, 0.25, 0.167, 0.125, 0.1, 0.0833, 0.0714, 0.0625])
_OSB1_Y = np.array(
    [0.844, 0.908, 0.932, 0.936, 0.925, 0.908, 0.881, 0.850, 0.818, 0.784, 0.751,
     0.718, 0.685, 0.658, 0.628, 0.603, 0.580, 0.558, 0.538, 0.522, 0.506, 0.490,
     0.478, 0.467, 0.457, 0.448, 0.438, 0.431, 0.424, 0.420, 0.414, 0.411, 0.406]
)
_OSB2_Y = np.array(
    [1.366, 1.191, 1.112, 1.013, 0.991, 0.885, 0.831, 0.847, 0.786, 0.725, 0.746,
     0.679, 0.608, 0.655, 0.616, 0.606, 0.602, 0.626, 0.651, 0.724, 0.649, 0.649,
     0.694, 0.644, 0.624, 0.661, 0.612, 0.558, 0.533, 0.495, 0.500, 0.423, 0.395,
     0.375, 0.372, 0.391, 0.396, 0.405, 0.428, 0.429, 0.523, 0.562, 0.607, 0.653,
     0.672, 0.708, 0.633, 0.668, 0.645, 0.632, 0.591, 0.559, 0.597, 0.625, 0.739,
     0.710, 0.729, 0.720, 0.636, 0.581, 0.428, 0.292, 0.162, 0.098, 0.054]
)


# ----------------------------------------------------------------------
# problem constructors (numbering follows MGH 1981)
# ----------------------------------------------------------------------
def rosenbrock():  # 1
    return _p(lambda x: jnp.array([10 * (x[1] - x[0] ** 2), 1 - x[0]]),
              [-1.2, 1.0], 2, "mgh01_rosenbrock")


def freudenstein_roth():  # 2
    def F(x):
        return jnp.array(
            [-13 + x[0] + ((5 - x[1]) * x[1] - 2) * x[1],
             -29 + x[0] + ((x[1] + 1) * x[1] - 14) * x[1]]
        )
    return _p(F, [0.5, -2.0], 2, "mgh02_freudenstein_roth")


def powell_badly_scaled():  # 3
    def F(x):
        return jnp.array([1e4 * x[0] * x[1] - 1, jnp.exp(-x[0]) + jnp.exp(-x[1]) - 1.0001])
    return _p(F, [0.0, 1.0], 2, "mgh03_powell_badly_scaled")


def brown_badly_scaled():  # 4
    def F(x):
        return jnp.array([x[0] - 1e6, x[1] - 2e-6, x[0] * x[1] - 2])
    return _p(F, [1.0, 1.0], 3, "mgh04_brown_badly_scaled")


def beale():  # 5
    y = jnp.array([1.5, 2.25, 2.625])
    i = jnp.arange(1, 4, dtype=float)
    def F(x):
        return y - x[0] * (1 - x[1] ** i)
    return _p(F, [1.0, 1.0], 3, "mgh05_beale")


def jennrich_sampson(m=10):  # 6
    i = jnp.arange(1, m + 1, dtype=float)
    def F(x):
        return 2 + 2 * i - (jnp.exp(i * x[0]) + jnp.exp(i * x[1]))
    return _p(F, [0.3, 0.4], m, "mgh06_jennrich_sampson")


def helical_valley():  # 7
    def F(x):
        theta = jnp.arctan2(x[1], x[0]) / (2 * jnp.pi)
        # arctan2 matches the MGH branch convention (adds 0.5 for x1 < 0)
        return jnp.array(
            [10 * (x[2] - 10 * theta),
             10 * (jnp.sqrt(x[0] ** 2 + x[1] ** 2) - 1),
             x[2]]
        )
    return _p(F, [-1.0, 0.0, 0.0], 3, "mgh07_helical_valley")


def bard():  # 8
    y = jnp.asarray(_BARD_Y)
    u = jnp.arange(1.0, 16.0)
    v = 16.0 - u
    w = jnp.minimum(u, v)
    def F(x):
        return y - (x[0] + u / (v * x[1] + w * x[2]))
    return _p(F, [1.0, 1.0, 1.0], 15, "mgh08_bard")


def gaussian():  # 9
    y = jnp.asarray(_GAUSS_Y)
    t = (8.0 - jnp.arange(1.0, 16.0)) / 2.0
    def F(x):
        return x[0] * jnp.exp(-x[1] * (t - x[2]) ** 2 / 2) - y
    return _p(F, [0.4, 1.0, 0.0], 15, "mgh09_gaussian")


def meyer():  # 10
    y = jnp.asarray(_MEYER_Y)
    t = 45.0 + 5.0 * jnp.arange(1.0, 17.0)
    def F(x):
        return x[0] * jnp.exp(x[1] / (t + x[2])) - y
    return _p(F, [0.02, 4000.0, 250.0], 16, "mgh10_meyer")


def gulf(m=99):  # 11
    t = jnp.arange(1.0, m + 1) / 100.0
    mi = 25.0 + (-50.0 * jnp.log(t)) ** (2.0 / 3.0)
    def F(x):
        return jnp.exp(-(jnp.abs(mi - x[1]) ** x[2]) / x[0]) - t
    return _p(F, [5.0, 2.5, 0.15], m, "mgh11_gulf")


def box3d(m=10):  # 12
    t = 0.1 * jnp.arange(1.0, m + 1)
    def F(x):
        return (jnp.exp(-t * x[0]) - jnp.exp(-t * x[1])
                - x[2] * (jnp.exp(-t) - jnp.exp(-10 * t)))
    return _p(F, [0.0, 10.0, 20.0], m, "mgh12_box3d")


def powell_singular():  # 13
    def F(x):
        return jnp.array(
            [x[0] + 10 * x[1],
             jnp.sqrt(5.0) * (x[2] - x[3]),
             (x[1] - 2 * x[2]) ** 2,
             jnp.sqrt(10.0) * (x[0] - x[3]) ** 2]
        )
    return _p(F, [3.0, -1.0, 0.0, 1.0], 4, "mgh13_powell_singular")


def wood():  # 14
    def F(x):
        return jnp.array(
            [10 * (x[1] - x[0] ** 2),
             1 - x[0],
             jnp.sqrt(90.0) * (x[3] - x[2] ** 2),
             1 - x[2],
             jnp.sqrt(10.0) * (x[1] + x[3] - 2),
             (x[1] - x[3]) / jnp.sqrt(10.0)]
        )
    return _p(F, [-3.0, -1.0, -3.0, -1.0], 6, "mgh14_wood")


def kowalik_osborne():  # 15
    y, u = jnp.asarray(_KOW_Y), jnp.asarray(_KOW_U)
    def F(x):
        return y - x[0] * (u**2 + u * x[1]) / (u**2 + u * x[2] + x[3])
    return _p(F, [0.25, 0.39, 0.415, 0.39], 11, "mgh15_kowalik_osborne")


def brown_dennis(m=20):  # 16
    t = jnp.arange(1.0, m + 1) / 5.0
    def F(x):
        return ((x[0] + t * x[1] - jnp.exp(t)) ** 2
                + (x[2] + x[3] * jnp.sin(t) - jnp.cos(t)) ** 2)
    return _p(F, [25.0, 5.0, -5.0, -1.0], m, "mgh16_brown_dennis")


def osborne1():  # 17
    y = jnp.asarray(_OSB1_Y)
    t = 10.0 * jnp.arange(0.0, 33.0)
    def F(x):
        return y - (x[0] + x[1] * jnp.exp(-t * x[3]) + x[2] * jnp.exp(-t * x[4]))
    return _p(F, [0.5, 1.5, -1.0, 0.01, 0.02], 33, "mgh17_osborne1")


def biggs_exp6(m=13):  # 18
    t = 0.1 * jnp.arange(1.0, m + 1)
    y = jnp.exp(-t) - 5 * jnp.exp(-10 * t) + 3 * jnp.exp(-4 * t)
    def F(x):
        return (x[2] * jnp.exp(-t * x[0]) - x[3] * jnp.exp(-t * x[1])
                + x[5] * jnp.exp(-t * x[4]) - y)
    return _p(F, [1.0, 2.0, 1.0, 1.0, 1.0, 1.0], m, "mgh18_biggs_exp6")


def osborne2():  # 19
    y = jnp.asarray(_OSB2_Y)
    t = jnp.arange(0.0, 65.0) / 10.0
    def F(x):
        return y - (x[0] * jnp.exp(-t * x[4])
                    + x[1] * jnp.exp(-((t - x[8]) ** 2) * x[5])
                    + x[2] * jnp.exp(-((t - x[9]) ** 2) * x[6])
                    + x[3] * jnp.exp(-((t - x[10]) ** 2) * x[7]))
    return _p(F, [1.3, 0.65, 0.65, 0.7, 0.6, 3.0, 5.0, 7.0, 2.0, 4.5, 5.5], 65,
              "mgh19_osborne2")


def watson(n=6):  # 20
    t = jnp.arange(1.0, 30.0) / 29.0  # (29,)
    j = jnp.arange(1.0, n + 1)  # (n,)
    Tp = t[:, None] ** (j[None, :] - 1)  # t^(j-1), (29, n)
    Td = (j[None, 1:] - 1) * t[:, None] ** (j[None, 1:] - 2)  # (j-1) t^(j-2), (29, n-1)
    def F(x):
        s2 = Tp @ x  # Σ x_j t^(j-1)
        s1 = Td @ x[1:]  # Σ (j-1) x_j t^(j-2)
        f = s1 - s2**2 - 1
        return jnp.concatenate([f, jnp.array([x[0], x[1] - x[0] ** 2 - 1])])
    return _p(F, jnp.zeros(n), 31, f"mgh20_watson_{n}")


def extended_rosenbrock(n=10):  # 21
    assert n % 2 == 0
    def F(x):
        xe, xo = x[0::2], x[1::2]
        return jnp.stack([10 * (xo - xe**2), 1 - xe], axis=1).reshape(-1)
    x0 = jnp.tile(jnp.array([-1.2, 1.0]), n // 2)
    return _p(F, x0, n, f"mgh21_ext_rosenbrock_{n}")


def extended_powell(n=12):  # 22
    assert n % 4 == 0
    def F(x):
        x1, x2, x3, x4 = x[0::4], x[1::4], x[2::4], x[3::4]
        return jnp.stack(
            [x1 + 10 * x2,
             jnp.sqrt(5.0) * (x3 - x4),
             (x2 - 2 * x3) ** 2,
             jnp.sqrt(10.0) * (x1 - x4) ** 2],
            axis=1,
        ).reshape(-1)
    x0 = jnp.tile(jnp.array([3.0, -1.0, 0.0, 1.0]), n // 4)
    return _p(F, x0, n, f"mgh22_ext_powell_{n}")


def penalty1(n=10):  # 23
    a = jnp.sqrt(1e-5)
    def F(x):
        return jnp.concatenate([a * (x - 1), jnp.array([jnp.sum(x**2) - 0.25])])
    return _p(F, jnp.arange(1.0, n + 1), n + 1, f"mgh23_penalty1_{n}")


def penalty2(n=10):  # 24
    a = jnp.sqrt(1e-5)
    i = jnp.arange(2.0, n + 1)
    y = jnp.exp(i / 10.0) + jnp.exp((i - 1) / 10.0)
    j = jnp.arange(1.0, n + 1)
    w = n - j + 1
    def F(x):
        f1 = jnp.array([x[0] - 0.2])
        f2 = a * (jnp.exp(x[1:] / 10.0) + jnp.exp(x[:-1] / 10.0) - y)
        f3 = a * (jnp.exp(x[1:] / 10.0) - jnp.exp(-1.0 / 10.0))
        f4 = jnp.array([jnp.sum(w * x**2) - 1])
        return jnp.concatenate([f1, f2, f3, f4])
    return _p(F, jnp.full(n, 0.5), 2 * n, f"mgh24_penalty2_{n}")


def variably_dimensioned(n=10):  # 25
    j = jnp.arange(1.0, n + 1)
    def F(x):
        s = jnp.sum(j * (x - 1))
        return jnp.concatenate([x - 1, jnp.array([s, s**2])])
    return _p(F, 1.0 - j / n, n + 2, f"mgh25_vardim_{n}")


def trigonometric(n=10):  # 26
    i = jnp.arange(1.0, n + 1)
    def F(x):
        return n - jnp.sum(jnp.cos(x)) + i * (1 - jnp.cos(x)) - jnp.sin(x)
    return _p(F, jnp.full(n, 1.0 / n), n, f"mgh26_trigonometric_{n}")


def brown_almost_linear(n=10):  # 27
    def F(x):
        head = x + jnp.sum(x) - (n + 1)
        return jnp.concatenate([head[:-1], jnp.array([jnp.prod(x) - 1])])
    return _p(F, jnp.full(n, 0.5), n, f"mgh27_brown_almost_linear_{n}")


def discrete_boundary_value(n=10):  # 28
    h = 1.0 / (n + 1)
    t = h * jnp.arange(1.0, n + 1)
    def F(x):
        xm = jnp.concatenate([jnp.zeros(1), x[:-1]])
        xp = jnp.concatenate([x[1:], jnp.zeros(1)])
        return 2 * x - xm - xp + h**2 * (x + t + 1) ** 3 / 2
    return _p(F, t * (t - 1), n, f"mgh28_disc_boundary_{n}")


def discrete_integral(n=10):  # 29
    h = 1.0 / (n + 1)
    t = h * jnp.arange(1.0, n + 1)
    lower = t[:, None] >= t[None, :]  # j <= i
    def F(x):
        g = (x + t + 1) ** 3
        a = jnp.where(lower, t[None, :] * g[None, :], 0.0).sum(axis=1)
        b = jnp.where(~lower, (1 - t[None, :]) * g[None, :], 0.0).sum(axis=1)
        return x + h * ((1 - t) * a + t * b) / 2
    return _p(F, t * (t - 1), n, f"mgh29_disc_integral_{n}")


def broyden_tridiagonal(n=10):  # 30
    def F(x):
        xm = jnp.concatenate([jnp.zeros(1), x[:-1]])
        xp = jnp.concatenate([x[1:], jnp.zeros(1)])
        return (3 - 2 * x) * x - xm - 2 * xp + 1
    return _p(F, jnp.full(n, -1.0), n, f"mgh30_broyden_tridiag_{n}")


def broyden_banded(n=10):  # 31
    i = jnp.arange(n)
    mask = (i[None, :] >= i[:, None] - 5) & (i[None, :] <= i[:, None] + 1) & (
        i[None, :] != i[:, None]
    )
    def F(x):
        s = jnp.where(mask, (x * (1 + x))[None, :], 0.0).sum(axis=1)
        return x * (2 + 5 * x**2) + 1 - s
    return _p(F, jnp.full(n, -1.0), n, f"mgh31_broyden_banded_{n}")


def linear_full_rank(n=10, m=20):  # 32
    def F(x):
        s = jnp.sum(x)
        head = x - 2 * s / m - 1
        tail = jnp.full(m - n, -2 * s / m - 1)
        return jnp.concatenate([head, tail])
    return _p(F, jnp.ones(n), m, f"mgh32_linear_full_rank_{n}_{m}")


def linear_rank1(n=10, m=20):  # 33
    i = jnp.arange(1.0, m + 1)
    j = jnp.arange(1.0, n + 1)
    def F(x):
        return i * jnp.sum(j * x) - 1
    return _p(F, jnp.ones(n), m, f"mgh33_linear_rank1_{n}_{m}")


def linear_rank1_zero(n=10, m=20):  # 34
    i = jnp.arange(1.0, m + 1)
    j = jnp.arange(1.0, n + 1)
    jm = jnp.where((j >= 2) & (j <= n - 1), j, 0.0)
    def F(x):
        s = jnp.sum(jm * x)
        mid = (i - 1) * s - 1
        return jnp.where((i >= 2) & (i <= m - 1), mid, -1.0)
    return _p(F, jnp.ones(n), m, f"mgh34_linear_rank1_zero_{n}_{m}")


def chebyquad(n=7):  # 35 (m = n)
    j = jnp.arange(1.0, n + 1)
    ieven = jnp.arange(1, n + 1) % 2 == 0
    integrals = jnp.where(ieven, -1.0 / (jnp.arange(1, n + 1) ** 2 - 1.0), 0.0)
    def F(x):
        # shifted Chebyshev on [0,1] via the three-term recurrence — smooth
        # polynomials on all of R (the arccos form has infinite derivatives
        # at the interval ends, which breaks AD once constraints push x
        # outside [0,1])
        z = 2 * x - 1
        Ts = [z, 2 * z * z - 1]
        for _ in range(2, n):
            Ts.append(2 * z * Ts[-1] - Ts[-2])
        T = jnp.stack(Ts[:n])  # (n_poly, n_points)
        return T.mean(axis=1) - integrals
    return _p(F, j / (n + 1), n, f"mgh35_chebyquad_{n}")


# ----------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------
_SUITE: List[MGHSpec] = [
    MGHSpec("rosenbrock", rosenbrock, 0.0),
    MGHSpec("freudenstein_roth", freudenstein_roth, 0.0),  # also local min 48.9842
    MGHSpec("powell_badly_scaled", powell_badly_scaled, 0.0),
    MGHSpec("brown_badly_scaled", brown_badly_scaled, 0.0),
    MGHSpec("beale", beale, 0.0),
    MGHSpec("jennrich_sampson", jennrich_sampson, 124.362),
    MGHSpec("helical_valley", helical_valley, 0.0),
    MGHSpec("bard", bard, 8.21487e-3),
    MGHSpec("gaussian", gaussian, 1.12793e-8),
    MGHSpec("meyer", meyer, 87.9458),
    MGHSpec("gulf", gulf, 0.0),
    MGHSpec("box3d", box3d, 0.0),
    MGHSpec("powell_singular", powell_singular, 0.0),
    MGHSpec("wood", wood, 0.0),
    MGHSpec("kowalik_osborne", kowalik_osborne, 3.07505e-4),
    MGHSpec("brown_dennis", brown_dennis, 85822.2),
    MGHSpec("osborne1", osborne1, 5.46489e-5),
    MGHSpec("biggs_exp6", biggs_exp6, None),  # 0 at (1,10,1,5,4,3); local 5.65565e-3
    MGHSpec("osborne2", osborne2, 4.01377e-2),
    MGHSpec("watson", watson, 2.28767e-3),
    MGHSpec("ext_rosenbrock", extended_rosenbrock, 0.0),
    MGHSpec("ext_powell", extended_powell, 0.0),
    MGHSpec("penalty1", penalty1, 7.08765e-5),
    MGHSpec("penalty2", penalty2, 2.93660e-4),
    MGHSpec("variably_dimensioned", variably_dimensioned, 0.0),
    MGHSpec("trigonometric", trigonometric, 0.0),
    MGHSpec("brown_almost_linear", brown_almost_linear, 0.0),  # also local min 1
    MGHSpec("discrete_boundary_value", discrete_boundary_value, 0.0),
    MGHSpec("discrete_integral", discrete_integral, 0.0),
    MGHSpec("broyden_tridiagonal", broyden_tridiagonal, 0.0),
    MGHSpec("broyden_banded", broyden_banded, 0.0),
    MGHSpec("linear_full_rank", linear_full_rank, 10.0),  # m - n
    MGHSpec("linear_rank1", linear_rank1, None),  # m(m-1)/(2(2m+1)) = 4.63415
    MGHSpec("linear_rank1_zero", linear_rank1_zero, None),  # (m²+3m-6)/(2(2m-3)) ≈ 6.13514
    MGHSpec("chebyquad", chebyquad, 0.0),
]

MGH_NAMES = [spec.name for spec in _SUITE]
_BY_NAME: Dict[str, MGHSpec] = {s.name: s for s in _SUITE}

# dimensional variants from the MGH paper's tables (battery breadth)
_EXTENDED: List[MGHSpec] = [
    MGHSpec("watson_9", lambda: watson(9), 1.39976e-6),
    MGHSpec("watson_12", lambda: watson(12), 4.72238e-10),
    MGHSpec("penalty1_4", lambda: penalty1(4), 2.24997e-5),
    MGHSpec("penalty2_4", lambda: penalty2(4), 9.37629e-6),
    MGHSpec("chebyquad_8", lambda: chebyquad(8), 3.51687e-3),
    MGHSpec("chebyquad_9", lambda: chebyquad(9), 0.0),
    MGHSpec("ext_rosenbrock_50", lambda: extended_rosenbrock(50), 0.0),
    MGHSpec("ext_powell_20", lambda: extended_powell(20), 0.0),
    MGHSpec("trigonometric_20", lambda: trigonometric(20), 0.0),
    MGHSpec("broyden_tridiagonal_50", lambda: broyden_tridiagonal(50), 0.0),
    MGHSpec("broyden_banded_50", lambda: broyden_banded(50), 0.0),
    MGHSpec("brown_almost_linear_25", lambda: brown_almost_linear(25), 0.0),
    MGHSpec("disc_boundary_50", lambda: discrete_boundary_value(50), 0.0),
    MGHSpec("disc_integral_50", lambda: discrete_integral(50), 0.0),
    MGHSpec("vardim_20", lambda: variably_dimensioned(20), 0.0),
    MGHSpec("linear_full_rank_40_60", lambda: linear_full_rank(40, 60), 20.0),
    MGHSpec("jennrich_sampson_2_10", lambda: jennrich_sampson(10), 124.362),
    MGHSpec("box3d_20", lambda: box3d(20), 0.0),
    MGHSpec("gulf_10", lambda: gulf(10), 0.0),
    MGHSpec("biggs_exp6_24", lambda: biggs_exp6(24), 0.0),
]
for _s in _EXTENDED:
    _BY_NAME[_s.name] = _s


def mgh_problem(name: str) -> NLSProblem:
    return _BY_NAME[name].make()


def mgh_suite(extended: bool = False) -> List[MGHSpec]:
    """The 35 standard specs in MGH order; ``extended=True`` appends 20
    dimensional variants from the paper's tables."""
    return list(_SUITE) + (list(_EXTENDED) if extended else [])
