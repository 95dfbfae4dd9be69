"""Lukšan–Vlček-style scalable constrained battery, certified by the
solver-independent KKT oracle (utils/kkt.py) — the reference protocol's
"solved ⇔ first_order" criterion (/root/reference/docs/src/benchmark.md:81-84)
checked from scratch with jax.grad rather than trusted from the solver."""

import pytest

from cannoles_tpu import CaNNOLeSSolver, cannoles
from cannoles_tpu.models.lvcon import LVCON_NAMES, lvcon_problem, lvcon_suite
from cannoles_tpu.utils.kkt import is_kkt_point, kkt_residuals

SUITE = lvcon_suite()


@pytest.mark.parametrize("pb", SUITE, ids=[p.name for p in SUITE])
def test_lvcon_solves_with_independent_certificate(pb):
    stats = cannoles(
        pb, method="newton", linsolve="ldlt", kkt="condensed",
        max_iter=200, rtol=1e-7, max_time=120.0,
    )
    assert stats.status == "first_order", (pb.name, stats.status)
    r = kkt_residuals(pb, stats.solution, stats.multipliers)
    assert float(r.scaled_stationarity) < 1e-5, (pb.name, float(r.scaled_stationarity))
    assert float(r.feasibility) < 1e-5, (pb.name, float(r.feasibility))
    assert is_kkt_point(pb, stats.solution, stats.multipliers, tol=1e-5)


def test_lvcon_scales_with_n():
    # the same compiled structure at a larger n (exercises the gather/slice
    # vectorized constraint assembly, not a Python loop over nodes)
    pb = lvcon_problem("lvcon_rosenbrock_tridiag", n=50)
    assert pb.nvar == 50 and pb.ncon == 48
    stats = cannoles(
        pb, method="newton", linsolve="ldlt", kkt="condensed",
        max_iter=300, rtol=1e-7, max_time=120.0,
    )
    assert stats.status == "first_order", stats.status
    assert is_kkt_point(pb, stats.solution, stats.multipliers, tol=1e-5)


def test_lvcon_full_vs_condensed_agree():
    pb = lvcon_problem("lvcon_rosenbrock_trigexp")
    a = CaNNOLeSSolver(pb, kkt="full").solve(max_time=120.0, rtol=1e-7)
    b = CaNNOLeSSolver(pb, kkt="condensed").solve(max_time=120.0, rtol=1e-7)
    assert a.status == b.status == "first_order"
    assert abs(a.objective - b.objective) < 1e-6 * max(1.0, abs(a.objective))


def test_kkt_oracle_rejects_non_solution():
    pb = lvcon_problem("lvcon_rosenbrock_trigexp")
    assert not is_kkt_point(pb, pb.x0, None, tol=1e-5)
    r = kkt_residuals(pb, pb.x0)
    assert float(r.feasibility) > 1.0  # x0 is genuinely infeasible


def test_names_registry():
    assert len(LVCON_NAMES) == 5
    with pytest.raises(KeyError):
        lvcon_problem("nope")
