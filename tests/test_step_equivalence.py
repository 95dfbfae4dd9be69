"""Property test: the full-KKT and condensed Newton systems produce the SAME
step (the Schur elimination is exact), verified state-to-state with the
exact-inertia eigh backend so both succeed at rho = 0."""

import jax.numpy as jnp
import numpy as np

from cannoles_tpu import CaNNOLeSSolver, nls_problem


def _well_conditioned_problem(seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(6, 3)))
    b = jnp.asarray(rng.normal(size=6))

    def F(x):
        return A @ x - b + 0.05 * jnp.sin(x).sum() * jnp.ones(6)

    def c(x):
        return jnp.array([x[0] + x[1] + x[2] - 1.0])

    return nls_problem(F, jnp.asarray(rng.normal(size=3)), 6, c, [0.0], [0.0])


def test_full_and_condensed_steps_match():
    pb = _well_conditioned_problem()
    full = CaNNOLeSSolver(pb, linsolve="eigh", kkt="full")
    cond = CaNNOLeSSolver(pb, linsolve="eigh", kkt="condensed")
    cfg_f = full.make_config()
    cfg_c = cond.make_config()

    sf = full._init_fn(pb.x0, pb.y0, cfg_f, None)
    sc = cond._init_fn(pb.x0, pb.y0, cfg_c, None)
    for name in ("x", "lam", "dual", "primal"):
        assert np.allclose(getattr(sf, name), getattr(sc, name), atol=1e-12)

    # drive several outer iterations; iterates must stay identical while both
    # backends succeed at the same rho values
    for _ in range(4):
        sf = full._outer_fn(sf, cfg_f)
        sc = cond._outer_fn(sc, cfg_c)
        assert np.allclose(sf.x, sc.x, atol=1e-9), (sf.x, sc.x)
        assert np.allclose(sf.lam, sc.lam, atol=1e-9)
        assert np.allclose(np.asarray(sf.d[:3]), np.asarray(sc.d[:3]), atol=1e-9)


def test_chol_matches_eigh_condensed():
    pb = _well_conditioned_problem(seed=1)
    a = CaNNOLeSSolver(pb, linsolve="eigh", kkt="condensed").solve()
    b = CaNNOLeSSolver(pb, linsolve="chol", kkt="condensed").solve()
    assert a.status == b.status == "first_order"
    assert np.allclose(a.solution, b.solution, atol=1e-9)
    assert a.iter == b.iter
