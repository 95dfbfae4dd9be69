"""Large-N owned factorization kernel (ops/pallas_chol.py): correctness of
the blocked Cholesky + block solves, failure semantics, and trajectory parity
of the solver's 'chol' backend across the XLA/Pallas seam (SURVEY.md §4
rebuild mapping (d): same algorithm ⇒ identical trajectories)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import CaNNOLeSSolver, nls_problem
from cannoles_tpu.ops.pallas_chol import (
    block_cho_solve,
    block_forward_solve,
    pallas_cholesky,
)


def _spd(N, rng, dtype=np.float64):
    G = rng.normal(size=(N, N)).astype(dtype)
    return G @ G.T + N * np.eye(N, dtype=dtype)


@pytest.mark.parametrize("N", [128, 300, 512, 1000])
def test_blocked_cholesky_matches_numpy(N):
    rng = np.random.default_rng(0)
    A = _spd(N, rng)
    fac = pallas_cholesky(jnp.asarray(A), tol=1e-12, nb=256)
    assert bool(fac.ok)
    L = np.asarray(fac.L)[:N, :N]
    ref = np.linalg.cholesky(A)
    assert np.allclose(L, ref, atol=1e-8 * N)
    # pivots = squared diagonal of L
    assert np.allclose(np.asarray(fac.d)[:N], np.diag(ref) ** 2, rtol=1e-10)


def test_block_solves():
    rng = np.random.default_rng(1)
    N, k = 700, 5
    A = _spd(N, rng)
    fac = pallas_cholesky(jnp.asarray(A), tol=1e-12, nb=256)
    b = rng.normal(size=N)
    B = rng.normal(size=(N, k))
    x = np.asarray(block_cho_solve(fac, jnp.asarray(b)))
    X = np.asarray(block_cho_solve(fac, jnp.asarray(B)))
    assert np.allclose(x, np.linalg.solve(A, b), atol=1e-9)
    assert np.allclose(X, np.linalg.solve(A, B), atol=1e-9)
    # forward solve: L y = b (padded rows of y are zero by construction)
    y = np.asarray(block_forward_solve(fac, jnp.asarray(b)))
    ref = np.linalg.solve(np.asarray(fac.L), np.pad(b, (0, y.shape[0] - N)))
    assert np.allclose(y, ref, atol=1e-9)


def test_indefinite_fails_cleanly():
    """Branch-free breakdown: indefinite input ⇒ ok=False, finite outputs
    (the rho ladder retries; nothing may poison downstream arithmetic)."""
    rng = np.random.default_rng(2)
    A = _spd(400, rng) - 3 * 400 * np.eye(400)
    fac = pallas_cholesky(jnp.asarray(A), tol=1e-12, nb=256)
    assert not bool(fac.ok)
    assert np.isfinite(np.asarray(fac.L)).all()
    x = np.asarray(block_cho_solve(fac, jnp.ones(400)))
    assert np.isfinite(x).all()


def test_tiny_pivot_fails():
    A = np.eye(300)
    A[7, 7] = 1e-14  # positive but below tol
    fac = pallas_cholesky(jnp.asarray(A), tol=1e-12, nb=256)
    assert not bool(fac.ok)


def test_jit_and_grad_free_usage():
    rng = np.random.default_rng(3)
    A = jnp.asarray(_spd(300, rng))
    b = jnp.asarray(rng.normal(size=300))

    @jax.jit
    def solve(A, b):
        fac = pallas_cholesky(A, tol=1e-12, nb=256)
        return block_cho_solve(fac, b), fac.ok

    x, ok = solve(A, b)
    assert bool(ok)
    assert np.allclose(np.asarray(x), np.linalg.solve(np.asarray(A), np.asarray(b)), atol=1e-9)


def _large_problem(n=96, m=160, ncon=3, dtype=jnp.float64):
    rng = np.random.default_rng(4)
    B1 = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), dtype=dtype)
    xt = jnp.asarray(rng.normal(size=n), dtype=dtype)
    y = B1 @ xt + 0.05 * jnp.tanh(B1 @ xt)
    Ac = jnp.asarray(rng.normal(size=(ncon, n)), dtype=dtype)
    bc = Ac @ xt

    def residual(x, d):
        return d["B1"] @ x + 0.05 * jnp.tanh(d["B1"] @ x) - d["y"]

    def cons(x, d):
        return d["Ac"] @ x - d["bc"]

    return nls_problem(
        residual, jnp.zeros(n, dtype), m, cons, np.zeros(ncon), np.zeros(ncon),
        data={"B1": B1, "y": y, "Ac": Ac, "bc": bc}, name="chol_seam",
    )


def test_chol_backend_trajectory_parity_across_seam():
    """Same solve through XLA cholesky (pallas_chol_min huge) and the Pallas
    blocked kernel (pallas_chol_min=0): identical iteration/factorization
    counts, matching solutions."""
    pb = _large_problem()
    kw = dict(method="gauss_newton", kkt="condensed", linsolve="chol")
    s_xla = CaNNOLeSSolver(pb, pallas_chol_min=10**9, **kw).solve()
    s_pal = CaNNOLeSSolver(pb, pallas_chol_min=0, **kw).solve()
    assert s_xla.status == s_pal.status == "first_order"
    assert s_xla.iter == s_pal.iter
    assert s_xla.solver_specific["nfact"] == s_pal.solver_specific["nfact"]
    assert np.allclose(s_xla.solution, s_pal.solution, atol=1e-9)
