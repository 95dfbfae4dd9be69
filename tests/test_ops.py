"""Unit tests for the numerical kernels: blocked LDLᵀ with inertia (the
MA57/LDLFactorizations replacement) and fixed-budget CGLS (Krylov.jl CGLS
replacement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu.ops.cgls import cgls
from cannoles_tpu.ops.ldlt import (
    eigh_factor,
    eigh_solve,
    inertia_success,
    ldlt_factor,
    ldlt_solve,
)


def _kkt_like(rng, n, m, p, delta=0.5, spd=True):
    H = rng.normal(size=(n, n))
    H = H @ H.T + (np.eye(n) if spd else -2 * np.eye(n))
    J = rng.normal(size=(m, n))
    Jc = rng.normal(size=(p, n))
    N = n + m + p
    W = np.zeros((N, N))
    W[:n, :n] = H
    W[n : n + m, :n] = J
    W[:n, n : n + m] = J.T
    W[n : n + m, n : n + m] = -np.eye(m)
    W[n + m :, :n] = Jc
    W[:n, n + m :] = Jc.T
    W[n + m :, n + m :] = -delta * np.eye(p)
    return jnp.asarray(W)


@pytest.mark.parametrize("nb", [1, 3, 8, 32])
@pytest.mark.parametrize("dims", [(4, 3, 2), (10, 7, 3), (17, 20, 5), (1, 1, 0)])
def test_ldlt_reconstruction_and_solve(dims, nb):
    n, m, p = dims
    rng = np.random.default_rng(0)
    W = _kkt_like(rng, n, m, p)
    fac = ldlt_factor(W, 1e-13, nb=nb)
    rec = fac.mat @ jnp.diag(fac.vec) @ fac.mat.T
    assert np.allclose(rec, W, atol=1e-10)
    assert bool(inertia_success(fac.vec, fac.mat, n, 1e-13))
    rhs = jnp.asarray(rng.normal(size=n + m + p))
    x = ldlt_solve(fac, rhs, 1e-13)
    assert np.allclose(W @ x, rhs, atol=1e-9)


def test_ldlt_inertia_matches_eigenvalues():
    rng = np.random.default_rng(1)
    for trial in range(5):
        n, m, p = 5, 4, 2
        W = _kkt_like(rng, n, m, p, spd=(trial % 2 == 0))
        fac = ldlt_factor(W, 1e-13, nb=4)
        ev = np.linalg.eigvalsh(np.asarray(W))
        # Sylvester: inertia of D == inertia of W (when no pivot skipped)
        assert int(jnp.sum(fac.vec > 1e-13)) == int((ev > 0).sum())


def test_ldlt_detects_wrong_inertia():
    """Indefinite (1,1) block ⇒ more than nvar... fewer than nvar positive
    pivots ⇒ the success flag must be False — this is what triggers the
    solver's rho-bump loop."""
    rng = np.random.default_rng(2)
    n, m, p = 5, 4, 2
    W = _kkt_like(rng, n, m, p, spd=False)
    fac = ldlt_factor(W, 1e-13, nb=4)
    ev = np.linalg.eigvalsh(np.asarray(W))
    expected = int((ev > 0).sum()) == n
    assert bool(inertia_success(fac.vec, fac.mat, n, 1e-13)) == expected


def test_ldlt_singular_matrix_fails_cleanly():
    """A singular matrix must report failure with finite outputs (pivot
    skipping), not NaNs."""
    A = jnp.zeros((6, 6)).at[0, 0].set(1.0)
    fac = ldlt_factor(A, 1e-13, nb=3)
    assert not bool(inertia_success(fac.vec, fac.mat, 6, 1e-13))
    assert bool(jnp.all(jnp.isfinite(fac.mat))) and bool(jnp.all(jnp.isfinite(fac.vec)))


def test_ldlt_vmaps():
    rng = np.random.default_rng(3)
    Ws = jnp.stack([_kkt_like(rng, 4, 3, 2) for _ in range(8)])
    facs = jax.vmap(lambda W: ldlt_factor(W, 1e-13, nb=4))(Ws)
    rec = jnp.einsum("bij,bj,bkj->bik", facs.mat, facs.vec, facs.mat)
    assert np.allclose(rec, Ws, atol=1e-9)


def test_eigh_backend():
    rng = np.random.default_rng(4)
    W = _kkt_like(rng, 6, 5, 3)
    fac = eigh_factor(W, 1e-13)
    assert bool(inertia_success(fac.vec, fac.mat, 6, 1e-13))
    rhs = jnp.asarray(rng.normal(size=14))
    x = eigh_solve(fac, rhs, 1e-13)
    assert np.allclose(W @ x, rhs, atol=1e-9)


def test_cgls_least_squares():
    rng = np.random.default_rng(5)
    B = jnp.asarray(rng.normal(size=(12, 5)))
    b = jnp.asarray(rng.normal(size=12))
    y = cgls(B, b)
    y_ref = np.linalg.lstsq(np.asarray(B), np.asarray(b), rcond=None)[0]
    assert np.allclose(y, y_ref, atol=1e-8)


def test_cgls_underdetermined_and_empty():
    rng = np.random.default_rng(6)
    B = jnp.asarray(rng.normal(size=(3, 7)))  # underdetermined
    b = jnp.asarray(rng.normal(size=3))
    y = cgls(B, b)
    # residual must be (near) zero since the system is consistent
    assert np.allclose(B @ y, b, atol=1e-8)
    assert cgls(jnp.zeros((4, 0)), jnp.ones(4)).shape == (0,)


def test_cgls_vmaps():
    rng = np.random.default_rng(7)
    Bs = jnp.asarray(rng.normal(size=(6, 10, 4)))
    bs = jnp.asarray(rng.normal(size=(6, 10)))
    ys = jax.vmap(cgls)(Bs, bs)
    for i in range(6):
        y_ref = np.linalg.lstsq(np.asarray(Bs[i]), np.asarray(bs[i]), rcond=None)[0]
        assert np.allclose(ys[i], y_ref, atol=1e-7)
