"""Matrix-free product API (NLPModels jprod/jtprod/hprod parity).

The reference's hand-coded fixture implements the full matrix-free NLS API
(jprod_residual!, jtprod_residual!, hprod_residual!, jprod!, jtprod!, hprod!;
/root/reference/test/mgh01con.jl:23-283).  Here every product is a JAX
jvp/vjp and must agree with the materialized Jacobians/Hessians.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cannoles_tpu import nls_problem
from cannoles_tpu.models import mgh01con


@pytest.fixture(scope="module")
def pb():
    return mgh01con()


def _rng():
    return np.random.default_rng(7)


def test_jprod_jtprod_residual(pb):
    rng = _rng()
    x = jnp.asarray(rng.normal(size=pb.nvar))
    v = jnp.asarray(rng.normal(size=pb.nvar))
    w = jnp.asarray(rng.normal(size=pb.nequ))
    J = pb.J(x)
    np.testing.assert_allclose(pb.jprod_res(x, v), J @ v, rtol=1e-12)
    np.testing.assert_allclose(pb.jtprod_res(x, w), J.T @ w, rtol=1e-12)


def test_jprod_jtprod_cons(pb):
    rng = _rng()
    x = jnp.asarray(rng.normal(size=pb.nvar))
    v = jnp.asarray(rng.normal(size=pb.nvar))
    w = jnp.asarray(rng.normal(size=pb.ncon))
    Jc = pb.Jc(x)
    np.testing.assert_allclose(pb.jprod_cons(x, v), Jc @ v, rtol=1e-12)
    np.testing.assert_allclose(pb.jtprod_cons(x, w), Jc.T @ w, rtol=1e-12)


def test_hprod_residual(pb):
    rng = _rng()
    x = jnp.asarray(rng.normal(size=pb.nvar))
    r = jnp.asarray(rng.normal(size=pb.nequ))
    v = jnp.asarray(rng.normal(size=pb.nvar))
    H = pb.hess_res(x, r)
    np.testing.assert_allclose(pb.hprod_res(x, r, v), H @ v, rtol=1e-11)


def test_hprod_cons(pb):
    rng = _rng()
    x = jnp.asarray(rng.normal(size=pb.nvar))
    y = jnp.asarray(rng.normal(size=pb.ncon))
    v = jnp.asarray(rng.normal(size=pb.nvar))
    H = pb.hess_cons(x, y)
    np.testing.assert_allclose(pb.hprod_cons(x, y, v), H @ v, rtol=1e-11)


def test_hprod_lagrangian(pb):
    """hprod! contract: ∇²(σ·½‖F‖² + yᵀc) v, checked against the assembled
    Gauss–Newton + curvature + constraint-curvature Hessian."""
    rng = _rng()
    x = jnp.asarray(rng.normal(size=pb.nvar))
    y = jnp.asarray(rng.normal(size=pb.ncon))
    v = jnp.asarray(rng.normal(size=pb.nvar))
    sigma = 0.7
    J = pb.J(x)
    F = pb.F(x)
    H = sigma * (J.T @ J + pb.hess_res(x, F)) + pb.hess_cons(x, y)
    np.testing.assert_allclose(
        pb.hprod_lag(x, y, v, obj_weight=sigma), H @ v, rtol=1e-10
    )


def test_unconstrained_products_empty():
    pb = nls_problem(
        lambda x: jnp.array([x[0] - 1.0, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
    )
    x = pb.x0
    v = jnp.ones(2)
    assert pb.jprod_cons(x, v).shape == (0,)
    assert pb.jtprod_cons(x, jnp.zeros(0)).shape == (2,)
    assert pb.hprod_cons(x, jnp.zeros(0), v).shape == (2,)


def test_nofhess_hprod_raises():
    pb = nls_problem(
        lambda x: jnp.array([x[0] - 1.0, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
        has_residual_hessian=False,
    )
    with pytest.raises(NotImplementedError):
        pb.hprod_res(pb.x0, jnp.zeros(2), jnp.ones(2))


def test_products_jit_and_vmap(pb):
    """The products must be jittable and vmappable (batched-instance axis)."""
    rng = _rng()
    B = 4
    xs = jnp.asarray(rng.normal(size=(B, pb.nvar)))
    vs = jnp.asarray(rng.normal(size=(B, pb.nvar)))
    out = jax.jit(jax.vmap(lambda x, v: pb.jprod_res(x, v)))(xs, vs)
    ref = jnp.stack([pb.J(xs[i]) @ vs[i] for i in range(B)])
    np.testing.assert_allclose(out, ref, rtol=1e-12)
