"""Low-precision solves (reference Float16 test analog, runtests.jl:102-113)
and exact iterate-trajectory parity across the LDLᵀ backend seams (SURVEY.md
§4 mapping (d): same algorithm ⇒ identical trajectories)."""

import jax.numpy as jnp
import numpy as np

from cannoles_tpu import CaNNOLeSSolver, nls_problem
from cannoles_tpu.ops.cpp_ldlt import cpp_available


def _pb():
    return nls_problem(
        lambda x: jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0]),
        2,
        lambda x: jnp.array([jnp.sum(x) - 1]),
        [0.0],
        [0.0],
    )


def test_float16_solves():
    dt = jnp.float16
    nls = nls_problem(
        lambda x: jnp.array([x[0] - 1, 10 * (x[1] - x[0] ** 2)]),
        jnp.array([-1.2, 1.0], dtype=dt),
        2,
        lambda x: jnp.array([jnp.sum(x) - 1]),
        [0.0],
        [0.0],
    )
    stats = CaNNOLeSSolver(nls, dtype=dt).solve()
    assert stats.status == "first_order"
    eps = float(jnp.finfo(dt).eps)
    tol = max(1e-4, eps**0.25)  # reference multiprecision tolerance
    assert np.allclose(np.asarray(stats.solution, np.float64), [0.6188, 0.3812], atol=tol)


def test_identical_trajectories_across_backends():
    """ldlt / pallas (interpret) / cpp implement the same unpivoted
    factorization ⇒ identical iteration counts, factorization counts and
    solutions to machine precision."""
    backends = ["ldlt", "pallas"] + (["cpp"] if cpp_available() else [])
    runs = {b: CaNNOLeSSolver(_pb(), linsolve=b).solve() for b in backends}
    ref = runs["ldlt"]
    for b, st in runs.items():
        assert st.iter == ref.iter, (b, st.iter, ref.iter)
        assert st.solver_specific["nfact"] == ref.solver_specific["nfact"], b
        assert np.allclose(st.solution, ref.solution, atol=1e-12), b


def test_bf16_commit_quality_gate_tolerance():
    """Commit-mode bf16 must not trip the quality gate spuriously (round-3
    advisor medium): the gate residual is always measured at 'highest' and
    its tolerance scales with the committed arithmetic's unit roundoff."""
    rng = np.random.default_rng(0)
    m, n = 48, 16
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), jnp.float32)
    xt = jnp.asarray(rng.normal(size=n), jnp.float32)
    b = A @ xt
    pb = nls_problem(lambda x: A @ x - b, jnp.zeros(n, jnp.float32), m)

    s16 = CaNNOLeSSolver(
        pb, method="gauss_newton", kkt="condensed", linsolve="chol",
        matmul_precision="bfloat16", quality_gate=True, dtype=jnp.float32,
    )
    assert s16.quality_gate  # N = n = 16 >= 16: gate on by default
    assert s16._gate_eps == float(jnp.finfo(jnp.bfloat16).eps)
    stats = s16.solve()
    assert stats.status in ("first_order", "small_residual"), stats.status
    assert stats.solver_specific["internal_msg"] == ""

    # unit-level: a solution carrying bf16-roundoff error passes the bf16
    # gate but fails the f32 gate (the tolerance really does scale)
    W = jnp.asarray(np.eye(16) + 0.01 * rng.normal(size=(16, 16)), jnp.float32)
    W = 0.5 * (W + W.T) + 2 * jnp.eye(16, dtype=jnp.float32)
    sol = jnp.asarray(rng.normal(size=16), jnp.float32)
    rhs = W @ sol
    noisy = sol * (1 + 2e-3)  # ~bf16-eps relative error, >> f32 tolerance
    s32 = CaNNOLeSSolver(
        pb, method="gauss_newton", kkt="condensed", linsolve="chol",
        quality_gate=True, dtype=jnp.float32,
    )
    assert bool(s16._solve_quality_ok(W, noisy, rhs))
    assert not bool(s32._solve_quality_ok(W, noisy, rhs))
