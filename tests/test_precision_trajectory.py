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
