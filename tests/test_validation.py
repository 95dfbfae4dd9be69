"""Input-validation tests (reference test/runtests.jl:13-26)."""

import jax.numpy as jnp
import pytest

from cannoles_tpu import cannoles, nls_problem


def test_inequalities_rejected():
    nls = nls_problem(lambda x: x, jnp.zeros(5), 5, lambda x: x, jnp.zeros(5), jnp.ones(5))
    with pytest.raises(ValueError, match="inequalities"):
        cannoles(nls)


def test_bounds_rejected():
    nls = nls_problem(lambda x: x, jnp.zeros(3), 3, lvar=jnp.zeros(3), uvar=jnp.ones(3))
    with pytest.raises(ValueError, match="inequalities"):
        cannoles(nls)


def test_bad_method_rejected():
    nls = nls_problem(
        lambda x: x, jnp.zeros(1), 1, lambda x: jnp.array([x[0]]), jnp.zeros(1), jnp.zeros(1)
    )
    with pytest.raises(ValueError, match="`method` must be one of these"):
        cannoles(nls, method="truc")


def test_maximization_rejected():
    nls = nls_problem(lambda x: x, jnp.zeros(1), 1, minimize=False)
    with pytest.raises(ValueError, match="minimization"):
        cannoles(nls)


def test_reference_method_aliases_accepted():
    nls = nls_problem(lambda x: x - 1.0, jnp.zeros(3), 3)
    for method in ("Newton", "LM", "Newton_noFHess", "Newton_vanishing"):
        stats = cannoles(nls, method=method)
        assert stats.status == "first_order"
