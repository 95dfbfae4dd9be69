"""Large single-scene bundle adjustment with a full visibility grid.

The production-scale BA workload (100 cameras x 10,000 landmarks -> 30,600
parameters, 2,000,000 reprojection residuals).  The dense solver cannot touch
this (the materialized Jacobian alone is m*n = 245 GB); the capability analog
in the reference is sparse-J handling (/root/reference/src/CaNNOLeS.jl:259-315).
The TPU-native answers are:

* :class:`~cannoles_tpu.core.ba.SchurBASolver` — direct camera-Schur
  elimination on the structured Gauss-Newton system (core/ba.py);
* :class:`~cannoles_tpu.core.matfree.MatrixFreeSolver` — generic CG fallback.

Layout: ``x = [cams (C, 6).ravel(); pts (P, 3).ravel()]``, pose = (angle-axis
w, translation t), pinhole projection u = f*(R(X - t))_{xy}/z in normalized
image coordinates.  Full (C, P) visibility keeps every per-observation tensor
dense and batched — the TPU restatement of BA sparsity (the block *structure*
is what's exploited, not COO indices).  Gauge freedom is removed by equality
constraints on the camera block only: pose 0 pinned (6) + squared baseline
fixed (1), as in :func:`cannoles_tpu.models.families.bundle_adjustment`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import NLSProblem, nls_problem

__all__ = ["project_point", "large_bundle_adjustment"]


def project_point(cam: jax.Array, pt: jax.Array, focal: float = 1.0) -> jax.Array:
    """Pinhole projection of one landmark through one camera.

    ``cam``: (6,) = (angle-axis w, translation t); ``pt``: (3,).  Returns the
    (2,) normalized image coordinates.  Small-angle-safe Rodrigues rotation
    (same model as models/families.py so the two BA generators agree).
    """
    w, t = cam[:3], cam[3:]
    X = pt - t
    theta2 = jnp.vdot(w, w)
    theta = jnp.sqrt(theta2 + 1e-30)
    k = w / theta
    c, s = jnp.cos(theta), jnp.sin(theta)
    kxX = jnp.cross(k, X)
    Xc_full = c * X + s * kxX + (1 - c) * jnp.vdot(k, X) * k
    Xc = jnp.where(theta2 < 1e-12, X + jnp.cross(w, X), Xc_full)
    z = jnp.maximum(Xc[2], 1e-3)
    return focal * Xc[:2] / z


def large_bundle_adjustment(
    n_cams: int = 100,
    n_pts: int = 10_000,
    noise: float = 0.0,
    seed: int = 0,
    dtype=jnp.float32,
) -> Tuple[NLSProblem, np.ndarray]:
    """Synthesize one consistent large scene; returns (problem, x_true).

    ``data = {"obs": (C, P, 2), "pose0": (6,), "base2": (1,)}``; residual is
    the raveled (C, P, 2) reprojection error — evaluated as one batched
    vmap-of-vmap of :func:`project_point` (pure MXU/VPU work, no Python
    loops), so jvp/vjp through it stay cheap for the matrix-free surface.
    """
    rng = np.random.default_rng(seed)
    C, P = n_cams, n_pts
    angles = np.linspace(-0.4, 0.4, C)
    t_true = np.stack(
        [5.0 * np.sin(angles), 0.3 * rng.normal(size=C), -7.0 + np.cos(angles)], axis=1
    )
    w_true = np.stack(
        [0.05 * rng.normal(size=C), angles * 0.5, 0.02 * rng.normal(size=C)], axis=1
    )
    X_true = rng.uniform(-2.5, 2.5, size=(P, 3))
    X_true[:, 2] += 1.0
    cams_true = np.concatenate([w_true, t_true], axis=1)
    x_true = np.concatenate([cams_true.reshape(-1), X_true.reshape(-1)])

    def _proj_grid(cams, pts):
        return jax.vmap(lambda c: jax.vmap(lambda p: project_point(c, p))(pts))(cams)

    obs = np.asarray(
        _proj_grid(jnp.asarray(cams_true, dtype=jnp.float64), jnp.asarray(X_true))
    )
    obs = obs + noise * rng.normal(size=obs.shape)

    def residual(x, d):
        cams = x[: 6 * C].reshape(C, 6)
        pts = x[6 * C :].reshape(P, 3)
        return (_proj_grid(cams, pts) - d["obs"]).reshape(-1)

    base2 = float(np.sum((t_true[1] - t_true[0]) ** 2))
    pose0 = cams_true[0].copy()

    def cons(x, d):
        c_pin = x[:6] - d["pose0"]
        t0, t1 = x[3:6], x[9:12]
        c_scale = jnp.array([jnp.sum((t1 - t0) ** 2)]) - d["base2"]
        return jnp.concatenate([c_pin, c_scale])

    x0 = x_true + 0.01 * rng.normal(size=x_true.shape)
    x0[:6] = pose0
    pb = nls_problem(
        residual,
        jnp.asarray(x0, dtype=dtype),
        2 * C * P,
        cons,
        np.zeros(7),
        np.zeros(7),
        data={
            "obs": jnp.asarray(obs, dtype=dtype),
            "pose0": jnp.asarray(pose0, dtype=dtype),
            "base2": jnp.asarray([base2], dtype=dtype),
        },
        name=f"ba_large_{C}c{P}p",
    )
    return pb, x_true
