"""Pallas TPU kernel: fused batched LDLᵀ factor + solve for small KKT systems.

This is the hot kernel of the vmapped-instance regime (BASELINE config 3/5):
thousands of small (N ≤ ~64) quasi-definite KKT systems factorized per solver
iteration.  The TPU-native layout decision:

* **batch on lanes**: matrices are stored ``(N, N, TB)`` with TB = 128
  instances riding the 128-wide vector lanes.  One elimination step is then a
  handful of (N, TB)-shaped VPU ops executed in lockstep for 128 instances —
  instead of vmapping a scalar factorization, which would leave XLA padding
  each tiny N×N matrix to an (8, 128) tile (≥ 40× wasted lanes for N ≈ 5).

* **fused factor+solve**: the pivot vector d (for the caller's inertia test,
  solver_types.jl:90-96 semantics) and the solution of W x = rhs come out of
  one kernel; the working matrix is eliminated in place and its strictly-lower
  columns are re-used as the L factor for the triangular solves, so VMEM holds
  a single (N, N, TB) scratch.

* **branch-free breakdown**: pivots with |d| ≤ eig_tol are skipped (column
  zeroed), mirroring :mod:`cannoles_tpu.ops.ldlt`; the caller's rho-bump loop
  reads failure off the returned pivots.

Integration: :func:`fused_ldlt_solve` is a ``jax.custom_batching.custom_vmap``
— unbatched calls use the pure-JAX blocked path, and when the whole solver is
vmapped (``vsolve``) the batch axis lands here and dispatches to this kernel.
On non-TPU backends the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ldlt import ldlt_factor, ldlt_solve

__all__ = [
    "fused_ldlt_solve",
    "batched_ldlt_solve_pallas",
    "PALLAS_MAX_N",
    "PALLAS_EAGER_MAX_N",
    "pallas_large_n_opt_in",
]

_LANES = 128

# Largest KKT size the lanes-batched kernel handles.  VMEM-bounded: the
# kernel eliminates the (N, N, 128) f32 input block in place (no scratch
# copy), so with double-buffered grid pipelining the footprint is
# ~2·N²·128·4 B — N = 160 uses ~13 MB of the ~16 MB VMEM.  Above this the
# custom_vmap rule falls back to the vmapped blocked-jnp path.
PALLAS_MAX_N = 160

# Compile-budget threshold: the kernel's N loop is fully unrolled (Mosaic TC
# has no dynamic slicing over the elimination index), so Mosaic compile time
# grows ~N³ — measured 50 s at N = 96, 220 s at N = 128, 411 s at N = 160
# (RESULTS.md mid-size table).  The persistent compilation cache amortizes
# it, but a first-run user must not silently wait 7 minutes: between
# PALLAS_EAGER_MAX_N and PALLAS_MAX_N the dispatch warns and falls back to
# the vmapped blocked-jnp path unless the user opts in (env
# CANNOLES_PALLAS_LARGE_N=1 — the kernel is 2-6.6× faster per solve there,
# so opting in pays off for any long-lived or cache-warm deployment).
PALLAS_EAGER_MAX_N = 96


def pallas_large_n_opt_in() -> bool:
    """True when the user accepted the minutes-scale Mosaic compile of the
    unrolled kernel at N = 97..160 (env ``CANNOLES_PALLAS_LARGE_N=1``)."""
    return os.environ.get("CANNOLES_PALLAS_LARGE_N", "") not in ("", "0")


def _fused_kernel(W_ref, rhs_ref, x_ref, d_ref, *, N: int, eig_tol: float):
    """One program: factor+solve TB instances in lockstep.

    W_ref:   (N, N, TB) symmetric input, eliminated IN PLACE — the input
             block is a per-grid-step VMEM-local copy (the batch grid
             touches each block exactly once, so mutating it is safe), and
             skipping a separate scratch copy halves the kernel's VMEM
             footprint, raising the N cap from 96 to ~160 at full 128 lanes
    rhs_ref: (N, TB)
    x_ref:   (N, TB) output solution of W x = rhs
    d_ref:   (N, TB) output raw pivots (inertia signal)

    After elimination, row k of W_ref holds the strictly-lower column k of L.
    """
    Wk = W_ref
    rows = lax.broadcasted_iota(jnp.int32, (N, 1), 0)  # (N, 1) — 2D iota

    # N is a trace-time constant and small: unroll with Python loops so every
    # index is static (Mosaic TC has no dynamic_slice)
    for k in range(N):
        row = Wk[k]  # (N, TB); symmetric ⇒ row k == column k
        dk = row[k]  # (TB,)
        ok = jnp.abs(dk) > eig_tol
        inv = jnp.where(ok, 1.0 / jnp.where(ok, dk, 1.0), 0.0)
        col = jnp.where(rows > k, row * inv[None, :], 0.0)  # (N, TB) strict
        d_ref[k] = dk
        Wk[k] = col  # row k no longer needed: store L column there
        # symmetric rank-1 update of the trailing block; col is zero at
        # indices ≤ k so rows/cols ≤ k (incl. the L storage) are untouched
        Wk[:] = Wk[:] - dk[None, None, :] * col[:, None, :] * col[None, :, :]

    # forward substitution: y_i -= L[i,k] y_k, in place in x_ref
    x_ref[:] = rhs_ref[:]
    for k in range(N):
        yk = x_ref[k]  # (TB,)
        x_ref[:] = x_ref[:] - Wk[k] * yk[None, :]

    # diagonal scale
    dall = d_ref[:]
    okd = jnp.abs(dall) > eig_tol
    x_ref[:] = x_ref[:] * jnp.where(okd, 1.0 / jnp.where(okd, dall, 1.0), 0.0)

    # backward substitution, in place: entries > k are final, ≤ k untouched
    for t in range(N):
        k = N - 1 - t
        s = jnp.sum(Wk[k] * x_ref[:], axis=0)  # L[k][i≤k] = 0 ⇒ sums i>k only
        x_ref[k] = x_ref[k] - s


def _is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _build_pallas_call(N: int, B_blocks: int, eig_tol: float, dtype_str: str, interpret: bool):
    dtype = jnp.dtype(dtype_str)
    kernel = functools.partial(_fused_kernel, N=N, eig_tol=eig_tol)
    # Mosaic's scoped-VMEM default is 16 MB — a compiler cap, not the
    # hardware limit (v5e has far more).  The double-buffered (N, N, 128)
    # input window crosses 16 MB at N = 128; size the cap to the actual
    # footprint (in+out windows, double-buffered) with headroom.
    itemsize = dtype.itemsize
    footprint = 2 * (N * N + 3 * N) * _LANES * itemsize
    params = {}
    if footprint > 15 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=footprint + (4 << 20)
        )
    return pl.pallas_call(
        kernel,
        grid=(B_blocks,),
        **params,
        in_specs=[
            pl.BlockSpec((N, N, _LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B_blocks * _LANES), dtype),
            jax.ShapeDtypeStruct((N, B_blocks * _LANES), dtype),
        ],
        interpret=interpret,
    )


def batched_ldlt_solve_pallas(W, rhs, eig_tol: float):
    """Batched fused factor+solve.  W: (B, N, N), rhs: (B, N) →
    (x (B, N), d (B, N))."""
    B, N, _ = W.shape
    dtype = W.dtype
    Bpad = -(-B // _LANES) * _LANES
    # lanes-last layout
    Wt = jnp.moveaxis(W, 0, -1)  # (N, N, B)
    rt = jnp.moveaxis(rhs, 0, -1)  # (N, B)
    if Bpad != B:
        # pad with identity matrices so padded lanes factor cleanly
        eye = jnp.broadcast_to(jnp.eye(N, dtype=dtype)[:, :, None], (N, N, Bpad - B))
        Wt = jnp.concatenate([Wt, eye], axis=-1)
        rt = jnp.concatenate([rt, jnp.zeros((N, Bpad - B), dtype=dtype)], axis=-1)
    call = _build_pallas_call(N, Bpad // _LANES, float(eig_tol), str(dtype), not _is_tpu())
    x, d = call(Wt, rt)
    return jnp.moveaxis(x[:, :B], -1, 0), jnp.moveaxis(d[:, :B], -1, 0)


@functools.lru_cache(maxsize=None)
def _make_fused(eig_tol: float, nb: int):
    @jax.custom_batching.custom_vmap
    def fused(W, rhs):
        # unbatched path: pure-JAX blocked LDLᵀ
        fac = ldlt_factor(W, eig_tol, nb=nb)
        x = ldlt_solve(fac, rhs, eig_tol)
        return x, fac.vec

    @fused.def_vmap
    def _rule(axis_size, in_batched, W, rhs):
        W_b, rhs_b = in_batched
        if not W_b:
            W = jnp.broadcast_to(W, (axis_size,) + W.shape)
        if not rhs_b:
            rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
        N = W.shape[-1]
        # VMEM budget: the in-place kernel holds one (N, N, 128) block
        # (double-buffered across grid steps); beyond PALLAS_MAX_N fall back
        # to the vmapped blocked-jnp path.  Between PALLAS_EAGER_MAX_N and
        # PALLAS_MAX_N the unrolled kernel's Mosaic compile costs minutes
        # (~N³ growth): warn + fall back unless the user opted in.
        use_kernel = N <= PALLAS_EAGER_MAX_N or (
            N <= PALLAS_MAX_N and pallas_large_n_opt_in()
        )
        if not use_kernel:
            if N <= PALLAS_MAX_N:
                warnings.warn(
                    f"pallas LDLT at N={N}: Mosaic compile of the unrolled "
                    f"kernel takes minutes above N={PALLAS_EAGER_MAX_N} "
                    "(measured 220 s at N=128, 411 s at N=160; cached "
                    "afterwards).  Falling back to the vmapped blocked-jnp "
                    "path; set CANNOLES_PALLAS_LARGE_N=1 to opt in to the "
                    "kernel (2-6.6x faster per solve once compiled).",
                    stacklevel=2,
                )

            def one(Wi, ri):
                fac = ldlt_factor(Wi, eig_tol, nb=nb)
                return ldlt_solve(fac, ri, eig_tol), fac.vec

            x, d = jax.vmap(one)(W, rhs)
        else:
            x, d = batched_ldlt_solve_pallas(W, rhs, eig_tol)
        return (x, d), (True, True)

    return fused


def fused_ldlt_solve(W, rhs, eig_tol: float, nb: int = 32):
    """Solve W x = rhs via unpivoted LDLᵀ, returning (x, pivots).

    Scalar calls run the blocked jnp path; under vmap (the vsolve batch
    regime) the custom_vmap rule dispatches the whole batch to the Pallas
    lanes-last kernel."""
    return _make_fused(float(eig_tol), int(nb))(W, rhs)
