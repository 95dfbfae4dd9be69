"""Pallas TPU kernel: large-N blocked Cholesky for the condensed KKT system.

This is the owned factorization centerpiece for the large-problem regime
(N = 256–4096+): the reference's native layer is a sparse LDLᵀ with inertia
(`/root/reference/src/solver_types.jl:17-43`); the TPU-native answer for the
dense condensed quasi-definite system is a *blocked Cholesky* whose success
test (all pivots > eig_tol, finite) is the same inertia criterion evaluated
on an SPD candidate (core/solver.py 'chol' backend docstring).

Why not just ``jnp.linalg.cholesky``?  XLA's TPU lowering is a blocked
right-looking algorithm whose panel factor and triangular solves serialize
poorly: ``triangular_solve`` on TPU is row-recurrence bound (measured: the
two N=2048 triangular solves of a cho_solve cost ~6x the factorization's
useful matmul time).  The design here:

* a **Pallas block kernel** factors an (nb, nb) diagonal block entirely in
  VMEM *and returns its inverse* — the inverse costs one extra in-VMEM
  substitution loop (~nb³ VPU flops, microseconds) and converts every
  downstream triangular solve involving that block into an MXU matmul;
* the **blocked driver** is a static Python loop over K = N/nb panels
  (static shapes, shrinking trailing blocks): panel solve
  ``L21 = A21 @ L11⁻ᵀ`` and trailing update ``A22 -= L21 L21ᵀ`` are plain
  XLA matmuls — the O(N³) bulk rides the MXU at full tile efficiency;
* **solves reuse the block inverses**: forward/backward substitution by
  blocks is K matvec/matmul steps with zero ``triangular_solve`` calls.

Breakdown handling is branch-free like :mod:`cannoles_tpu.ops.ldlt`: a pivot
``d ≤ tol`` is recorded raw in the pivot vector (the success test fails) and
its column is zeroed so the factorization finishes with finite numbers — the
caller's rho-bump ladder (CaNNOLeS.jl:1029-1047 schedule) retries.

On non-TPU backends the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["BlockCholFactorization", "pallas_cholesky", "block_cho_solve"]


def _is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def _chol_block_kernel(A_ref, L_ref, Linv_ref, d_ref, *, nb: int, tol: float):
    """Factor one (nb, nb) SPD block: A = L Lᵀ, also computing L⁻¹ and the
    raw pivots d (pre-sqrt Schur diagonals — the inertia signal).

    Everything lives in VMEM; the two substitution loops are VPU work with a
    (1, nb) row matmul per step (MXU) for the inverse.
    """
    rows = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    Lv, Minv, Dv = _factor_block_inline(
        A_ref[:], tol, nb, rows, cols, lax.Precision.HIGHEST
    )
    L_ref[:] = Lv
    Linv_ref[:] = Minv
    d_ref[:] = Dv


def _factor_block_inline(Akk, tol: float, nb: int, rows, cols, precision):
    """Trace-level helper: factor one (nb, nb) block and invert its L —
    shared by the per-block pallas kernel and the fused whole-matrix kernel
    (pure jnp on values, works in both contexts)."""
    dtype = Akk.dtype
    rcol = rows[:, :1]
    crow = cols[:1, :]

    def fact_step(t, carry):
        P, L, D = carry
        col = jnp.sum(jnp.where(cols == t, P, 0.0), axis=1, keepdims=True)
        d = jnp.sum(jnp.where(rcol == t, col, 0.0))
        ok = d > tol
        piv = jnp.sqrt(jnp.where(ok, d, 1.0))
        inv = jnp.where(ok, 1.0 / piv, 0.0)
        lcol = jnp.where(rcol > t, col * inv, 0.0)
        lfull = lcol + jnp.where(rcol == t, jnp.where(ok, piv, 0.0), 0.0)
        L = L + lfull * (cols == t).astype(dtype)
        D = D + jnp.where(rcol == t, d, 0.0)
        P = P - lcol * lcol.T
        return P, L, D

    _, Lv, Dv = lax.fori_loop(
        0, nb, fact_step,
        (Akk, jnp.zeros_like(Akk), jnp.zeros_like(Akk, shape=(nb, 1))),
    )

    def inv_step(t, Minv):
        Lrow = jnp.sum(jnp.where(rows == t, Lv, 0.0), axis=0, keepdims=True)
        Lrow_strict = jnp.where(crow < t, Lrow, 0.0)
        acc = jax.lax.dot_general(
            Lrow_strict, Minv, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=dtype,
        )
        piv = jnp.sum(jnp.where(crow == t, Lrow, 0.0))
        okt = piv > 0
        inv_t = jnp.where(okt, 1.0 / jnp.where(okt, piv, 1.0), 0.0)
        row_new = ((crow == t).astype(dtype) - acc) * inv_t
        return Minv + row_new * (rows == t).astype(dtype)

    Minv = lax.fori_loop(0, nb, inv_step, jnp.zeros_like(Akk))
    return Lv, Minv, Dv


def _chol_fused_kernel(A_ref, L_ref, Linv_ref, d_ref, *, N, nb, tol):
    """Whole-matrix blocked Cholesky in ONE pallas program.

    The blocked driver around per-block kernels loses to XLA at N ≥ 512:
    at condensed-KKT sizes the factorization is *launch-latency* bound
    (4096³/3 flops ≈ 0.12 ms at peak vs ~4 ms wall), so the win is doing
    every panel factor, panel solve and trailing matmul inside one kernel
    with the working matrix resident in VMEM.  ``A_ref`` is aliased onto
    ``L_ref`` (input_output_aliases): the elimination runs fully in place —
    panel k overwrites its own columns with L while the trailing block still
    holds A — so a single (N, N) buffer serves as both, and N ≤ ~1280 fits
    f32 VMEM.  Static Python unroll over K = N/nb panels: slices are
    compile-time constant; matmuls ride the MXU via dot_general.
    """
    del A_ref  # same buffer as L_ref
    K = N // nb
    prec = lax.Precision.HIGHEST
    rows = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    for k in range(K):
        j0, j1 = k * nb, (k + 1) * nb
        Akk = L_ref[j0:j1, j0:j1]
        Lkk, Minv, Dk = _factor_block_inline(Akk, tol, nb, rows, cols, prec)
        L_ref[j0:j1, j0:j1] = Lkk
        Linv_ref[k] = Minv
        d_ref[j0:j1, :] = Dk
        if j1 < N:
            A21 = L_ref[j1:N, j0:j1]
            L21 = lax.dot_general(
                A21, Minv, (((1,), (1,)), ((), ())),  # A21 @ Minvᵀ
                precision=prec, preferred_element_type=Lkk.dtype,
            )
            L_ref[j1:N, j0:j1] = L21
            L_ref[j1:N, j1:N] = L_ref[j1:N, j1:N] - lax.dot_general(
                L21, L21, (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=Lkk.dtype,
            )
    # strict upper triangle still holds stale A values: zero it so L is a
    # true lower-triangular factor
    rN = lax.broadcasted_iota(jnp.int32, (N, N), 0)
    cN = lax.broadcasted_iota(jnp.int32, (N, N), 1)
    L_ref[:] = jnp.where(cN > rN, 0.0, L_ref[:])


@functools.lru_cache(maxsize=None)
def _build_fused_call(N: int, nb: int, tol: float, dtype_str: str, interpret: bool):
    dtype = jnp.dtype(dtype_str)
    K = N // nb
    kernel = functools.partial(_chol_fused_kernel, N=N, nb=nb, tol=tol)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, N), dtype),
            jax.ShapeDtypeStruct((K, nb, nb), dtype),
            jax.ShapeDtypeStruct((N, 1), dtype),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build_block_call(nb: int, tol: float, dtype_str: str, interpret: bool):
    dtype = jnp.dtype(dtype_str)
    kernel = functools.partial(_chol_block_kernel, nb=nb, tol=tol)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, nb), dtype),
            jax.ShapeDtypeStruct((nb, nb), dtype),
            jax.ShapeDtypeStruct((nb, 1), dtype),
        ],
        interpret=interpret,
    )


def _chol_block(A, tol: float):
    nb = A.shape[-1]
    call = _build_block_call(nb, float(tol), str(A.dtype), not _is_tpu())
    L, Linv, d = call(A)
    return L, Linv, d[:, 0]


class BlockCholFactorization(NamedTuple):
    """A = L Lᵀ with per-panel diagonal-block inverses.

    ``L``: (N, N) lower-triangular (padded rows/cols identity);
    ``Linv``: (K, nb, nb) inverses of the diagonal blocks of L;
    ``d``: (N,) raw pivots (Schur diagonals before sqrt) — inertia signal;
    ``ok``: scalar bool — positive-definite success (every original pivot
    strictly above tol, everything finite);
    ``n0``: original (unpadded) N; ``nb``: panel width.
    """

    L: jax.Array
    Linv: jax.Array
    d: jax.Array
    ok: jax.Array
    n0: int
    nb: int


def pallas_cholesky(A: jax.Array, tol: float, nb: int = 256) -> BlockCholFactorization:
    """Blocked Cholesky of a symmetric (N, N) matrix (lower part used).

    Static Python loop over K = ceil(N/nb) panels: Pallas kernel on each
    diagonal block (factor + inverse in VMEM), XLA matmuls for the panel
    solve and the symmetric trailing update.  ``fac.ok`` is the positive-
    definiteness test; on failure pivots ≤ tol are recorded and skipped so
    the caller's rho ladder can retry.
    """
    N0 = A.shape[-1]
    dtype = A.dtype
    nb = max(128, min(nb, 512))
    N = -(-N0 // nb) * nb
    if N != N0:
        P = jnp.eye(N, dtype=dtype)
        A = P.at[:N0, :N0].set(A)
    K = N // nb

    # single-launch fused kernel while the (N, N) working buffer fits VMEM
    # (in-place via input/output aliasing; f32 1280² = 6.6 MB).  Beyond that,
    # the blocked driver below alternates per-block kernels with XLA matmuls.
    if N * N * jnp.dtype(dtype).itemsize <= 1280 * 1280 * 4:
        call = _build_fused_call(N, nb, float(tol), str(dtype), not _is_tpu())
        L, Linv, d2 = call(A)
        d = d2[:, 0]
        ok = jnp.all(jnp.isfinite(L)) & jnp.all(d[:N0] > tol)
        return BlockCholFactorization(L, Linv, d, ok, N0, nb)

    L = jnp.zeros((N, N), dtype=dtype)
    Linvs = []
    ds = []
    M = A
    for k in range(K):
        j0 = k * nb
        Akk = M[j0 : j0 + nb, j0 : j0 + nb]
        Lkk, Linv_k, dk = _chol_block(Akk, tol)
        L = L.at[j0 : j0 + nb, j0 : j0 + nb].set(Lkk)
        Linvs.append(Linv_k)
        ds.append(dk)
        if j0 + nb < N:
            A21 = M[j0 + nb :, j0 : j0 + nb]
            L21 = jnp.matmul(A21, Linv_k.T, precision="highest")
            L = L.at[j0 + nb :, j0 : j0 + nb].set(L21)
            M = M.at[j0 + nb :, j0 + nb :].add(
                -jnp.matmul(L21, L21.T, precision="highest")
            )
    d = jnp.concatenate(ds)
    ok = jnp.all(jnp.isfinite(L)) & jnp.all(d[:N0] > tol)
    return BlockCholFactorization(L, jnp.stack(Linvs), d, ok, N0, nb)


def _pad_rhs(fac: BlockCholFactorization, b: jax.Array):
    N = fac.L.shape[-1]
    if b.shape[0] == N:
        return b
    pad = [(0, N - b.shape[0])] + [(0, 0)] * (b.ndim - 1)
    return jnp.pad(b, pad)


def block_forward_solve(fac: BlockCholFactorization, b: jax.Array) -> jax.Array:
    """Solve L y = b by blocks — matmuls only, no triangular_solve."""
    nb, N = fac.nb, fac.L.shape[-1]
    b = _pad_rhs(fac, b)
    squeeze = b.ndim == 1
    B = b[:, None] if squeeze else b
    K = N // nb
    ys = []
    for k in range(K):
        j0 = k * nb
        rhs = B[j0 : j0 + nb]
        if k > 0:
            ycat = jnp.concatenate(ys, axis=0)
            rhs = rhs - jnp.matmul(
                fac.L[j0 : j0 + nb, :j0], ycat, precision="highest"
            )
        ys.append(jnp.matmul(fac.Linv[k], rhs, precision="highest"))
    y = jnp.concatenate(ys, axis=0)
    return y[:, 0] if squeeze else y


def block_backward_solve(fac: BlockCholFactorization, b: jax.Array) -> jax.Array:
    """Solve Lᵀ x = b by blocks — matmuls only."""
    nb, N = fac.nb, fac.L.shape[-1]
    b = _pad_rhs(fac, b)
    squeeze = b.ndim == 1
    B = b[:, None] if squeeze else b
    K = N // nb
    xs = [None] * K
    for k in range(K - 1, -1, -1):
        j0 = k * nb
        rhs = B[j0 : j0 + nb]
        if k < K - 1:
            xcat = jnp.concatenate(xs[k + 1 :], axis=0)
            rhs = rhs - jnp.matmul(
                fac.L[j0 + nb :, j0 : j0 + nb].T, xcat, precision="highest"
            )
        xs[k] = jnp.matmul(fac.Linv[k].T, rhs, precision="highest")
    x = jnp.concatenate(xs, axis=0)
    return x[:, 0] if squeeze else x


def block_cho_solve(fac: BlockCholFactorization, b: jax.Array) -> jax.Array:
    """Solve A x = b given A = L Lᵀ; accepts (N,) or (N, k) right-hand
    sides, returns the unpadded solution."""
    x = block_backward_solve(fac, block_forward_solve(fac, b))
    return x[: fac.n0] if x.shape[0] != fac.n0 else x
