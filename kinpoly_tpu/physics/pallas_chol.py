"""Pallas TPU kernels: batched Cholesky factor + triangular solves.

XLA's cholesky/triangular_solve on TPU are the engine's hot spot: profiling
shows each (batch, 75, 75) factor+solve pair costs ~5.5 ms at batch 512 —
~85% of the physics substep. These kernels lay the batch on the 128-lane
axis (batch-last (n, n, TILE) layout) so every step of the column recursion
is a full-width VPU op, and the whole factor+solve runs VMEM-resident.

The column recursions are *statically unrolled* (n is a compile-time
constant; Pallas TC lowering has no dynamic_slice on values), so every
slice is static and Mosaic sees a straight-line vector program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


@functools.lru_cache(maxsize=None)
def make_vmappable_spd_solve():
    """SPD multi-RHS solve usable inside vmapped env steps: the unbatched
    primal is the XLA Cholesky path; the vmap batching rule routes the whole
    batch into the Pallas factor+solve kernel."""

    @jax.custom_batching.custom_vmap
    def solve(A, B):
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False)

    @solve.def_vmap
    def _batched(axis_size, in_batched, A, B):
        del axis_size, in_batched
        return chol_solve_only(A, B), True

    return solve


def _factor(A, n: int):
    """Right-looking Cholesky on a batch-last (N, N, T) value; returns L
    (lower triangular; junk above the diagonal is never read). The column
    recursion is statically unrolled with numpy masks — ~6 full-width VPU
    ops per column."""
    N = A.shape[0]
    # masks built in-kernel from iota (pallas forbids captured constants)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    L_cols = []
    for j in range(n):
        cj = A[:, j, :]                           # (N, T): current column j
        dj = jnp.sqrt(cj[j])
        col = cj / dj * (row >= j).astype(cj.dtype)
        L_cols.append(col)
        u = col * (row > j).astype(cj.dtype)      # strictly-below part
        A = A - u[:, None, :] * u[None, :, :]     # touches only [j+1:, j+1:]
    for j in range(n, N):
        L_cols.append(A[:, j, :])
    return jnp.stack(L_cols, axis=1)


def _fwd_solve(L, B, n: int):
    """Solve L Y = B with L (N, N, T), B (N, R, T) batch-last."""
    N = B.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    Y_rows = []
    for j in range(n):
        yj = B[j] / L[j, j, :]                    # (R, T)
        Y_rows.append(yj)
        lcol = L[:, j, :] * (row > j).astype(yj.dtype)
        B = B - lcol[:, None, :] * yj[None, :, :]
    for j in range(n, N):
        Y_rows.append(B[j])
    return Y_rows


def _bwd_solve(L, Y, n: int):
    """Solve L^T X = Y (Y as a list of (R, T) rows)."""
    N = len(Y)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    Ym = jnp.stack(Y, axis=0)
    X = [None] * N
    for j in reversed(range(n)):
        xj = Ym[j] / L[j, j, :]
        X[j] = xj
        lrow = L[j, :, :] * (row < j).astype(xj.dtype)    # L[j, k], k < j
        Ym = Ym - lrow[:, None, :] * xj[None, :, :]
    for j in range(n, N):
        X[j] = Ym[j]
    return jnp.stack(X, axis=0)


def _factor_solve_kernel(A_ref, B_ref, L_ref, X_ref, *, n: int):
    A = A_ref[:]
    L = _factor(A, n)
    L_ref[:] = L
    Y = _fwd_solve(L, B_ref[:], n)
    X_ref[:] = _bwd_solve(L, Y, n)


def _apply_kernel(L_ref, B_ref, X_ref, *, n: int):
    L = L_ref[:]
    Y = _fwd_solve(L, B_ref[:], n)
    X_ref[:] = _bwd_solve(L, Y, n)


def _solve_only_kernel(A_ref, B_ref, X_ref, *, n: int):
    """Factor + solve without materialising L to HBM (the engine's hot path
    never reuses the factor; dropping the L output halves the kernel's
    VMEM footprint, which matters at R ~ 55 RHS columns)."""
    L = _factor(A_ref[:], n)
    Y = _fwd_solve(L, B_ref[:], n)
    X_ref[:] = _bwd_solve(L, Y, n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_only(A, B, interpret: bool = False):
    """Batched SPD solve (no factor output). A (batch, n, n),
    B (batch, n, R) -> X (batch, n, R)."""
    batch, n = A.shape[0], A.shape[1]
    R = B.shape[-1]
    N = -(-n // 8) * 8
    n_pad = (-batch) % TILE

    A_p = jnp.pad(A, ((0, n_pad), (0, N - n), (0, N - n)))
    Np = A_p.shape[0]
    A_t = jnp.transpose(A_p, (1, 2, 0))
    B_t = _pad_batch_last(B, N, n_pad)

    X_t = pl.pallas_call(
        functools.partial(_solve_only_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((N, R, Np), A.dtype),
        grid=(Np // TILE,),
        in_specs=[
            pl.BlockSpec((N, N, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, R, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, R, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(A_t, B_t)

    return jnp.transpose(X_t, (2, 0, 1))[:batch, :n, :]


def _pad_batch_last(x, N, n_pad):
    x = jnp.pad(x, ((0, n_pad), (0, N - x.shape[1]), (0, 0)))
    return jnp.transpose(x, (1, 2, 0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_factor_solve(A, B, interpret: bool = False):
    """Batched SPD factor+solve. A (batch, n, n), B (batch, n, R) ->
    (L (batch, n, n), X (batch, n, R))."""
    batch, n = A.shape[0], A.shape[1]
    R = B.shape[-1]
    N = -(-n // 8) * 8
    n_pad = (-batch) % TILE

    A_p = jnp.pad(A, ((0, n_pad), (0, N - n), (0, N - n)))
    Np = A_p.shape[0]
    A_t = jnp.transpose(A_p, (1, 2, 0))
    B_t = _pad_batch_last(B, N, n_pad)

    L_t, X_t = pl.pallas_call(
        functools.partial(_factor_solve_kernel, n=n),
        out_shape=(jax.ShapeDtypeStruct((N, N, Np), A.dtype),
                   jax.ShapeDtypeStruct((N, R, Np), A.dtype)),
        grid=(Np // TILE,),
        in_specs=[
            pl.BlockSpec((N, N, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, R, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, N, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, R, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(A_t, B_t)

    L = jnp.transpose(L_t, (2, 0, 1))[:batch, :n, :n]
    X = jnp.transpose(X_t, (2, 0, 1))[:batch, :n, :]
    return L, X


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_apply(L, B, interpret: bool = False):
    """Solve with a precomputed factor. L (batch, n, n), B (batch, n, R)."""
    batch, n = L.shape[0], L.shape[1]
    R = B.shape[-1]
    N = -(-n // 8) * 8
    n_pad = (-batch) % TILE

    L_p = jnp.pad(L, ((0, n_pad), (0, N - n), (0, N - n)))
    # unit diagonal on the pad block keeps dead divides finite
    if N > n:
        pad_eye = np.zeros((N, N), L.dtype)
        pad_eye[np.arange(n, N), np.arange(n, N)] = 1.0
        L_p = L_p + jnp.asarray(pad_eye)[None]
    Np = L_p.shape[0]
    L_t = jnp.transpose(L_p, (1, 2, 0))
    B_t = _pad_batch_last(B, N, n_pad)

    X_t = pl.pallas_call(
        functools.partial(_apply_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((N, R, Np), L.dtype),
        grid=(Np // TILE,),
        in_specs=[
            pl.BlockSpec((N, N, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, R, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, R, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(L_t, B_t)

    return jnp.transpose(X_t, (2, 0, 1))[:batch, :n, :]
