"""Pallas TPU kernels for the tree-sparse LTDL factor/solve (physics/ltdl.py).

The XLA level-scheduled implementation spends its time in many small
gather/scatter fusions; here the whole factorization is straight-line code
over VMEM-resident packed rows with the env batch on the lane axis — every
elimination update is one (chain_len, TILE)-shaped VPU op at a static VMEM
address (the sparsity pattern is compile-time constant).

Layouts are batch-last inside the kernels ((nv, D+1, TILE) packed rows,
(nv, R, TILE) right-hand sides); the `make_vmappable_*` wrappers present
per-env (batch-leading under vmap) semantics to the engine like
pallas_pgs.make_vmappable_solver does: unbatched traces fall back to the
portable jnp path, the vmap rule routes the full batch into the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kinpoly_tpu.physics import ltdl

# grid blocks are double-buffered across grid steps, so the VMEM budget is
# 2 * (sum of in+out block bytes) <= 16 MB
FACTOR_TILE = 128
SOLVE_TILE = 128
RHS_CHUNK = 32   # right-hand sides per grid step (second grid dim)


def _anc_lists(topo):
    return [[int(a) for a in topo.anc_idx[k, : topo.depth[k]]]
            for k in range(topo.nv)]


def _factor_kernel(topo, R_ref, out_ref):
    anc = _anc_lists(topo)
    out_ref[:] = R_ref[:]
    for d in range(topo.dmax, 0, -1):
        for k in topo.levels[d]:
            k = int(k)
            # pivot floor reg*max(|M_kk|,1) — same modified-LTDL
            # regularization as ltdl.factor (f32 cancellation guard); also
            # keeps zero pad lanes finite (0 -> reg, no inf*0 NaNs)
            dmin = ltdl.DIAG_REG * jnp.maximum(jnp.abs(R_ref[k, d, :]), 1.0)
            Dk = jnp.maximum(out_ref[k, d, :], dmin)    # (T,)
            out_ref[k, d, :] = Dk
            inv = 1.0 / Dk
            out_ref[k, 0:d, :] = out_ref[k, 0:d, :] * inv[None, :]
            for t in range(d):
                a = anc[k][t]
                coef = (out_ref[k, t, :] * Dk)[None, :]  # D_k L_t
                out_ref[a, 0:t + 1, :] = (
                    out_ref[a, 0:t + 1, :] - coef * out_ref[k, 0:t + 1, :])
    # floor the never-divided (depth-0) pivots for the solve's D^-1 pass
    for k in topo.levels[0]:
        k = int(k)
        dmin = ltdl.DIAG_REG * jnp.maximum(jnp.abs(R_ref[k, 0, :]), 1.0)
        out_ref[k, 0, :] = jnp.maximum(out_ref[k, 0, :], dmin)


def _solve_kernel(topo, Rf_ref, B_ref, X_ref):
    anc = _anc_lists(topo)
    X_ref[:] = B_ref[:]
    # pass 1: L^T y = b (descending depth; X[k] final when processed)
    for d in range(topo.dmax, 0, -1):
        for k in topo.levels[d]:
            k = int(k)
            xk = X_ref[k, :, :]                         # (R, T)
            for t in range(d):
                a = anc[k][t]
                X_ref[a, :, :] = X_ref[a, :, :] - Rf_ref[k, t, :][None, :] * xk
    # pass 2: D^-1
    for k in range(topo.nv):
        inv = 1.0 / Rf_ref[k, int(topo.depth[k]), :]
        X_ref[k, :, :] = X_ref[k, :, :] * inv[None, :]
    # pass 3: L x = z (ascending depth; ancestors final)
    for d in range(1, topo.dmax + 1):
        for k in topo.levels[d]:
            k = int(k)
            acc = Rf_ref[k, 0, :][None, :] * X_ref[int(anc[k][0]), :, :]
            for t in range(1, d):
                acc = acc + Rf_ref[k, t, :][None, :] * X_ref[int(anc[k][t]), :, :]
            X_ref[k, :, :] = X_ref[k, :, :] - acc


def _pad_batch(x, tile):
    n = x.shape[-1]
    p = (-n) % tile
    if p:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (p,), x.dtype)], axis=-1)
    return x, n


def ltdl_factor_pallas(topo, Rt: jax.Array, interpret: bool = False):
    """Rt (nv, D+1, N) batch-last packed mass matrix -> factored, same shape."""
    nv, dp1, _ = Rt.shape
    Rt, n = _pad_batch(Rt, FACTOR_TILE)
    grid = Rt.shape[-1] // FACTOR_TILE
    out = pl.pallas_call(
        functools.partial(_factor_kernel, topo),
        out_shape=jax.ShapeDtypeStruct(Rt.shape, Rt.dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec((nv, dp1, FACTOR_TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nv, dp1, FACTOR_TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Rt)
    return out[..., :n]


def ltdl_solve_pallas(topo, Rf_t: jax.Array, B_t: jax.Array,
                      interpret: bool = False):
    """Rf_t (nv, D+1, N), B_t (nv, R, N) -> X (nv, R, N). The RHS axis is
    chunked into a second grid dimension to stay inside the VMEM budget."""
    nv, dp1, _ = Rf_t.shape
    R = B_t.shape[1]
    Rf_t, n = _pad_batch(Rf_t, SOLVE_TILE)
    B_t, _ = _pad_batch(B_t, SOLVE_TILE)
    rc = min(RHS_CHUNK, R)
    r_pad = (-R) % rc
    if r_pad:
        B_t = jnp.concatenate(
            [B_t, jnp.zeros((nv, r_pad, B_t.shape[-1]), B_t.dtype)], axis=1)
    Rp = B_t.shape[1]
    grid = (Rf_t.shape[-1] // SOLVE_TILE, Rp // rc)
    out = pl.pallas_call(
        functools.partial(_solve_kernel, topo),
        out_shape=jax.ShapeDtypeStruct(B_t.shape, B_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nv, dp1, SOLVE_TILE), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, rc, SOLVE_TILE), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nv, rc, SOLVE_TILE), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Rf_t, B_t)
    return out[:, :R, :n]


# ---------------------------------------------------------------------------
# vmap-aware wrappers (engine substeps are traced per-env and vmapped)
# ---------------------------------------------------------------------------


def make_vmappable_factor(topo):
    @jax.custom_batching.custom_vmap
    def factor(R):
        return ltdl.factor(topo, R)

    @factor.def_vmap
    def _batched(axis_size, in_batched, R):
        if not in_batched[0]:
            R = jnp.broadcast_to(R, (axis_size,) + R.shape)
        Rt = jnp.moveaxis(R, 0, -1)             # (nv, D+1, N)
        out = ltdl_factor_pallas(topo, Rt)
        return jnp.moveaxis(out, -1, 0), True

    return factor


def make_vmappable_solve(topo):
    @jax.custom_batching.custom_vmap
    def solve(Rf, B):
        return ltdl.solve(topo, Rf, B)

    @solve.def_vmap
    def _batched(axis_size, in_batched, Rf, B):
        bcast = lambda x, b: x if b else jnp.broadcast_to(
            x, (axis_size,) + x.shape)
        Rf = bcast(Rf, in_batched[0])
        B = bcast(B, in_batched[1])
        Rt = jnp.moveaxis(Rf, 0, -1)
        Bt = jnp.moveaxis(B, 0, -1)
        out = ltdl_solve_pallas(topo, Rt, Bt)
        return jnp.moveaxis(out, -1, 0), True

    return solve
