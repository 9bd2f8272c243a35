"""Pallas TPU kernel for the block-PSOR contact solve.

The PGS iteration (`contact.solve_contacts`) is the engine's most
XLA-hostile op: `iters x K` *sequential* 3-row block updates over a small
(C x C) system per env. As plain lax loops every micro-step round-trips the
f vector through HBM-visible buffers and emits hundreds of tiny HLOs; here
the whole iteration runs inside one kernel with A, rhs, Dinv, and f resident
in VMEM, vectorised across a tile of envs (the batch dimension is the lane
axis — every per-contact update is a (TILE,)-wide VPU op).

Layout note: all per-env arrays are kept *batch-last* inside the kernel
((C, TILE), (K, 3, 3, TILE), ...) so the 128-lane axis is the env batch —
the natural TPU mapping for thousands of tiny independent problems.

Used by `engine.substep` when `PhysicsModel.use_pallas_pgs` is set (TPU
only); `contact.solve_contacts` remains the portable reference path, and the
parity test runs this kernel in interpreter mode against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # env batch per grid cell == lane width


def _kernel(A_ref, rhs_ref, Dinv_ref, R_ref, mu_ref, act_ref, f_ref,
            *, n_blocks: int, iters: int):
    C = rhs_ref.shape[0]

    def project(f3, mu):
        # friction-cone projection; f3 (3, T), mu (T,)
        fn = jnp.maximum(f3[0], 0.0)
        tnorm = jnp.sqrt(f3[1] ** 2 + f3[2] ** 2 + 1e-24)
        scale = jnp.minimum(1.0, mu * fn / tnorm)
        return jnp.stack([fn, f3[1] * scale, f3[2] * scale])

    def gs_block(k, _):
        # rows of this contact block; f lives in the (mutable) output ref —
        # Mosaic supports dynamic ref indexing but not dynamic_slice on
        # loop-carried values
        Ak = A_ref[pl.ds(3 * k, 3), :]            # (3, C, T)
        fk = f_ref[pl.ds(3 * k, 3), :]            # (3, T)
        rk = rhs_ref[pl.ds(3 * k, 3), :]          # (3, T)
        Rk = R_ref[pl.ds(3 * k, 3), :]
        # residual: rk - Ak @ f - Rk * fk   (contract over C)
        Af = jnp.sum(Ak * f_ref[:][None, :, :], axis=1)  # (3, T)
        res = rk - Af - Rk * fk
        Dk = Dinv_ref[k]                          # (3, 3, T)
        # explicit contraction: Mosaic can't lower a batched 3x3 dot
        delta = jnp.sum(Dk * res[None, :, :], axis=1)
        fk_new = project(fk + delta, mu_ref[k]) * act_ref[k][None, :]
        f_ref[pl.ds(3 * k, 3), :] = fk_new
        return 0

    def sweep(_, c):
        return jax.lax.fori_loop(0, n_blocks, gs_block, 0)

    f_ref[:] = jnp.zeros((C, rhs_ref.shape[1]), rhs_ref.dtype)
    jax.lax.fori_loop(0, iters, sweep, 0)


@functools.lru_cache(maxsize=None)
def make_vmappable_solver(iters: int):
    """A PSOR solver usable *inside* vmapped env steps: unbatched calls run
    the plain lax iteration; the vmap batching rule routes the whole batch
    into the Pallas kernel (vmapping pallas_call directly would grid one env
    per cell and waste the 128 lanes)."""

    @jax.custom_batching.custom_vmap
    def solve(A, rhs, Dinv, R, mu, active):
        nK = mu.shape[-1]

        def project(f3, mu_k):
            fn = jnp.maximum(f3[0], 0.0)
            tn = jnp.sqrt(f3[1] ** 2 + f3[2] ** 2 + 1e-24)
            s = jnp.minimum(1.0, mu_k * fn / tn)
            return jnp.stack([fn, f3[1] * s, f3[2] * s])

        def gs_block(k, f):
            Ak = jax.lax.dynamic_slice_in_dim(A, 3 * k, 3, axis=0)
            fk = jax.lax.dynamic_slice_in_dim(f, 3 * k, 3)
            rk = jax.lax.dynamic_slice_in_dim(rhs, 3 * k, 3)
            Rk = jax.lax.dynamic_slice_in_dim(R, 3 * k, 3)
            res = rk - Ak @ f - Rk * fk
            Dk = jax.lax.dynamic_index_in_dim(Dinv, k, keepdims=False)
            mu_k = jax.lax.dynamic_index_in_dim(mu, k, keepdims=False)
            a_k = jax.lax.dynamic_index_in_dim(active, k, keepdims=False)
            fk_new = project(fk + Dk @ res, mu_k) * a_k.astype(f.dtype)
            return jax.lax.dynamic_update_slice_in_dim(f, fk_new, 3 * k, axis=0)

        def sweep(_, f):
            return jax.lax.fori_loop(0, nK, gs_block, f)

        return jax.lax.fori_loop(0, iters, sweep, jnp.zeros_like(rhs))

    @solve.def_vmap
    def _batched(axis_size, in_batched, A, rhs, Dinv, R, mu, active):
        # inputs whose values don't depend on batched data (e.g. a constant
        # friction vector from jnp.full) arrive UNBATCHED — broadcast them
        args = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, b in zip((A, rhs, Dinv, R, mu, active), in_batched)]
        return pgs_solve_pallas(*args, iters=iters), True

    return solve


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def pgs_solve_pallas(A, rhs, Dinv, R, mu, active, iters: int = 20,
                     interpret: bool = False):
    """Batched PSOR solve. A (N, C, C), rhs/R (N, C), Dinv (N, K, 3, 3),
    mu/active (N, K) -> f (N, C). N is padded to a TILE multiple."""
    N, C = rhs.shape
    K = mu.shape[-1]
    n_pad = (-N) % TILE
    if n_pad:
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)], axis=0)
        A, rhs, Dinv, R = pad(A), pad(rhs), pad(Dinv), pad(R)
        mu, active = pad(mu), pad(active)
    Np = rhs.shape[0]
    grid = Np // TILE

    # batch-last layouts
    A_t = jnp.transpose(A, (1, 2, 0))        # (C, C, Np)
    rhs_t = jnp.transpose(rhs, (1, 0))       # (C, Np)
    Dinv_t = jnp.transpose(Dinv, (1, 2, 3, 0))  # (K, 3, 3, Np)
    R_t = jnp.transpose(R, (1, 0))
    mu_t = jnp.transpose(mu, (1, 0))
    act_t = jnp.transpose(active.astype(rhs.dtype), (1, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, n_blocks=K, iters=iters),
        out_shape=jax.ShapeDtypeStruct((C, Np), rhs.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((C, C, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 3, 3, TILE), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A_t, rhs_t, Dinv_t, R_t, mu_t, act_t)

    f = jnp.transpose(out, (1, 0))
    return f[:N]
