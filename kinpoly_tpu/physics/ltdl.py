"""Tree-sparse L^T D L factorization of the joint-space inertia matrix.

The 75-dof kinematic tree gives M the classic branch-induced sparsity:
M[i, j] != 0 only when i and j lie on the same root-to-leaf path. An LDL-style
factorization processed leaf-to-root has **zero fill-in** (MuJoCo's
``mj_factorM`` exploits the same structure), so the factor costs
sum_k depth(k)^2 / 2 ~ 10.7k FMAs instead of the 140k of a dense 75x75
Cholesky — and, unlike XLA's batched Cholesky (~7 GFLOP/s on TPU, the
round-1 bottleneck), every op here is a wide elementwise op over the env
batch, which is exactly what the TPU VPU wants.

Packed representation: row k of M is stored as the length-(depth(k)+1)
vector of its nonzero entries

    R[k, t] = M[k, anc(k)[t]]   for t < depth(k)   (ancestors, root-first)
    R[k, depth(k)] = M[k, k]                        (diagonal)

padded to (nv, Dmax+1). The key structural fact making updates regular:
ancestor chains are nested — ``anc(anc(k)[t]) == anc(k)[:t]`` — so the
position of dof j in *any* descendant's packed row is always ``depth(j)``,
and the rank-1 elimination update from dof k writes a contiguous triangle
of packed slots.

Replaces the reference's dense solves (``uhc/envs/humanoid_im.py:429-430``
scipy cho_factor/cho_solve on mj_fullM, and MuJoCo's internal mj_factorM
inside ``sim.step``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LTDLTopo(NamedTuple):
    """Static (host-side) packing tables derived from the dof tree."""
    anc_idx: np.ndarray      # (nv, Dmax+1) int32: anc_idx[k, :depth[k]] = strict
    #                          ancestors root-first; anc_idx[k, depth[k]] = k;
    #                          slots beyond are padded with k (harmless gathers)
    depth: np.ndarray        # (nv,) int32
    valid: np.ndarray        # (nv, Dmax+1) float mask: slot t <= depth[k]
    diag_onehot: np.ndarray  # (nv, Dmax+1) float: 1 at slot depth[k]
    levels: tuple            # tuple of np.ndarray: dofs per depth, index = depth
    nv: int
    dmax: int


def build_topo(dof_parent: np.ndarray) -> LTDLTopo:
    nv = len(dof_parent)
    anc = []
    for k in range(nv):
        chain = []
        j = int(dof_parent[k])
        while j >= 0:
            chain.append(j)
            j = int(dof_parent[j])
        anc.append(chain[::-1])  # root-first
    depth = np.asarray([len(a) for a in anc], dtype=np.int32)
    dmax = int(depth.max())
    anc_idx = np.full((nv, dmax + 1), 0, dtype=np.int32)
    for k in range(nv):
        anc_idx[k, : depth[k]] = anc[k]
        anc_idx[k, depth[k]:] = k
    valid = (np.arange(dmax + 1)[None, :] <= depth[:, None]).astype(np.float64)
    diag_onehot = (np.arange(dmax + 1)[None, :] == depth[:, None]).astype(np.float64)
    levels = tuple(
        np.asarray([k for k in range(nv) if depth[k] == d], dtype=np.int32)
        for d in range(dmax + 1)
    )
    return LTDLTopo(anc_idx=anc_idx, depth=depth, valid=valid,
                    diag_onehot=diag_onehot, levels=levels, nv=nv, dmax=dmax)


def pack(topo: LTDLTopo, M: jax.Array) -> jax.Array:
    """Dense (..., nv, nv) -> packed (..., nv, Dmax+1). Test/interop helper."""
    idx = jnp.asarray(topo.anc_idx)
    R = jnp.take_along_axis(
        M, jnp.broadcast_to(idx, M.shape[:-2] + idx.shape), axis=-1)
    return R * jnp.asarray(topo.valid, M.dtype)


def unpack(topo: LTDLTopo, R: jax.Array) -> jax.Array:
    """Packed -> dense symmetric (..., nv, nv). Test helper."""
    nv, dp1 = topo.nv, topo.dmax + 1
    out = jnp.zeros(R.shape[:-2] + (nv, nv), R.dtype)
    rows = np.repeat(np.arange(nv), dp1)
    cols = topo.anc_idx.reshape(-1)
    vals = (R * jnp.asarray(topo.valid, R.dtype)).reshape(R.shape[:-2] + (-1,))
    out = out.at[..., rows, cols].add(vals)
    out = out.at[..., np.arange(nv), np.arange(nv)].mul(0.5)
    return out + jnp.swapaxes(out, -1, -2)


def add_diag(topo: LTDLTopo, R: jax.Array, v: jax.Array) -> jax.Array:
    """R + diag(v) in packed form (v broadcastable to (..., nv))."""
    return R + v[..., None] * jnp.asarray(topo.diag_onehot, R.dtype)


def diag_of(topo: LTDLTopo, R: jax.Array) -> jax.Array:
    return jnp.einsum("...kt,kt->...k", R, jnp.asarray(topo.diag_onehot, R.dtype))


DIAG_REG = 1e-6   # relative D floor (f32 modified-LTDL regularization)


def factor(topo: LTDLTopo, R: jax.Array, reg: float = DIAG_REG) -> jax.Array:
    """In-packed-place M = L^T D L: returns Rf where slots < depth hold the
    unit-lower-triangular L's off-diagonals and slot depth holds D.

    Processes depth levels deepest-first; all dofs at equal depth are in
    disjoint subtrees, so their elimination updates commute and are applied
    with one duplicate-accumulating scatter-add per level.

    D pivots are floored at ``reg * max(|M_kk|, 1)`` (Gill-Murray modified
    factorization: the result factors M + E for a small diagonal E). In f32
    the elimination cancels catastrophically for ~0.6% of random extreme
    poses (STATUS round-2), driving D <= 0; MuJoCo's mj_factorM applies the
    same kind of mjMINVAL pivot floor.
    """
    d0 = diag_of(topo, R)                               # original M diagonal
    dmin = reg * jnp.maximum(jnp.abs(d0), 1.0)
    for d in range(topo.dmax, 0, -1):
        K = topo.levels[d]
        if len(K) == 0:
            continue
        rows = R[..., K, : d + 1]                       # (..., m, d+1)
        Dk_c = jnp.maximum(rows[..., d], dmin[..., K])
        Dk = Dk_c[..., None]
        Lk = rows[..., :d] / Dk                         # (..., m, d)
        R = R.at[..., K, :d].set(Lk)
        R = R.at[..., K, d].set(Dk_c)
        # elimination: for each ancestor a_t (depth t), subtract the
        # contiguous packed triangle  Lk[t] * rows[0:t+1]  from R[a_t, 0:t+1]
        tril = jnp.asarray(
            np.tril(np.ones((d, d + 1), dtype=np.float64)), R.dtype)
        upd = Lk[..., :, None] * rows[..., None, :] * tril   # (..., m, d, d+1)
        tgt = topo.anc_idx[K, :d].reshape(-1)                # (m*d,)
        upd = upd.reshape(upd.shape[:-3] + (-1, d + 1))
        R = R.at[..., tgt, : d + 1].add(-upd)
    # floor the pivots elimination never divided by (depth-0 dofs) too, so
    # solve()'s D^-1 pass is safe for every dof
    dvec = diag_of(topo, R)
    fix = jnp.maximum(dvec, dmin) - dvec
    return add_diag(topo, R, fix)


def solve(topo: LTDLTopo, Rf: jax.Array, b: jax.Array) -> jax.Array:
    """Solve M x = b given Rf = factor(R); b (..., nv) or (..., nv, r)."""
    vec = b.ndim == Rf.ndim - 1
    y = b[..., None] if vec else b
    # pass 1: L^T y = b  (descending depth; scatter updates to ancestors)
    for d in range(topo.dmax, 0, -1):
        K = topo.levels[d]
        if len(K) == 0:
            continue
        Lk = Rf[..., K, :d]                              # (..., m, d)
        yk = y[..., K, :]                                # (..., m, r)
        upd = Lk[..., :, :, None] * yk[..., :, None, :]  # (..., m, d, r)
        tgt = topo.anc_idx[K, :d].reshape(-1)
        upd = upd.reshape(upd.shape[:-3] + (-1,) + upd.shape[-1:])
        y = y.at[..., tgt, :].add(-upd)
    # pass 2: z = D^-1 y
    dvec = jnp.einsum("...kt,kt->...k", Rf, jnp.asarray(topo.diag_onehot, Rf.dtype))
    x = y / dvec[..., None]
    # pass 3: L x = z  (ascending depth; gather from finished ancestors)
    for d in range(1, topo.dmax + 1):
        K = topo.levels[d]
        if len(K) == 0:
            continue
        Lk = Rf[..., K, :d]                              # (..., m, d)
        xa = x[..., topo.anc_idx[K, :d], :]              # (..., m, d, r)
        x = x.at[..., K, :].add(-jnp.einsum("...md,...mdr->...mr", Lk, xa))
    return x[..., 0] if vec else x


def factor_solve(topo: LTDLTopo, R: jax.Array, b: jax.Array) -> jax.Array:
    return solve(topo, factor(topo, R), b)


def crba_packed(spec, tables, topo: LTDLTopo, ks, via_dense: bool = True) -> jax.Array:
    """CRBA directly into packed form (the dense (..., 75, 75) M is never
    materialized): R[k, t] = phi_{anc(k)[t]} . (I^C_k phi_k), diagonal slot
    gets + armature. Mirrors ``dynamics.mass_matrix`` == mj_fullM."""
    anc_db = jnp.asarray(tables.anc_dof_body, dtype=ks.phi.dtype)   # (nv, B)
    F = jnp.einsum("jb,...bxy,...jy->...jx", anc_db, ks.ic_world, ks.phi)
    idx = topo.anc_idx
    if via_dense:
        # one MXU matmul + a static gather of the packed slots
        G = jnp.einsum("...jx,...kx->...kj", ks.phi, F)             # G[k, j]
        R = jnp.take_along_axis(
            G, jnp.broadcast_to(jnp.asarray(idx), G.shape[:-2] + idx.shape),
            axis=-1)
    else:
        phi_anc = ks.phi[..., idx, :]                               # (..., nv, D+1, 6)
        R = jnp.einsum("...ktx,...kx->...kt", phi_anc, F)
    arm = jnp.asarray(spec.armature, dtype=R.dtype)
    R = R * jnp.asarray(topo.valid, R.dtype)
    return add_diag(topo, R, arm)
