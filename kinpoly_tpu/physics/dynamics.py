"""Articulated rigid-body dynamics for the SMPL humanoid — pure jnp, batched.

World-frame spatial (Plücker) algebra anchored at the world origin, over the
75-dof tree (free root = 3 translational + 3 rotational dofs, then 23 bodies x
3 sequential hinges). Replaces the reference's calls into the MuJoCo C engine
(``mj_fullM`` at ``uhc/envs/humanoid_im.py:423``, ``data.qfrc_bias`` at
``:426``) with a vectorised CRBA / RNEA whose inner products are plain batched
matmuls — exactly what XLA maps onto the TPU MXU.

Spatial conventions: motion vector v = (ω, v₀) where v₀ is the velocity of
the body-fixed point instantaneously at the world origin; force vector
f = (n₀, f). Spatial inertia of a body with mass m, CoM c (world), rotational
inertia about the CoM I_c (world axes):

    I₀ = [[I_c − m ĉĉ,  m ĉ],
          [−m ĉ,        m·1]]

Free-joint convention (MuJoCo): linear qvel in world frame, angular qvel in
the *body-local* frame, so the three rotational dof axes are the world-frame
columns of the root rotation matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath
from kinpoly_tpu.physics import fk as fklib


def _skew(v: jax.Array) -> jax.Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def cross_motion(v: jax.Array, u: jax.Array) -> jax.Array:
    """Spatial motion cross product v ×ₘ u for 6-vectors (ω, v₀)."""
    w, v0 = v[..., :3], v[..., 3:]
    uw, uv = u[..., :3], u[..., 3:]
    return jnp.concatenate([jnp.cross(w, uw), jnp.cross(w, uv) + jnp.cross(v0, uw)], axis=-1)


def cross_force(v: jax.Array, g: jax.Array) -> jax.Array:
    """Spatial force cross product v ×*𝒇 g for (n₀, f)."""
    w, v0 = v[..., :3], v[..., 3:]
    n, f = g[..., :3], g[..., 3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(v0, f), jnp.cross(w, f)], axis=-1)


class DynamicsTables(NamedTuple):
    """Static (host-side) index tables derived from the spec once."""
    dof_body: np.ndarray        # (75,) physical body index per dof
    dof_parent: np.ndarray      # (75,) parent dof in the dof tree (-1 for dof 0..?)
    anc_dof_body: np.ndarray    # (75, B) 1.0 if dof j is an ancestor of body b
    anc_dof_dof: np.ndarray     # (75, 75) 1.0 if dof i ancestor-or-self of dof j
    body_order: np.ndarray      # (B,) topological order (parents first)


def build_tables(spec) -> DynamicsTables:
    B = len(spec.body_names)
    nv = 6 + 3 * (B - 1)
    dof_body = np.zeros(nv, dtype=np.int32)
    dof_parent = np.full(nv, -1, dtype=np.int32)
    # free joint: dofs 0-5 on body 0; MuJoCo dof tree: trans dofs then rot dofs
    dof_body[:6] = 0
    for k in range(1, 6):
        dof_parent[k] = k - 1
    last_dof_of_body = {0: 5}
    for i in range(1, B):
        p = int(spec.parents[i])
        d0 = 6 + 3 * (i - 1)
        dof_body[d0:d0 + 3] = i
        dof_parent[d0] = last_dof_of_body[p]
        dof_parent[d0 + 1] = d0
        dof_parent[d0 + 2] = d0 + 1
        last_dof_of_body[i] = d0 + 2

    anc_dof_dof = np.zeros((nv, nv))
    for j in range(nv):
        k = j
        while k >= 0:
            anc_dof_dof[k, j] = 1.0
            k = dof_parent[k]

    anc_dof_body = np.zeros((nv, B))
    for b in range(B):
        j = last_dof_of_body[b]
        while j >= 0:
            anc_dof_body[j, b] = 1.0
            j = dof_parent[j]

    order = []
    seen = set()

    def visit(i):
        if int(spec.parents[i]) >= 0 and int(spec.parents[i]) not in seen:
            visit(int(spec.parents[i]))
        if i not in seen:
            seen.add(i)
            order.append(i)

    for i in range(B):
        visit(i)

    return DynamicsTables(
        dof_body=dof_body,
        dof_parent=dof_parent,
        anc_dof_body=anc_dof_body,
        anc_dof_dof=anc_dof_dof,
        body_order=np.asarray(order, dtype=np.int32),
    )


class KinState(NamedTuple):
    """Everything position-dependent that dynamics needs, computed once per
    substep from qpos."""
    fk_res: fklib.FKResult
    phi: jax.Array        # (..., 75, 6) per-dof motion subspace in world/origin coords
    ic_world: jax.Array   # (..., B, 6, 6) per-body spatial inertia at origin


def kin_state(spec, tables: DynamicsTables, qpos: jax.Array) -> KinState:
    res = fklib.fk(spec, qpos)
    df = fklib.dof_frames(spec, qpos, res)

    # motion subspaces: translational dofs 0-2 -> (0, e); rotational -> (a, p×a)
    is_trans = jnp.zeros((df.axis.shape[-2], 1), dtype=qpos.dtype).at[:3, 0].set(1.0)
    omega = df.axis * (1.0 - is_trans)
    v0 = jnp.cross(df.anchor, df.axis) * (1.0 - is_trans) + df.axis * is_trans
    phi = jnp.concatenate([omega, v0], axis=-1)

    # spatial inertia per body at world origin
    mass = jnp.asarray(spec.body_mass, dtype=qpos.dtype)
    I_local = jnp.asarray(spec.body_inertia, dtype=qpos.dtype)
    R = tmath.quat_to_mat(res.xquat)                        # (..., B, 3, 3)
    I_c = R @ I_local @ jnp.swapaxes(R, -1, -2)
    chat = _skew(res.xipos)
    m = mass[:, None, None]
    top_left = I_c - m * (chat @ chat)
    top_right = m * chat
    bottom_left = -m * chat
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=qpos.dtype), chat.shape)
    bottom_right = m * eye3
    ic = jnp.concatenate(
        [
            jnp.concatenate([top_left, top_right], axis=-1),
            jnp.concatenate([bottom_left, bottom_right], axis=-1),
        ],
        axis=-2,
    )
    return KinState(fk_res=res, phi=phi, ic_world=ic)


def mass_matrix(spec, tables: DynamicsTables, ks: KinState) -> jax.Array:
    """CRBA: full (..., 75, 75) joint-space inertia matrix (== mj_fullM) with
    armature on the diagonal."""
    anc_db = jnp.asarray(tables.anc_dof_body, dtype=ks.phi.dtype)      # (75, B)
    anc_dd = jnp.asarray(tables.anc_dof_dof, dtype=ks.phi.dtype)       # (75, 75)

    # composite inertia seen by dof j: sum of body inertias in j's subtree
    # F_j = (sum_b anc_db[j, b] I_b) phi_j  computed as einsum over bodies
    F = jnp.einsum("jb,...bxy,...jy->...jx", anc_db, ks.ic_world, ks.phi)
    G = jnp.einsum("...ix,...jx->...ij", ks.phi, F)
    M = jnp.where(anc_dd > 0, G, jnp.swapaxes(G, -1, -2))
    M = M * jnp.maximum(anc_dd, anc_dd.T)
    arm = jnp.asarray(spec.armature, dtype=ks.phi.dtype)
    return M + jnp.eye(M.shape[-1], dtype=M.dtype) * arm


def bias_force(spec, tables: DynamicsTables, ks: KinState, qvel: jax.Array,
               gravity: float = -9.81) -> jax.Array:
    """RNEA with qacc = 0: returns qfrc_bias (Coriolis + centrifugal +
    gravity), same sign convention as MuJoCo (M qacc = tau - qfrc_bias)."""
    nv = ks.phi.shape[-2]
    anc_db = jnp.asarray(tables.anc_dof_body, dtype=ks.phi.dtype)
    dof_parent = tables.dof_parent

    phi_qd = ks.phi * qvel[..., None]

    # velocity of each dof's virtual body: prefix sum over dof-tree ancestors
    anc_dd = jnp.asarray(tables.anc_dof_dof, dtype=ks.phi.dtype)  # anc[i, j]: i anc of j
    v_dof = jnp.einsum("ij,...ix->...jx", anc_dd, phi_qd)

    # bias acceleration per dof: zeta_j = v_j x_m (phi_j qd_j); accumulate down.
    # Each dof's axis is fixed in the frame *preceding* it (prefix velocity;
    # the own-dof term cancels since phi x_m phi = 0) — EXCEPT the free
    # joint's rotational dofs, whose axes are the child-body frame axes and
    # therefore move with the full root velocity (MuJoCo mj_comVel does the
    # same special-casing when building cdofdot).
    zeta = cross_motion(v_dof, phi_qd)
    v_root_full = v_dof[..., 5:6, :]
    zeta = zeta.at[..., 3:6, :].set(cross_motion(v_root_full, phi_qd[..., 3:6, :]))
    a_dof = jnp.einsum("ij,...ix->...jx", anc_dd, zeta)

    # gravity trick: base acceleration -g ẑ
    g_acc = jnp.zeros_like(a_dof).at[..., :, 5].set(-gravity)
    a_dof = a_dof + g_acc

    # per physical body: velocity/acceleration = that of its last dof
    B = len(spec.body_names)
    last_dof = np.asarray([5] + [6 + 3 * (i - 1) + 2 for i in range(1, B)], dtype=np.int32)
    v_body = v_dof[..., last_dof, :]
    a_body = a_dof[..., last_dof, :]

    f_body = jnp.einsum("...bxy,...by->...bx", ks.ic_world, a_body) + cross_force(
        v_body, jnp.einsum("...bxy,...by->...bx", ks.ic_world, v_body)
    )

    # C_j = phi_j . sum_{b in subtree(j)} f_b
    return jnp.einsum("...jx,jb,...bx->...j", ks.phi, anc_db, f_body)


def chol_solve(M: jax.Array, rhs: jax.Array) -> jax.Array:
    """Batched SPD solve via Cholesky; rhs (..., n) or (..., n, k)."""
    L = jnp.linalg.cholesky(M)
    vec = rhs.ndim == M.ndim - 1
    b = rhs[..., None] if vec else rhs
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)
    return x[..., 0] if vec else x
