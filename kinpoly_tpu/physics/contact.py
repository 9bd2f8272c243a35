"""Soft contact + joint-limit constraints, MuJoCo-style, batched in jnp.

MuJoCo's CPU solver builds a constraint system per step with dynamic sparsity;
that shape-shifting is hostile to XLA, so we restructure it TPU-first:

- candidate contact points are *static*: a precomputed set of body-frame
  vertices per humanoid body (extreme points of each mesh) tested against the
  floor plane and (optionally) object primitives each substep;
- the K deepest candidates are gathered into a fixed-size constraint block
  (top-k selection keeps shapes static; inactive rows are disabled through
  the complementarity clamp);
- forces solve a MuJoCo-style soft-constraint problem
  (impedance d(r) from solimp, reference acceleration from solref) with a
  fixed-iteration projected Gauss-Seidel in contact space
  A = J M^-1 J^T + R.

The defaults reproduce the reference scene: solref=(0.02, 1),
solimp=(0.9, 0.95, 0.001), friction (1, .1, .1) on the floor
(`humanoid_smpl_neutral_mesh_all.xml:14,48`), pyramidal cone condim 3.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath

# MuJoCo defaults (XML does not override them)
SOLREF = (0.02, 1.0)
SOLIMP = (0.9, 0.95, 0.001)


class ContactSet(NamedTuple):
    """Fixed-size batch of candidate contacts (already top-k selected)."""
    pos: jax.Array       # (..., K, 3) world contact position
    normal: jax.Array    # (..., K, 3) world normal (points from geom2 into geom1 space; here: up out of the surface)
    depth: jax.Array     # (..., K) penetration depth (>0 means penetrating), includes margin
    body: jax.Array      # (..., K) humanoid body index the point belongs to (int32)
    friction: jax.Array  # (..., K) tangential friction coefficient
    active: jax.Array    # (..., K) bool


def select_contact_vertices(spec, per_body: dict[str, int] | None = None,
                            default_k: int = 6) -> tuple[np.ndarray, np.ndarray]:
    """Precompute candidate contact vertices (host-side, once).

    For each body we pick extreme vertices of its mesh: support points along a
    set of directions biased to the body-local axes. Feet/toes get more points
    since they carry the ground contact. Returns (verts (N, 3), body_id (N,)).
    """
    per_body = per_body or {}
    dirs = []
    # 6 axis directions + 8 diagonal corners
    for s in (1.0, -1.0):
        dirs += [np.array([s, 0, 0]), np.array([0, s, 0]), np.array([0, 0, s])]
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            for sz in (1.0, -1.0):
                dirs.append(np.array([sx, sy, sz]) / np.sqrt(3))
    dirs = np.stack(dirs)

    verts_out, body_out = [], []
    for i, name in enumerate(spec.body_names):
        k = per_body.get(name, default_k)
        v = spec.mesh_verts[i]
        score = v @ dirs.T                      # (V, D)
        idx = np.unique(np.argmax(score, axis=0))
        if len(idx) > k:
            # farthest point downsample
            chosen = [int(idx[np.argmin(v[idx, 2])])]  # start from lowest point
            rest = [j for j in idx if j != chosen[0]]
            while len(chosen) < k and rest:
                dmin = np.array([min(np.linalg.norm(v[j] - v[c]) for c in chosen) for j in rest])
                pick = int(np.argmax(dmin))
                chosen.append(rest.pop(pick))
            idx = np.asarray(chosen)
        verts_out.append(v[idx])
        body_out.append(np.full(len(idx), i, dtype=np.int32))
    return np.concatenate(verts_out), np.concatenate(body_out)


FOOT_BODIES = {"L_Ankle": 10, "R_Ankle": 10, "L_Toe": 10, "R_Toe": 10}


def floor_contacts(spec, cand_verts: jax.Array, cand_body: np.ndarray,
                   xpos: jax.Array, xquat: jax.Array, k_top: int,
                   margin: float = 0.001, friction: float = 1.0) -> ContactSet:
    """Candidate verts vs floor plane z=0; returns the K deepest as a fixed
    block. `cand_verts` (N, 3) body-local, `cand_body` (N,) static."""
    bq = xquat[..., cand_body, :]
    bp = xpos[..., cand_body, :]
    world = bp + tmath.quat_rot_vec(bq, cand_verts)
    # contact "distance" in MuJoCo terms: gap = z; include margin
    depth = margin - world[..., 2]                      # >0 -> active constraint
    val, idx = jax.lax.top_k(depth, k_top)
    pos = jnp.take_along_axis(world, idx[..., None], axis=-2)
    normal = jnp.zeros_like(pos).at[..., 2].set(1.0)
    body = jnp.asarray(cand_body)[idx]
    return ContactSet(
        pos=pos,
        normal=normal,
        depth=val,
        body=body,
        friction=jnp.full(val.shape, friction, dtype=val.dtype),
        active=val > 0.0,
    )


def contact_jacobian(cs: ContactSet, phi: jax.Array, anc_dof_body: np.ndarray) -> jax.Array:
    """Rows (normal, t1, t2) x K of the contact Jacobian J (..., 3K, nv).

    Velocity of the contact point on body b: v_p = omega x (p - origin...) —
    with world-origin Plücker coords, v_p = v0 + omega x p, i.e.
    J_row = n . (phi_v0 + phi_omega x p) per dof, masked by dof-ancestry.
    """
    anc = jnp.asarray(anc_dof_body, dtype=phi.dtype)     # (nv, B)
    mask = anc.T[cs.body]                                # (..., K, nv)

    omega, v0 = phi[..., :3], phi[..., 3:]               # (..., nv, 3)
    # point velocity contribution per dof: v0 + omega x p
    p = cs.pos[..., None, :]                             # (..., K, 1, 3)
    vel = v0[..., None, :, :] + jnp.cross(omega[..., None, :, :], jnp.broadcast_to(p, omega[..., None, :, :].shape[:-2] + (omega.shape[-2], 3)))
    # (..., K, nv, 3)

    n = cs.normal
    # tangent frame
    ref = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                    jnp.broadcast_to(jnp.asarray([0.0, 0, 1], n.dtype), n.shape),
                    jnp.broadcast_to(jnp.asarray([1.0, 0, 0], n.dtype), n.shape))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True).clip(1e-9)
    t2 = jnp.cross(n, t1)

    jn = jnp.einsum("...kvx,...kx->...kv", vel, n) * mask
    jt1 = jnp.einsum("...kvx,...kx->...kv", vel, t1) * mask
    jt2 = jnp.einsum("...kvx,...kx->...kv", vel, t2) * mask
    # layout: (..., K, 3, nv) -> (..., 3K, nv)
    J = jnp.stack([jn, jt1, jt2], axis=-2)
    return J.reshape(J.shape[:-3] + (J.shape[-3] * 3, J.shape[-1]))


def impedance(depth: jax.Array, solimp=SOLIMP) -> jax.Array:
    """MuJoCo solimp impedance d(r): sigmoid from d0 to dmax over `width`."""
    d0, dmax, width = solimp
    x = jnp.clip(jnp.abs(depth) / width, 0.0, 1.0)
    # MuJoCo default midpoint 0.5, power 2: standard smooth sigmoid
    y = jnp.where(x < 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) * (1.0 - x))
    return d0 + y * (dmax - d0)


def solve_contacts(M_solve, J: jax.Array, qacc_smooth: jax.Array,
                   qvel: jax.Array, depth: jax.Array, active: jax.Array,
                   friction: jax.Array, dt: float,
                   solref=SOLREF, solimp=SOLIMP, iters: int = 30):
    """Projected Gauss-Seidel on contact-space forces.

    M_solve: callable rhs (..., nv[, k]) -> M^-1 rhs
    J: (..., 3K, nv); depth/active/friction: (..., K)
    Returns qfrc_constraint (..., nv).
    """
    nK = depth.shape[-1]

    MiJt = M_solve(jnp.swapaxes(J, -1, -2))              # (..., nv, 3K)
    A = J @ MiJt                                         # (..., 3K, 3K)

    d = impedance(depth, solimp) * active
    timeconst, dampratio = solref
    b_coef = 2.0 / (SOLIMP[1] * timeconst)
    k_coef = d / (SOLIMP[1] * SOLIMP[1] * timeconst * timeconst * dampratio * dampratio)

    vel_c = jnp.einsum("...cv,...v->...c", J, qvel)      # (..., 3K)
    vel3 = vel_c.reshape(vel_c.shape[:-1] + (nK, 3))
    # reference acceleration along each row (normal row gets position term)
    aref_n = -b_coef * vel3[..., 0] - k_coef * (-depth)  # depth>0 = penetration -> push out
    aref_t = -b_coef * vel3[..., 1:] * 0.0               # tangential: pure friction, no spring
    aref = jnp.concatenate([aref_n[..., None], aref_t], axis=-1).reshape(vel_c.shape)

    # residual: we want J qacc ~ aref => A f = aref - J qacc_smooth
    rhs = aref - jnp.einsum("...cv,...v->...c", J, qacc_smooth)

    diagA = jnp.diagonal(A, axis1=-2, axis2=-1)
    d_rows = jnp.repeat(d, 3, axis=-1)
    R = (1.0 - d_rows) / jnp.maximum(d_rows, 1e-6) * jnp.maximum(diagA, 1e-8)
    R = jnp.where(jnp.repeat(active, 3, axis=-1), R, 1e8)   # kill inactive rows
    A_reg = A + jnp.zeros_like(A).at[..., jnp.arange(R.shape[-1]), jnp.arange(R.shape[-1])].set(0.0)

    inv_diag = 1.0 / (diagA + R)

    mu = friction

    def body(_, f):
        # one Jacobi-style sweep (batched; Jacobi is TPU-friendlier than
        # strict Gauss-Seidel and converges fine with 30 iterations @ 450 Hz)
        resid = rhs - jnp.einsum("...ij,...j->...i", A, f) - R * f
        f_new = f + 0.7 * inv_diag * resid
        f3 = f_new.reshape(f_new.shape[:-1] + (nK, 3))
        fn = jnp.maximum(f3[..., 0], 0.0)
        ft = f3[..., 1:]
        ft_norm = jnp.linalg.norm(ft, axis=-1, keepdims=True).clip(1e-12)
        scale = jnp.minimum(1.0, (mu * fn)[..., None] / ft_norm)
        f3 = jnp.concatenate([fn[..., None], ft * scale], axis=-1)
        f3 = f3 * active[..., None]
        return f3.reshape(f_new.shape)

    f0 = jnp.zeros_like(rhs)
    f = jax.lax.fori_loop(0, iters, body, f0)
    return jnp.einsum("...cv,...c->...v", J, f)
