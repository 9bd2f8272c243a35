"""Forward kinematics of the SMPL humanoid — pure jnp, batched.

Matches MuJoCo's kinematics for the reference model exactly:

- free root: ``qpos[:3]`` world position, ``qpos[3:7]`` (normalised) wxyz quat
- each non-root body has three hinges about its local z, y, x axes, anchored
  at the body origin; rotations compose intrinsically z-y-x
  (``humanoid_smpl_neutral_mesh*.xml``; reference FK at
  ``kin_poly/utils/numpy_smpl_humanoid.py:180`` uses
  ``quaternion_from_euler(..., 'rzyx')`` which is the same composition)

The tree loop is a statically unrolled 24-body recursion; everything inside
is batched over arbitrary leading dims, so `vmap`/sharding across thousands of
envs is free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath


class FKResult(NamedTuple):
    xpos: jax.Array     # (..., B, 3) body frame origins (== MuJoCo body_xpos)
    xquat: jax.Array    # (..., B, 4) body orientations (== body_xquat)
    xipos: jax.Array    # (..., B, 3) body CoM in world (== data.xipos)


class DofFrames(NamedTuple):
    """World-frame per-dof joint data for dynamics (== MuJoCo xaxis/xanchor)."""
    axis: jax.Array     # (..., 75, 3) world axis per dof (trans dofs: e_i)
    anchor: jax.Array   # (..., 75, 3) world anchor point per dof


def fk(spec, qpos: jax.Array) -> FKResult:
    """qpos (..., 76) -> world body frames. `spec` is a HumanoidSpec."""
    parents = spec.parents
    body_pos = jnp.asarray(spec.body_pos, dtype=qpos.dtype)
    body_ipos = jnp.asarray(spec.body_ipos, dtype=qpos.dtype)

    root_pos = qpos[..., 0:3]
    root_quat = tmath.quat_norm(qpos[..., 3:7])
    angles = qpos[..., 7:]

    # local joint quaternion per non-root body: Rz(qz) Ry(qy) Rx(qx)
    B = len(spec.body_names)
    a = angles.reshape(angles.shape[:-1] + (B - 1, 3))
    local_q = tmath.quat_from_euler(a[..., 0], a[..., 1], a[..., 2], "rzyx")

    xpos = [root_pos]
    xquat = [root_quat]
    for i in range(1, B):
        p = int(parents[i])
        q = tmath.quat_mul(xquat[p], local_q[..., i - 1, :])
        pos = xpos[p] + tmath.quat_rot_vec(xquat[p], body_pos[i])
        xpos.append(pos)
        xquat.append(q)

    xpos = jnp.stack(xpos, axis=-2)
    xquat = jnp.stack(xquat, axis=-2)
    xipos = xpos + tmath.quat_rot_vec(xquat, body_ipos)
    return FKResult(xpos=xpos, xquat=xquat, xipos=xipos)


def dof_frames(spec, qpos: jax.Array, fk_res: FKResult) -> DofFrames:
    """Per-dof world axes/anchors, matching MuJoCo's sequential-hinge frames:
    the y hinge axis is rotated by the z hinge, the x hinge by z then y.

    Fully vectorised over the 23 hinge bodies (never routes trig through 0-d
    scalars, which lose ~1e-8 of precision on the XLA CPU scalar path)."""
    B = len(spec.body_names)
    parents = np.asarray(spec.parents)
    angles = qpos[..., 7:].reshape(qpos.shape[:-1] + (B - 1, 3))
    dtype = qpos.dtype
    batch = qpos.shape[:-1]

    ex = jnp.asarray([1.0, 0, 0], dtype)
    ey = jnp.asarray([0, 1.0, 0], dtype)
    ez = jnp.asarray([0, 0, 1.0], dtype)

    # free joint: 3 translational dofs (world axes), 3 rotational dofs about
    # the *child-frame* axes (MuJoCo free-joint angular qvel is body-local)
    root_R = tmath.quat_to_mat(tmath.quat_norm(qpos[..., 3:7]))
    root_pos = qpos[..., 0:3]
    root_axes = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3)),
         jnp.swapaxes(root_R, -1, -2)],
        axis=-2,
    )  # (..., 6, 3)
    root_anchor = jnp.broadcast_to(root_pos[..., None, :], batch + (6, 3))

    # hinge dofs, batched over bodies 1..B-1
    def about(angle, e):  # angle (..., B-1), e (3,) -> (..., B-1, 4)
        half = angle[..., None] * 0.5
        return jnp.concatenate([jnp.cos(half), jnp.sin(half) * e], axis=-1)

    qz = about(angles[..., 0], ez)
    qzy = tmath.quat_mul(qz, about(angles[..., 1], ey))
    parent_q = fk_res.xquat[..., parents[1:], :]          # (..., B-1, 4)
    ax_z = tmath.quat_rot_vec(parent_q, ez)
    ax_y = tmath.quat_rot_vec(tmath.quat_mul(parent_q, qz), ey)
    ax_x = tmath.quat_rot_vec(tmath.quat_mul(parent_q, qzy), ex)
    hinge_axes = jnp.stack([ax_z, ax_y, ax_x], axis=-2)   # (..., B-1, 3, 3)
    hinge_axes = hinge_axes.reshape(batch + (3 * (B - 1), 3))
    anchor = fk_res.xpos[..., 1:, :]
    hinge_anchor = jnp.repeat(anchor, 3, axis=-2)

    return DofFrames(
        axis=jnp.concatenate([root_axes, hinge_axes], axis=-2),
        anchor=jnp.concatenate([root_anchor, hinge_anchor], axis=-2),
    )


# ---------------------------------------------------------------------------
# reference-compatible extras (bquat, com, ee positions)
# ---------------------------------------------------------------------------


def body_quat_sim(spec, qpos: jax.Array) -> jax.Array:
    """The reference's `bquat` representation: root quat followed by per-body
    quats from 'sxyz' euler of the (z, y, x) hinge angles
    (``humanoid_im.py:342-354``). Flat (..., 96)."""
    B = len(spec.body_names)
    a = qpos[..., 7:].reshape(qpos.shape[:-1] + (B - 1, 3))
    q = tmath.quat_from_euler(a[..., 0], a[..., 1], a[..., 2], "sxyz")
    root = qpos[..., None, 3:7]
    return jnp.concatenate([root, q], axis=-2).reshape(qpos.shape[:-1] + (4 * B,))


def com(spec, fk_res: FKResult) -> jax.Array:
    """Mass-weighted whole-humanoid CoM (== subtree_com[0] of the object-free
    model used by the UHC env)."""
    w = jnp.asarray(spec.body_mass / spec.body_mass.sum(), dtype=fk_res.xipos.dtype)
    return jnp.sum(fk_res.xipos * w[:, None], axis=-2)


def make_body_index(spec, names: list[str]) -> np.ndarray:
    return np.asarray([spec.body_index(n) for n in names], dtype=np.int32)
