"""SMPL pose <-> MuJoCo qpos conversion, jnp-native.

Port of the semantics of ``uhc/smpllib/smpl_mujoco.py:215-277``:
72-d SMPL axis-angle (24 joints, canonical SMPL kintree order) + root
translation -> 76-d qpos (trans, root wxyz quat, 69 intrinsic-ZYX euler
angles in MuJoCo depth-first body order), and back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath

# canonical SMPL joint order (uhc/smpllib/smpl_parser.py:10)
SMPL_JOINT_NAMES = [
    "Pelvis", "L_Hip", "R_Hip", "Torso", "L_Knee", "R_Knee", "Spine",
    "L_Ankle", "R_Ankle", "Chest", "L_Toe", "R_Toe", "Neck",
    "L_Thorax", "R_Thorax", "Head", "L_Shoulder", "R_Shoulder",
    "L_Elbow", "R_Elbow", "L_Wrist", "R_Wrist", "L_Hand", "R_Hand",
]

DEFAULT_ROOT_Z = 0.91437225  # standing root height (smpl_mujoco.py:222)


def smpl_to_mujoco_index(spec) -> np.ndarray:
    """Index map m: mujoco_joints[i] = smpl_joints[m[i]]."""
    return np.asarray([SMPL_JOINT_NAMES.index(n) for n in spec.body_names], np.int32)


def smpl_to_qpose(spec, pose_aa: jax.Array, trans: jax.Array | None = None) -> jax.Array:
    """pose_aa (..., 72) SMPL axis-angle + trans (..., 3) -> qpos (..., 76)."""
    batch = pose_aa.shape[:-1]
    if trans is None:
        trans = jnp.zeros(batch + (3,), pose_aa.dtype)
        trans = trans.at[..., 2].set(DEFAULT_ROOT_Z)

    aa = pose_aa.reshape(batch + (24, 3))
    quat = tmath.quat_from_expmap(aa)
    # intrinsic ZYX euler per joint (scipy "ZYX" == transformations 'rzyx')
    euler = tmath.euler_from_quat(quat, "rzyx")
    m = smpl_to_mujoco_index(spec)
    euler_mj = euler[..., m, :]
    root_quat = quat[..., m[0], :]
    body = euler_mj[..., 1:, :].reshape(batch + (69,))
    return jnp.concatenate([trans, root_quat, body], axis=-1)


def qpose_to_smpl(spec, qpos: jax.Array) -> tuple[jax.Array, jax.Array]:
    """qpos (..., 76) -> (pose_aa (..., 72), trans (..., 3))."""
    batch = qpos.shape[:-1]
    trans = qpos[..., :3]
    euler_mj = qpos[..., 7:].reshape(batch + (23, 3))
    quat_mj = tmath.quat_from_euler(
        euler_mj[..., 0], euler_mj[..., 1], euler_mj[..., 2], "rzyx"
    )
    quat_mj = jnp.concatenate([qpos[..., None, 3:7], quat_mj], axis=-2)  # (..., 24, 4)
    m = smpl_to_mujoco_index(spec)
    inv = np.zeros_like(m)
    inv[m] = np.arange(len(m))
    quat_smpl = quat_mj[..., inv, :]
    aa = tmath.rotation_from_quat_shortest(quat_smpl)
    return aa.reshape(batch + (72,)), trans
