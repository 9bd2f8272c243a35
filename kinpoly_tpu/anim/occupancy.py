"""Voxel body-occupancy maps vs object geoms — port of
``kin_poly/utils/torch_humanoid.py:get_body_occup_map`` (the legacy
scene-awareness feature of the SpaceNet VAE pipeline).

For each selected body, a local voxel grid (edge `map_length`, `voxel_num`^3
cells) centered on the body and aligned to the body's heading frame is
tested for intersection with the object's primitive geoms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath
from kinpoly_tpu.physics import fk as fklib


def base_grid(map_length: float = 0.6, voxel_num: int = 32):
    x = np.linspace(-map_length / 2, map_length / 2, voxel_num)
    X, Y, Z = np.meshgrid(x, x, x, indexing="xy")
    return np.stack([X, Y, Z], axis=-1).reshape(-1, 3)   # (V^3, 3)


def body_occupancy(spec, scene, qpos: jax.Array, obj_qpos: jax.Array,
                   body_idx: np.ndarray, obj_index: int,
                   map_length: float = 0.6, voxel_num: int = 16) -> jax.Array:
    """(..., 76) qpos + (..., n_obj, 7) object poses -> boolean occupancy
    (..., n_bodies, V, V, V) for the geoms of object `obj_index`."""
    grid = jnp.asarray(base_grid(map_length, voxel_num), qpos.dtype)
    res = fklib.fk(spec, qpos)
    bpos = res.xpos[..., body_idx, :]                     # (..., B, 3)
    bq = res.xquat[..., body_idx, :]
    hq = tmath.heading_q(bq)

    # grid points in world: heading-aligned, body-centered
    pts = bpos[..., None, :] + tmath.quat_rot_vec(hq[..., None, :], grid)

    mask_g = np.asarray(scene.obj) == obj_index
    occ = None
    for gi in np.nonzero(mask_g)[0]:
        gp = jnp.asarray(scene.pos[gi], qpos.dtype)
        gq = jnp.asarray(scene.quat[gi], qpos.dtype)
        size = jnp.asarray(scene.size[gi], qpos.dtype)
        op = obj_qpos[..., obj_index, :3]
        oq = obj_qpos[..., obj_index, 3:7]
        wq = tmath.quat_mul(oq, gq)
        wp = op + tmath.quat_rot_vec(oq, gp)
        local = tmath.quat_rot_vec_inv(wq[..., None, None, :],
                                       pts - wp[..., None, None, :])
        if scene.gtype[gi] == 0:
            inside = jnp.all(jnp.abs(local) < size, axis=-1)
        else:
            inside = (jnp.linalg.norm(local[..., :2], axis=-1) < size[0]) & \
                     (jnp.abs(local[..., 2]) < size[1])
        occ = inside if occ is None else (occ | inside)

    B = len(body_idx)
    return occ.reshape(occ.shape[:-1] + (voxel_num, voxel_num, voxel_num)) \
        if occ is not None else jnp.zeros(
            qpos.shape[:-1] + (B, voxel_num, voxel_num, voxel_num), bool)
