"""SMPL body model (linear blend skinning) in jnp — the smplx-layer
equivalent of the reference's ``uhc/smpllib/smpl_parser.py:24`` (SMPL_Parser
wrapping the smplx package).

Neither smplx nor the (licensed) SMPL model archives ship with this image or
the reference snapshot, so this module implements the full model math —
shape blendshapes, pose blendshapes, joint regression, and LBS — directly,
batched over poses on the accelerator. `load_smpl_model` reads a standard
SMPL .npz/.pkl archive when the user provides one; the unit tests exercise
the math on a synthetic model.

Conventions match SMPL: 24 joints (SMPL_BONE_NAMES order), axis-angle pose
(24*3,), betas (10,), translation applied to the root.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath

SMPL_BONE_NAMES = [
    "Pelvis", "L_Hip", "R_Hip", "Torso", "L_Knee", "R_Knee", "Spine",
    "L_Ankle", "R_Ankle", "Chest", "L_Toe", "R_Toe", "Neck", "L_Thorax",
    "R_Thorax", "Head", "L_Shoulder", "R_Shoulder", "L_Elbow", "R_Elbow",
    "L_Wrist", "R_Wrist", "L_Hand", "R_Hand",
]

SMPL_PARENTS = np.asarray(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
     18, 19, 20, 21], dtype=np.int32)


class SMPLModel(NamedTuple):
    v_template: np.ndarray    # (V, 3)
    shapedirs: np.ndarray     # (V, 3, n_betas)
    posedirs: np.ndarray      # (V, 3, 207) pose blendshapes (9*(24-1))
    J_regressor: np.ndarray   # (24, V)
    weights: np.ndarray       # (V, 24) LBS weights
    parents: np.ndarray       # (24,)
    faces: np.ndarray = None  # (F, 3)


def load_smpl_model(path: str) -> SMPLModel:
    """Read a standard SMPL model archive (.npz, or .pkl without chumpy
    objects). Raises FileNotFoundError/ValueError with guidance otherwise."""
    import os
    import pickle

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"SMPL model archive not found: {path}. Download the SMPL "
            f"neutral model (SMPL_NEUTRAL.pkl / .npz) from the SMPL "
            f"website (licensed; not redistributable with this repo).")
    if path.endswith(".npz"):
        d = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="latin1")

    def arr(x):
        if hasattr(x, "toarray"):  # scipy sparse J_regressor
            x = x.toarray()
        return np.asarray(x, np.float64)

    sd = arr(d["shapedirs"])
    return SMPLModel(
        v_template=arr(d["v_template"]),
        shapedirs=sd[..., :10],
        posedirs=arr(d["posedirs"]),
        J_regressor=arr(d["J_regressor"]),
        weights=arr(d["weights"]),
        parents=np.asarray(d.get("kintree_table", [SMPL_PARENTS, None])[0],
                           np.int32) if "kintree_table" in d else SMPL_PARENTS,
        faces=np.asarray(d["f"], np.int32) if "f" in d else None,
    )


def shaped_vertices(model: SMPLModel, betas: jax.Array) -> jax.Array:
    """v_template + shape blendshapes (..., V, 3)."""
    vt = jnp.asarray(model.v_template, betas.dtype)
    sd = jnp.asarray(model.shapedirs, betas.dtype)
    return vt + jnp.einsum("vxb,...b->...vx", sd, betas)


def joint_positions(model: SMPLModel, betas: jax.Array) -> jax.Array:
    """Rest-pose joints from the regressor (..., 24, 3)
    (SMPL_Parser.get_joints equivalent)."""
    v = shaped_vertices(model, betas)
    Jr = jnp.asarray(model.J_regressor, betas.dtype)
    return jnp.einsum("jv,...vx->...jx", Jr, v)


def _aa_to_mat(aa: jax.Array) -> jax.Array:
    return tmath.quat_to_mat(tmath.quat_from_expmap(aa))


def lbs(model: SMPLModel, betas: jax.Array, pose_aa: jax.Array,
        trans: jax.Array | None = None, with_pose_blend: bool = True):
    """Full SMPL forward: (betas (..., 10), pose (..., 72)[, trans (..., 3)])
    -> (vertices (..., V, 3), joints (..., 24, 3)).

    Matches the smplx SMPL layer semantics the reference calls through
    SMPL_Parser: shape blendshapes -> joint regression -> pose blendshapes
    (rotation-matrix residuals of the 23 non-root joints) -> rigid kinematic
    chain -> linear blend skinning."""
    dtype = pose_aa.dtype
    P = model.parents
    v_shaped = shaped_vertices(model, betas)                 # (..., V, 3)
    J = joint_positions(model, betas)                        # (..., 24, 3)

    R = _aa_to_mat(pose_aa.reshape(pose_aa.shape[:-1] + (24, 3)))

    if with_pose_blend:
        eye = jnp.eye(3, dtype=dtype)
        pose_feat = (R[..., 1:, :, :] - eye).reshape(
            pose_aa.shape[:-1] + (207,))
        pd = jnp.asarray(model.posedirs, dtype)
        if pd.shape[-1] == 207:
            v_shaped = v_shaped + jnp.einsum("vxp,...p->...vx", pd, pose_feat)

    # forward kinematics over the SMPL chain (parents precede children)
    Rw = [R[..., 0, :, :]]
    tw = [J[..., 0, :]]
    for j in range(1, 24):
        p = int(P[j])
        Rw.append(Rw[p] @ R[..., j, :, :])
        tw.append(tw[p] + jnp.einsum(
            "...xy,...y->...x", Rw[p], J[..., j, :] - J[..., p, :]))
    Rw = jnp.stack(Rw, axis=-3)                              # (..., 24, 3, 3)
    tw = jnp.stack(tw, axis=-2)                              # (..., 24, 3)

    # skinning transforms relative to the rest pose
    t_rel = tw - jnp.einsum("...jxy,...jy->...jx", Rw, J)
    W = jnp.asarray(model.weights, dtype)                    # (V, 24)
    Rv = jnp.einsum("vj,...jxy->...vxy", W, Rw)
    tv = jnp.einsum("vj,...jx->...vx", W, t_rel)
    verts = jnp.einsum("...vxy,...vy->...vx", Rv, v_shaped) + tv
    joints = tw
    if trans is not None:
        verts = verts + trans[..., None, :]
        joints = joints + trans[..., None, :]
    return verts, joints


def synthetic_model(rng: np.random.RandomState, V: int = 64) -> SMPLModel:
    """A tiny random-but-consistent SMPL-structured model for tests."""
    vt = rng.randn(V, 3) * 0.3
    Jr = np.abs(rng.rand(24, V))
    Jr /= Jr.sum(axis=1, keepdims=True)
    W = np.abs(rng.rand(V, 24)) ** 4
    W /= W.sum(axis=1, keepdims=True)
    return SMPLModel(
        v_template=vt,
        shapedirs=rng.randn(V, 3, 10) * 0.01,
        posedirs=rng.randn(V, 3, 207) * 0.001,
        J_regressor=Jr,
        weights=W,
        parents=SMPL_PARENTS,
    )
