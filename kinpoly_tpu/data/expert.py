"""Expert clip preprocessing — the TPU-native ``get_expert``.

The reference replays each mocap qpos sequence through a live MuJoCo sim to
cache kinematic features (``uhc/utils/tools.py:20-85``). Here the same
features come from one batched FK over the whole clip — no simulator, no
Python loop over frames.

Clips are stored as fixed-shape pytrees so a bank of clips can live on-device
and be indexed per-env inside jitted rollouts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath
from kinpoly_tpu.physics import fk as fklib

EE_NAMES = ["L_Toe", "R_Toe", "L_Wrist", "R_Wrist", "Head"]


class ExpertClip(NamedTuple):
    """Per-frame expert features (leading dim T, or (N, T) for a bank)."""
    qpos: jax.Array         # (T, 76)
    qvel: jax.Array         # (T, 75) finite-diff, clipped +-10
    wbpos: jax.Array        # (T, 72) world body positions (24 x 3)
    wbquat: jax.Array       # (T, 96) world body quats
    bquat: jax.Array        # (T, 96) local 'sim-frame' body quats
    ee_wpos: jax.Array      # (T, 15) end-effector world positions
    ee_pos: jax.Array       # (T, 15) end-effectors in root frame
    com: jax.Array          # (T, 3)  whole-body CoM
    body_com: jax.Array     # (T, 72) per-body CoM
    head_pose: jax.Array    # (T, 7)  head pos + quat
    rq_rmh: jax.Array       # (T, 4)  de-headed root quat
    rlinv: jax.Array        # (T, 3)  root linear velocity (world)
    rlinv_local: jax.Array  # (T, 3)  root linear velocity (root frame)
    rangv: jax.Array        # (T, 3)  root angular velocity
    bangvel: jax.Array      # (T, 72) body angular velocity (finite diff)
    length: jax.Array       # ()      scalar int32: true length (<= T)
    height_lb: jax.Array    # ()      min root height
    head_height_lb: jax.Array  # ()   min head height


def ee_world(spec, fk_res: fklib.FKResult, ee_idx: np.ndarray) -> jax.Array:
    pos = fk_res.xpos[..., ee_idx, :]
    return pos.reshape(pos.shape[:-2] + (len(ee_idx) * 3,))


def ee_in_root(spec, fk_res: fklib.FKResult, qpos: jax.Array, ee_idx: np.ndarray,
               coord: str = "root") -> jax.Array:
    pos = fk_res.xpos[..., ee_idx, :] - qpos[..., None, 0:3]
    pos = tmath.transform_vec(pos, qpos[..., None, 3:7], coord)
    return pos.reshape(pos.shape[:-2] + (len(ee_idx) * 3,))


def from_qpos(spec, qpos_seq: np.ndarray | jax.Array, dt: float,
              obs_coord: str = "root", pad_to: int | None = None) -> ExpertClip:
    """qpos sequence (T, 76) -> ExpertClip (optionally zero-padded to pad_to
    frames with the last frame replicated, keeping shapes static)."""
    qpos = jnp.asarray(qpos_seq)
    T = qpos.shape[0]
    ee_idx = fklib.make_body_index(spec, EE_NAMES)
    head = spec.body_index("Head")

    res = fklib.fk(spec, qpos)
    wbpos = res.xpos.reshape(T, -1)
    wbquat = res.xquat.reshape(T, -1)
    bquat = fklib.body_quat_sim(spec, qpos)
    com = fklib.com(spec, res)
    body_com = res.xipos.reshape(T, -1)
    head_pose = jnp.concatenate([res.xpos[:, head], res.xquat[:, head]], axis=-1)
    rq_rmh = tmath.de_heading(qpos[:, 3:7])

    qvel = tmath.qvel_fd(qpos[:-1], qpos[1:], dt)
    qvel = jnp.clip(qvel, -10.0, 10.0)
    qvel = jnp.concatenate([qvel[:1], qvel], axis=0)
    rlinv = qvel[:, :3]
    rlinv_local = tmath.transform_vec(qvel[:, :3], qpos[:, 3:7], obs_coord)
    rangv = qvel[:, 3:6]

    bangvel = tmath.angvel_fd(bquat[:-1], bquat[1:], dt)
    bangvel = jnp.concatenate([bangvel[:1], bangvel], axis=0)

    clip = ExpertClip(
        qpos=qpos, qvel=qvel, wbpos=wbpos, wbquat=wbquat, bquat=bquat,
        ee_wpos=ee_world(spec, res, ee_idx),
        ee_pos=ee_in_root(spec, res, qpos, ee_idx, obs_coord),
        com=com, body_com=body_com, head_pose=head_pose, rq_rmh=rq_rmh,
        rlinv=rlinv, rlinv_local=rlinv_local, rangv=rangv, bangvel=bangvel,
        length=jnp.asarray(T, jnp.int32),
        height_lb=qpos[:, 2].min(),
        head_height_lb=head_pose[:, 2].min(),
    )
    if pad_to is not None and pad_to > T:
        clip = jax.tree.map(
            lambda x: (jnp.concatenate([x, jnp.repeat(x[-1:], pad_to - T, axis=0)])
                       if x.ndim > 0 else x),
            clip,
        )
    return clip


def stack_bank(clips: list[ExpertClip]) -> ExpertClip:
    """Stack equally-padded clips into a bank with leading clip dim."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *clips)


def index_clip(bank: ExpertClip, i: jax.Array) -> ExpertClip:
    """Select clip i (dynamic) from a bank — usable inside jit."""
    return jax.tree.map(lambda x: x[i], bank)


def frame(clip: ExpertClip, t: jax.Array) -> ExpertClip:
    """Gather frame t (clamped to true length - 1, reference
    ``get_expert_index`` non-cyclic semantics) from every per-frame field;
    scalar fields pass through.

    NOTE: when the clip came out of `index_clip(bank, i)` with a traced `i`
    inside vmap, use `bank_frame` instead — XLA:TPU miscompiles the chained
    dynamic gathers (x[i][t]) when the bank axis has size 1."""
    idx = jnp.minimum(t, clip.length - 1)
    return jax.tree.map(lambda x: x[idx] if x.ndim > 0 else x, clip)


def bank_frame(bank: ExpertClip, clip_idx: jax.Array, t: jax.Array) -> ExpertClip:
    """Fused two-level gather bank[i, min(t, len_i - 1)].

    A single advanced-index gather per field. The obvious
    ``frame(index_clip(bank, i), t)`` chains two dynamic gathers, which an
    XLA:TPU bug corrupts under vmap when the clip axis has size 1 (verified
    empirically on v5e; x[i, t] lowers to one gather and is correct)."""
    idx = jnp.minimum(t, bank.length[clip_idx] - 1)
    return jax.tree.map(
        lambda x: x[clip_idx, idx] if x.ndim >= 2 else x[clip_idx], bank)
