"""Reward function registry — jnp ports of the reference reward families
(``uhc/core/reward_function.py`` keyed registry :453-461 and
``kin_poly/core/reward_function.py`` :1292-1313).

Every reward is a pure function of a RewardInputs bundle (current/previous
simulated features + expert/target/GT frame features), batched over envs.
The envs build the bundle once per step; the registry picks the formula by
``reward_id`` so config files swap rewards exactly like the reference.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from kinpoly_tpu.core import tmath


class RewardInputs(NamedTuple):
    """Everything the reward families consume. Unused fields may be None."""
    # current simulated state
    bquat: jax.Array          # (..., 96) sim-frame body quats
    wbquat: jax.Array         # (..., 96) world body quats
    wbpos: jax.Array          # (..., 72)
    body_com: jax.Array       # (..., 72)
    com: jax.Array            # (..., 3)
    ee_wpos: jax.Array        # (..., 15)
    bangvel: jax.Array        # (..., 72) fd from prev step
    head_pose: jax.Array      # (..., 7)
    # expert / target frame
    e_bquat: jax.Array = None
    e_wbquat: jax.Array = None
    e_wbpos: jax.Array = None
    e_body_com: jax.Array = None
    e_com: jax.Array = None
    e_ee_wpos: jax.Array = None
    e_bangvel: jax.Array = None
    e_head_pose: jax.Array = None
    # action (for residual-force magnitude terms)
    vf: jax.Array = None
    # weights
    b_diffw: jax.Array = None          # (23,)
    jpos_diffw: jax.Array = None       # (24,)


def _norm(x, ord=2, axis=-1):
    if ord == 1:
        return jnp.sum(jnp.abs(x), axis=axis)
    return jnp.linalg.norm(x, axis=axis)


def multi_quat_norm_v2(nq):
    q = nq.reshape(nq.shape[:-1] + (-1, 4))
    d = jnp.concatenate([jnp.abs(q[..., :1]) - 1.0, q[..., 1:]], axis=-1)
    return jnp.linalg.norm(d, axis=-1)


def world_rfc_implicit(inp: RewardInputs, ws: dict):
    """Default UHC reward (reward_function.py:4-54): weighted exp-kernels of
    body-quat dist, body angular velocity dist, end-effector dist, CoM dist,
    and the residual-force magnitude."""
    w_p, w_v, w_e = ws.get("w_p", 0.6), ws.get("w_v", 0.1), ws.get("w_e", 0.2)
    w_c, w_vf = ws.get("w_c", 0.1), ws.get("w_vf", 0.0)
    k_p, k_v, k_e = ws.get("k_p", 2.0), ws.get("k_v", 0.005), ws.get("k_e", 20.0)
    k_c, k_vf = ws.get("k_c", 1000.0), ws.get("k_vf", 1.0)
    v_ord = ws.get("v_ord", 2)

    pose_diff = tmath.multi_quat_norm(tmath.multi_quat_diff(inp.bquat, inp.e_bquat))
    pose_diff = pose_diff.at[..., 1:].multiply(inp.b_diffw)
    pose_r = jnp.exp(-k_p * jnp.linalg.norm(pose_diff, axis=-1) ** 2)
    vel_r = jnp.exp(-k_v * _norm(inp.bangvel - inp.e_bangvel, v_ord) ** 2)
    ee_r = jnp.exp(-k_e * _norm(inp.ee_wpos - inp.e_ee_wpos) ** 2)
    com_r = jnp.exp(-k_c * _norm(inp.com - inp.e_com) ** 2)
    vf_r = jnp.where(w_vf > 0, jnp.exp(-k_vf * _norm(inp.vf) ** 2), 0.0)
    total = w_p + w_v + w_e + w_c + w_vf
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_c * com_r
              + w_vf * vf_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, com_r, vf_r], axis=-1)


def world_rfc_implicit_v1_mul(inp: RewardInputs, ws: dict):
    """Multiplicative composition of the same terms (:56-103)."""
    _, comps = world_rfc_implicit(inp, dict(ws, w_vf=1.0))
    reward = jnp.prod(comps, axis=-1)
    return reward, comps


def _v2_components(inp: RewardInputs, ws: dict):
    k_p, k_wp = ws.get("k_p", 0.4), ws.get("k_wp", 0.4)
    k_v, k_j, k_c = ws.get("k_v", 0.005), ws.get("k_j", 100.0), ws.get("k_c", 100.0)
    k_vf = ws.get("k_vf", 1.0)
    w = inp.jpos_diffw

    pd = tmath.multi_quat_norm(tmath.multi_quat_diff(inp.bquat, inp.e_bquat)) * w
    pose_r = jnp.exp(-k_p * jnp.mean(pd**2, axis=-1))
    wpd = tmath.multi_quat_norm(tmath.multi_quat_diff(inp.wbquat, inp.e_wbquat)) * w
    wpose_r = jnp.exp(-k_wp * jnp.mean(wpd**2, axis=-1))
    vel_r = jnp.exp(-k_v * jnp.mean((inp.bangvel - inp.e_bangvel) ** 2, axis=-1))

    shape = inp.body_com.shape[:-1] + (24, 3)
    dc = (inp.e_body_com.reshape(shape) - inp.body_com.reshape(shape)) * w[:, None]
    com_r = jnp.exp(-k_c * jnp.mean(jnp.linalg.norm(dc, axis=-1) ** 2, axis=-1))
    dj = (inp.wbpos.reshape(shape) - inp.e_wbpos.reshape(shape)) * w[:, None]
    jpos_r = jnp.exp(-k_j * jnp.mean(jnp.linalg.norm(dj, axis=-1) ** 2, axis=-1))
    vf_r = jnp.exp(-k_vf * _norm(inp.vf) ** 2)
    return jnp.stack([pose_r, wpose_r, com_r, jpos_r, vel_r, vf_r], axis=-1)


def world_rfc_implicit_v2(inp: RewardInputs, ws: dict):
    """Multiplicative variant with world-quat + per-body jpos terms (:301)."""
    comps = _v2_components(inp, ws)
    return jnp.prod(comps, axis=-1), comps


def world_rfc_implicit_v3(inp: RewardInputs, ws: dict):
    """Additive version of v2 (:376)."""
    comps = _v2_components(inp, ws)
    w = jnp.asarray([ws.get("w_p", 0.4), ws.get("w_wp", 0.4), ws.get("w_c", 100.0),
                     ws.get("w_j", 100.0), ws.get("w_v", 0.005), ws.get("w_vf", 1.0)],
                    comps.dtype)
    return jnp.sum(comps * w, axis=-1), comps


def local_rfc_implicit(inp: RewardInputs, ws: dict):
    """Local-frame variant (:172): identical structure with the end-effector
    term evaluated in the root frame (ee_pos features)."""
    return world_rfc_implicit(inp, ws)


UHC_REWARDS: dict[str, Callable] = {
    "world_rfc_implicit": world_rfc_implicit,
    "world_rfc_implicit_v1_mul": world_rfc_implicit_v1_mul,
    "world_rfc_implicit_v2": world_rfc_implicit_v2,
    "world_rfc_implicit_v3": world_rfc_implicit_v3,
    "local_rfc_implicit": local_rfc_implicit,
    "local_rfc_explicit": local_rfc_implicit,
    "world_rfc_explicit": world_rfc_implicit,
}


# ---------------------------------------------------------------------------
# kin-poly rewards (dynamic supervision family); v1 lives in the AR env.
# ---------------------------------------------------------------------------


class ARRewardInputs(NamedTuple):
    head_pose: jax.Array
    tgt_head_pose: jax.Array
    bquat: jax.Array
    wbpos: jax.Array
    tgt_bquat: jax.Array      # AR target
    tgt_wbpos: jax.Array
    gt_bquat: jax.Array       # ground truth
    gt_prev_bquat: jax.Array
    gt_wbpos: jax.Array = None
    gt_bangvel: jax.Array = None
    bangvel: jax.Array = None
    b_diffw: jax.Array = None


def dynamic_supervision_v2(inp: ARRewardInputs, ws: dict, dt: float):
    """Pure imitation + head tracking, no dynamics regulation
    (kin_poly/core/reward_function.py:1000-1050)."""
    w_hp, w_hq = ws.get("w_hp", 1.0), ws.get("w_hq", 1.0)
    w_p, w_v, w_e = ws.get("w_p", 0.6), ws.get("w_v", 0.1), ws.get("w_e", 0.2)
    k_hp, k_hq = ws.get("k_hp", 1.0), ws.get("k_hq", 1.0)
    k_p, k_v, k_e = ws.get("k_p", 2.0), ws.get("k_v", 0.005), ws.get("k_e", 20.0)

    hp_r = jnp.exp(-k_hp * _norm(inp.head_pose[..., :3] - inp.tgt_head_pose[..., :3]) ** 2)
    hq_d = multi_quat_norm_v2(tmath.quat_mul(
        inp.head_pose[..., 3:], tmath.quat_inv(inp.tgt_head_pose[..., 3:]))).mean(-1)
    hq_r = jnp.exp(-k_hq * hq_d**2)

    pd = tmath.multi_quat_norm(tmath.multi_quat_diff(inp.bquat, inp.gt_bquat))
    pd = pd.at[..., 1:].multiply(inp.b_diffw)
    pose_r = jnp.exp(-k_p * jnp.linalg.norm(pd, axis=-1) ** 2)
    vel_r = jnp.exp(-k_v * _norm(inp.bangvel - inp.gt_bangvel) ** 2)
    shape = inp.wbpos.shape[:-1] + (24, 3)
    ee_r = jnp.exp(-k_e * jnp.linalg.norm(
        (inp.wbpos.reshape(shape) - inp.gt_wbpos.reshape(shape)).reshape(shape[:-2] + (-1,)),
        axis=-1) ** 2)
    reward = w_hp * hp_r + w_hq * hq_r + w_p * pose_r + w_v * vel_r + w_e * ee_r
    return reward, jnp.stack([hp_r, hq_r, pose_r, vel_r, ee_r], axis=-1)


def dynamic_supervision_v3(inp: ARRewardInputs, ws: dict, dt: float):
    """Multiplicative variant of v1's head + target-tracking terms (:1052)."""
    k_hp, k_hq = ws.get("k_hp", 1.0), ws.get("k_hq", 1.0)
    k_p, k_jp = ws.get("k_p", 1.0), ws.get("k_jp", 0.1)

    hp_r = jnp.exp(-k_hp * _norm(inp.head_pose[..., :3] - inp.tgt_head_pose[..., :3]) ** 2)
    hq_d = multi_quat_norm_v2(tmath.quat_mul(
        inp.head_pose[..., 3:], tmath.quat_inv(inp.tgt_head_pose[..., 3:]))).mean(-1)
    hq_r = jnp.exp(-k_hq * hq_d**2)
    pq_d = multi_quat_norm_v2(tmath.multi_quat_diff(inp.bquat, inp.tgt_bquat)).mean(-1)
    p_r = jnp.exp(-k_p * pq_d**2)
    shape = inp.wbpos.shape[:-1] + (24, 3)
    pp_d = jnp.linalg.norm(inp.wbpos.reshape(shape) - inp.tgt_wbpos.reshape(shape),
                           axis=-1).mean(-1)
    jp_r = jnp.exp(-k_jp * pp_d**2)
    comps = jnp.stack([hp_r, hq_r, p_r, jp_r], axis=-1)
    return jnp.prod(comps, axis=-1), comps


def constant_reward(inp, ws, dt):
    one = jnp.ones(inp.head_pose.shape[:-1], inp.head_pose.dtype)
    return one, one[..., None]


KIN_POLY_REWARDS: dict[str, Callable] = {
    # dynamic_supervision_v1 is implemented inside HumanoidAREnv (it needs
    # env-local prev-state bookkeeping); registered there.
    "dynamic_supervision_v2": dynamic_supervision_v2,
    "dynamic_supervision_v3": dynamic_supervision_v3,
    "constant": constant_reward,
}


def get_uhc_reward(reward_id: str) -> Callable:
    if reward_id not in UHC_REWARDS:
        raise KeyError(f"unknown UHC reward_id {reward_id!r}; "
                       f"available: {sorted(UHC_REWARDS)}")
    return UHC_REWARDS[reward_id]
