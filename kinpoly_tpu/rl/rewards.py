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
    # explicit-RFC action split (local/world *_explicit rewards)
    vf_cp: jax.Array = None            # (..., n_vb, 3) contact points
    vf_force: jax.Array = None         # (..., n_vb, 3[+3]) forces (+torques)
    # local-frame features (local_rfc_* rewards, reward_function.py:172-299)
    qpos: jax.Array = None             # (..., 76) current
    rq_rmh: jax.Array = None           # (..., 4) de-headed root quat
    rlinv: jax.Array = None            # (..., 3) fd root lin vel, world frame
    rlinv_local: jax.Array = None      # (..., 3) fd root lin vel, root frame
    rangv: jax.Array = None            # (..., 3) fd root ang vel
    ee_pos: jax.Array = None           # (..., 15) end-effectors in root frame
    e_qpos: jax.Array = None
    e_rq_rmh: jax.Array = None
    e_rlinv: jax.Array = None
    e_rlinv_local: jax.Array = None
    e_rangv: jax.Array = None
    e_ee_pos: jax.Array = None
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


def _explicit_vf_rewards(inp: RewardInputs, k_vf, k_cp):
    """Shared explicit-RFC regularizers (reward_function.py:283-296):
    vf = sum ||force_i||^2, cp = sum ||contact_point_i||^2."""
    vf_loss = jnp.sum(inp.vf_force**2, axis=(-2, -1))
    cp_loss = jnp.sum(inp.vf_cp**2, axis=(-2, -1))
    return jnp.exp(-k_vf * vf_loss), jnp.exp(-k_cp * cp_loss)


def world_rfc_explicit(inp: RewardInputs, ws: dict):
    """world_rfc_implicit terms + explicit vf/cp regularizers
    (uhc/core/reward_function.py:105-170)."""
    w_p, w_v, w_e = ws.get("w_p", 0.6), ws.get("w_v", 0.1), ws.get("w_e", 0.2)
    w_c, w_vf, w_cp = ws.get("w_c", 0.1), ws.get("w_vf", 0.0), ws.get("w_cp", 0.0)
    k_vf, k_cp = ws.get("k_vf", 1.0), ws.get("k_cp", 1.0)
    _, comps = world_rfc_implicit(inp, dict(ws, w_vf=0.0))
    pose_r, vel_r, ee_r, com_r = (comps[..., 0], comps[..., 1],
                                  comps[..., 2], comps[..., 3])
    vf_r, cp_r = _explicit_vf_rewards(inp, k_vf, k_cp)
    total = w_p + w_v + w_e + w_c + w_vf + w_cp
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_c * com_r
              + w_vf * vf_r + w_cp * cp_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, com_r, vf_r, cp_r], axis=-1)


def _local_base(inp: RewardInputs, ws: dict):
    """The five shared terms of the local_rfc_* family
    (uhc/core/reward_function.py:172-231): non-root pose quats, non-root
    body angular velocity, root-frame end effectors, root height +
    de-headed root quat, and fd root velocities."""
    k_p, k_v, k_e = ws.get("k_p", 2.0), ws.get("k_v", 0.005), ws.get("k_e", 20.0)
    k_rh, k_rq = ws.get("k_rh", 300.0), ws.get("k_rq", 300.0)
    k_rl, k_ra = ws.get("k_rl", 5.0), ws.get("k_ra", 0.5)
    v_ord = ws.get("v_ord", 2)

    # pose: ignore the root quat (cur_bquat[4:])
    pd = tmath.multi_quat_norm(
        tmath.multi_quat_diff(inp.bquat[..., 4:], inp.e_bquat[..., 4:]))
    pd = pd * inp.b_diffw
    pose_r = jnp.exp(-k_p * jnp.linalg.norm(pd, axis=-1) ** 2)

    vel_r = jnp.exp(-k_v * _norm(
        inp.bangvel[..., 3:] - inp.e_bangvel[..., 3:], v_ord) ** 2)

    ee_r = jnp.exp(-k_e * _norm(inp.ee_pos - inp.e_ee_pos) ** 2)

    rh_d = inp.qpos[..., 2] - inp.e_qpos[..., 2]
    rq_d = tmath.multi_quat_norm(
        tmath.multi_quat_diff(inp.rq_rmh, inp.e_rq_rmh))[..., 0]
    root_pose_r = jnp.exp(-k_rh * rh_d**2 - k_rq * rq_d**2)

    rl_d = _norm(inp.rlinv_local - inp.e_rlinv_local)
    ra_d = _norm(inp.rangv - inp.e_rangv)
    root_vel_r = jnp.exp(-k_rl * rl_d**2 - k_ra * ra_d**2)
    return pose_r, vel_r, ee_r, root_pose_r, root_vel_r


def local_rfc_implicit(inp: RewardInputs, ws: dict):
    """uhc/core/reward_function.py:172-231."""
    w_p, w_v, w_e = ws.get("w_p", 0.5), ws.get("w_v", 0.0), ws.get("w_e", 0.2)
    w_rp, w_rv, w_vf = ws.get("w_rp", 0.1), ws.get("w_rv", 0.1), ws.get("w_vf", 0.1)
    k_vf = ws.get("k_vf", 1.0)
    pose_r, vel_r, ee_r, root_pose_r, root_vel_r = _local_base(inp, ws)
    vf_r = jnp.where(w_vf > 0, jnp.exp(-k_vf * _norm(inp.vf) ** 2), 0.0)
    total = w_p + w_v + w_e + w_rp + w_rv + w_vf
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_rp * root_pose_r
              + w_rv * root_vel_r + w_vf * vf_r) / total
    return reward, jnp.stack(
        [pose_r, vel_r, ee_r, root_pose_r, root_vel_r, vf_r], axis=-1)


def local_rfc_explicit(inp: RewardInputs, ws: dict):
    """uhc/core/reward_function.py:234-299."""
    w_p, w_v, w_e = ws.get("w_p", 0.4), ws.get("w_v", 0.0), ws.get("w_e", 0.2)
    w_rp, w_rv = ws.get("w_rp", 0.1), ws.get("w_rv", 0.1)
    w_vf, w_cp = ws.get("w_vf", 0.1), ws.get("w_cp", 0.1)
    k_vf, k_cp = ws.get("k_vf", 20.0), ws.get("k_cp", 10.0)
    pose_r, vel_r, ee_r, root_pose_r, root_vel_r = _local_base(inp, ws)
    vf_r, cp_r = _explicit_vf_rewards(inp, k_vf, k_cp)
    total = w_p + w_v + w_e + w_rp + w_rv + w_vf + w_cp
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_rp * root_pose_r
              + w_rv * root_vel_r + w_vf * vf_r + w_cp * cp_r) / total
    return reward, jnp.stack(
        [pose_r, vel_r, ee_r, root_pose_r, root_vel_r, vf_r, cp_r], axis=-1)


UHC_REWARDS: dict[str, Callable] = {
    "world_rfc_implicit": world_rfc_implicit,
    "world_rfc_implicit_v1_mul": world_rfc_implicit_v1_mul,
    "world_rfc_implicit_v2": world_rfc_implicit_v2,
    "world_rfc_implicit_v3": world_rfc_implicit_v3,
    "world_rfc_explicit": world_rfc_explicit,
    "local_rfc_implicit": local_rfc_implicit,
    "local_rfc_explicit": local_rfc_explicit,
}


# ---------------------------------------------------------------------------
# kin-poly rewards (dynamic supervision family); v1 lives in the AR env.
# ---------------------------------------------------------------------------


class ARRewardInputs(NamedTuple):
    head_pose: jax.Array
    tgt_head_pose: jax.Array
    bquat: jax.Array
    wbpos: jax.Array
    tgt_bquat: jax.Array      # AR target (this step's integrated action)
    tgt_wbpos: jax.Array
    gt_bquat: jax.Array       # ground truth
    gt_prev_bquat: jax.Array
    gt_wbpos: jax.Array = None
    gt_bangvel: jax.Array = None
    bangvel: jax.Array = None
    b_diffw: jax.Array = None
    # ARNet-rollout action supervision (v3/v6: reward_function.py:1090-1110)
    tgt_qpos: jax.Array = None       # env.target['qpos'] (integrated action)
    ar_qpos: jax.Array = None        # ar_context['ar_qpos'][ind]
    ar_bquat: jax.Array = None       # ar_context['ar_bquat'][ind]
    ar_prev_bquat: jax.Array = None  # ar_context['ar_bquat'][ind-1]
    prev_bquat: jax.Array = None     # simulated prev step


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


def _head_target_terms(inp: ARRewardInputs, ws: dict):
    """hp/hq/p/jp — shared by v3-v6 (reward_function.py:1065-1088)."""
    k_hp, k_hq = ws.get("k_hp", 1.0), ws.get("k_hq", 1.0)
    k_p, k_jp = ws.get("k_p", 1.0), ws.get("k_jp", 0.1)
    hp_r = jnp.exp(-k_hp * _norm(
        inp.head_pose[..., :3] - inp.tgt_head_pose[..., :3]) ** 2)
    hq_d = multi_quat_norm_v2(tmath.multi_quat_diff(
        inp.head_pose[..., 3:], inp.tgt_head_pose[..., 3:])).mean(-1)
    hq_r = jnp.exp(-k_hq * hq_d**2)
    pq_d = multi_quat_norm_v2(
        tmath.multi_quat_diff(inp.bquat, inp.tgt_bquat)).mean(-1)
    p_r = jnp.exp(-k_p * pq_d**2)
    shape = inp.wbpos.shape[:-1] + (24, 3)
    pp_d = jnp.linalg.norm(
        inp.wbpos.reshape(shape) - inp.tgt_wbpos.reshape(shape), axis=-1).mean(-1)
    jp_r = jnp.exp(-k_jp * pp_d**2)
    return hp_r, hq_r, p_r, jp_r


def dynamic_supervision_v3(inp: ARRewardInputs, ws: dict, dt: float):
    """V2 multiplicative + ARNet action supervision (:1052-1120): the
    integrated action (target qpos/bquat) is pulled toward the precomputed
    AR rollout (rp/rq/act_p terms)."""
    k_rp, k_rq = ws.get("k_rp", 0.1), ws.get("k_rq", 0.1)
    k_act_p = ws.get("k_act_p", 0.1)
    hp_r, hq_r, p_r, jp_r = _head_target_terms(inp, ws)
    rp_d = _norm(inp.ar_qpos[..., :3] - inp.tgt_qpos[..., :3])
    rq_d = multi_quat_norm_v2(tmath.multi_quat_diff(
        inp.ar_qpos[..., 3:7], inp.tgt_qpos[..., 3:7])).mean(-1)
    act_p_d = multi_quat_norm_v2(
        tmath.multi_quat_diff(inp.ar_bquat, inp.tgt_bquat)).mean(-1)
    rp_r = jnp.exp(-k_rp * rp_d**2)
    rq_r = jnp.exp(-k_rq * rq_d**2)
    act_p_r = jnp.exp(-k_act_p * act_p_d)   # note: not squared (:1111)
    reward = hp_r * hq_r * p_r * jp_r * rp_r * rq_r * act_p_r
    return reward, jnp.stack(
        [hp_r, hq_r, p_r, jp_r, rp_r, rq_r, act_p_r], axis=-1)


def dynamic_supervision_v4(inp: ARRewardInputs, ws: dict, dt: float):
    """V4: no action-regularization terms (:1123-1174); additive."""
    w_hp, w_hq = ws.get("w_hp", 1.0), ws.get("w_hq", 1.0)
    w_hv, w_p, w_jp = ws.get("w_hv", 0.05), ws.get("w_p", 1.0), ws.get("w_jp", 1.0)
    hp_r, hq_r, p_r, jp_r = _head_target_terms(inp, ws)
    hv_r = jnp.zeros_like(hp_r)   # head-velocity term disabled in reference
    reward = (w_hp * hp_r + w_hq * hq_r + w_hv * hv_r
              + w_p * p_r + w_jp * jp_r)
    return reward, jnp.stack([hp_r, hq_r, hv_r, p_r, jp_r], axis=-1)


def dynamic_supervision_v5(inp: ARRewardInputs, ws: dict, dt: float):
    """V5 = V4 multiplicative (:1176-1228)."""
    hp_r, hq_r, p_r, jp_r = _head_target_terms(inp, ws)
    reward = hp_r * hq_r * p_r * jp_r
    return reward, jnp.stack([hp_r, hq_r, p_r, jp_r], axis=-1)


def dynamic_supervision_v6(inp: ARRewardInputs, ws: dict, dt: float):
    """V6: head + target tracking + angular velocity vs the AR rollout
    (:1230-1285); additive."""
    w_hp, w_hq = ws.get("w_hp", 1.0), ws.get("w_hq", 1.0)
    w_p, w_jp, w_act_v = ws.get("w_p", 1.0), ws.get("w_jp", 1.0), ws.get("w_act_v", 1.0)
    k_act_v = ws.get("k_act_v", 0.1)
    v_ord = ws.get("v_ord", 2)
    hp_r, hq_r, p_r, jp_r = _head_target_terms(inp, ws)
    cur_bangvel = tmath.angvel_fd(inp.prev_bquat, inp.bquat, dt)
    tgt_bangvel = tmath.angvel_fd(inp.ar_prev_bquat, inp.ar_bquat, dt)
    act_v_r = jnp.exp(-k_act_v * _norm(cur_bangvel - tgt_bangvel, v_ord) ** 2)
    reward = (w_hp * hp_r + w_hq * hq_r + w_p * p_r + w_jp * jp_r
              + w_act_v * act_v_r)
    return reward, jnp.stack([hp_r, hq_r, p_r, jp_r, act_v_r], axis=-1)




# ---------------------------------------------------------------------------
# legacy kin-poly imitation rewards (kin_poly/core/reward_function.py:5-739).
# Retired experiments in the reference, ported for registry completeness;
# they consume the same RewardInputs the UHC env builds. The local_world_*
# family's cyclic-expert re-heading (expert['rel_heading']/'start_pos'/
# 'sim_pos', :428-432) is the identity here: this rebuild aligns experts to
# the sim at reset, so rel_heading == unit and sim_pos == start_pos.
# ---------------------------------------------------------------------------


def _exp(k, d):
    return jnp.exp(-k * d ** 2)


def _root_composite(inp, ws):
    """w_rq*|rq_rmh diff| + w_rlinv*|rlinv_local diff| + w_rangv*|rangv diff|
    -> exp kernel (quat_space_reward_v2:51-55)."""
    w_rq, w_rlinv = ws.get("w_rq", 2.0), ws.get("w_rlinv", 1.0)
    w_rangv, k_r = ws.get("w_rangv", 0.1), ws.get("k_r", 1.0)
    rq_dist = tmath.multi_quat_norm(
        tmath.multi_quat_diff(inp.rq_rmh, inp.e_rq_rmh))[..., 0]
    rlinv_dist = _norm(inp.rlinv_local - inp.e_rlinv_local)
    rangv_dist = _norm(inp.rangv - inp.e_rangv)
    return _exp(k_r, w_rq * rq_dist + w_rlinv * rlinv_dist + w_rangv * rangv_dist)


def _pose_nonroot(inp, ws, k_p, weighted=True, norm_v2=False):
    """exp kernel over non-root body-quat distance (cur_bquat[4:])."""
    mqn = multi_quat_norm_v2 if norm_v2 else tmath.multi_quat_norm
    pd = mqn(tmath.multi_quat_diff(inp.bquat[..., 4:], inp.e_bquat[..., 4:]))
    if weighted:
        pd = pd * inp.b_diffw
    return _exp(k_p, jnp.linalg.norm(pd, axis=-1))


def quat_space_reward_v2(inp: RewardInputs, ws: dict):
    """(:5-62) pose/vel/ee in obs_coord + com-z + composite root kernel."""
    w_p, w_v, w_e = ws.get("w_p", 0.5), ws.get("w_v", 0.05), ws.get("w_e", 0.15)
    w_c, w_r = ws.get("w_c", 0.1), ws.get("w_r", 0.2)
    k_p, k_v, k_e, k_c = (ws.get("k_p", 2.0), ws.get("k_v", 0.005),
                          ws.get("k_e", 20.0), ws.get("k_c", 1000.0))
    v_ord = ws.get("v_ord", 2)
    pose_r = _pose_nonroot(inp, ws, k_p)
    vel_r = _exp(k_v, _norm(inp.bangvel[..., 3:] - inp.e_bangvel[..., 3:], v_ord))
    ee_r = _exp(k_e, _norm(inp.ee_pos - inp.e_ee_pos))
    com_r = _exp(k_c, inp.com[..., 2] - inp.e_com[..., 2])
    root_r = _root_composite(inp, ws)
    total = w_p + w_v + w_e + w_c + w_r
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_c * com_r
              + w_r * root_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, com_r, root_r], axis=-1)


def quat_space_reward_v3(inp: RewardInputs, ws: dict):
    """(:63-120) pose/vel/ee + fused root-pose and root-vel kernels."""
    w_p, w_v, w_e = ws.get("w_p", 0.5), ws.get("w_v", 0.1), ws.get("w_e", 0.2)
    w_rp, w_rv = ws.get("w_rp", 0.1), ws.get("w_rv", 0.1)
    k_p, k_v, k_e = ws.get("k_p", 2.0), ws.get("k_v", 0.005), ws.get("k_e", 20.0)
    k_rh, k_rq = ws.get("k_rh", 300.0), ws.get("k_rq", 300.0)
    k_rl, k_ra = ws.get("k_rl", 5.0), ws.get("k_ra", 0.5)
    v_ord = ws.get("v_ord", 2)
    pose_r = _pose_nonroot(inp, ws, k_p)
    vel_r = _exp(k_v, _norm(inp.bangvel[..., 3:] - inp.e_bangvel[..., 3:], v_ord))
    ee_r = _exp(k_e, _norm(inp.ee_pos - inp.e_ee_pos))
    rh_dist = inp.qpos[..., 2] - inp.e_qpos[..., 2]
    rq_dist = tmath.multi_quat_norm(
        tmath.multi_quat_diff(inp.rq_rmh, inp.e_rq_rmh))[..., 0]
    root_pose_r = jnp.exp(-k_rh * rh_dist ** 2 - k_rq * rq_dist ** 2)
    rl_dist = _norm(inp.rlinv_local - inp.e_rlinv_local)
    ra_dist = _norm(inp.rangv - inp.e_rangv)
    root_vel_r = jnp.exp(-k_rl * rl_dist ** 2 - k_ra * ra_dist ** 2)
    total = w_p + w_v + w_e + w_rp + w_rv
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_rp * root_pose_r
              + w_rv * root_vel_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, root_pose_r, root_vel_r],
                             axis=-1)


def deep_mimic_reward(inp: RewardInputs, ws: dict):
    """(:121-165) all-joint pose + world ee + root pos. NB the reference
    applies b_diffw AFTER taking the norm (:148-149), so the weighting has
    no effect — replicated faithfully by not weighting."""
    w_p, w_v, w_e, w_c = (ws.get("w_p", 0.65), ws.get("w_v", 0.1),
                          ws.get("w_e", 0.15), ws.get("w_c", 0.1))
    k_p, k_v, k_e, k_c = (ws.get("k_p", 2.0), ws.get("k_v", 0.1),
                          ws.get("k_e", 10.0), ws.get("k_c", 10.0))
    pd = tmath.multi_quat_norm(tmath.multi_quat_diff(inp.bquat, inp.e_bquat))
    pose_r = _exp(k_p, jnp.linalg.norm(pd, axis=-1))
    vel_r = _exp(k_v, _norm(inp.bangvel - inp.e_bangvel))
    ee_r = _exp(k_e, _norm(inp.ee_wpos - inp.e_ee_wpos))
    root_r = _exp(k_c, _norm(inp.qpos[..., :3] - inp.e_qpos[..., :3]))
    total = w_p + w_v + w_e + w_c
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_c * root_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, root_r], axis=-1)


def _deep_mimic_v2_components(inp: RewardInputs, ws: dict):
    k_p, k_v, k_e = ws.get("k_p", 2.0), ws.get("k_v", 0.1), ws.get("k_e", 10.0)
    k_rp, k_rq = ws.get("k_rp", 10.0), ws.get("k_rq", 10.0)
    pose_r = _pose_nonroot(inp, ws, k_p, weighted=False, norm_v2=True)
    vel_r = _exp(k_v, _norm(inp.bangvel - inp.e_bangvel))
    ee_r = _exp(k_e, _norm(inp.ee_wpos - inp.e_ee_wpos))
    rp_r = _exp(k_rp, _norm(inp.qpos[..., :3] - inp.e_qpos[..., :3]))
    rq_dist = multi_quat_norm_v2(
        tmath.multi_quat_diff(inp.bquat[..., :4], inp.e_bquat[..., :4]))[..., 0]
    rq_r = _exp(k_rq, rq_dist)
    return pose_r, vel_r, ee_r, rp_r, rq_r


def deep_mimic_reward_v2(inp: RewardInputs, ws: dict):
    """(:166-217) multi_quat_norm_v2 pose + world ee + root pos/quat."""
    w_p, w_v, w_e = ws.get("w_p", 0.65), ws.get("w_v", 0.1), ws.get("w_e", 0.15)
    w_rp, w_rq = ws.get("w_rp", 0.1), ws.get("w_rq", 0.1)
    pose_r, vel_r, ee_r, rp_r, rq_r = _deep_mimic_v2_components(inp, ws)
    total = w_p + w_v + w_e + w_rp + w_rq
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_rp * rp_r
              + w_rq * rq_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, rp_r, rq_r], axis=-1)


def deep_mimic_reward_v2_vf(inp: RewardInputs, ws: dict):
    """(:218-280) deep_mimic_v2 + residual-force magnitude kernel."""
    w_p, w_v, w_e = ws.get("w_p", 0.65), ws.get("w_v", 0.1), ws.get("w_e", 0.15)
    w_rp, w_rq, w_vf = ws.get("w_rp", 0.1), ws.get("w_rq", 0.1), ws.get("w_vf", 0.1)
    k_vf = ws.get("k_vf", 1.0)
    pose_r, vel_r, ee_r, rp_r, rq_r = _deep_mimic_v2_components(inp, ws)
    vf_r = _exp(k_vf, _norm(inp.vf))
    total = w_p + w_v + w_e + w_rp + w_rq + w_vf
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_rp * rp_r
              + w_rq * rq_r + w_vf * vf_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, rp_r, rq_r, vf_r], axis=-1)


def multiplicable_reward(inp: RewardInputs, ws: dict):
    """(:335-394) product of pose/vel/world-ee/root-pos/root-quat kernels."""
    k_p, k_v, k_e = ws.get("k_p", 2.0), ws.get("k_v", 0.1), ws.get("k_e", 10.0)
    k_rp, k_rq = ws.get("k_rp", 10.0), ws.get("k_rq", 10.0)
    pose_r = _pose_nonroot(inp, ws, k_p, weighted=False)
    vel_r = _exp(k_v, _norm(inp.bangvel - inp.e_bangvel))
    ee_r = _exp(k_e, _norm(inp.ee_wpos - inp.e_ee_wpos))
    rp_r = _exp(k_rp, _norm(inp.qpos[..., :3] - inp.e_qpos[..., :3]))
    rq_dist = tmath.multi_quat_norm(tmath.multi_quat_diff(
        inp.qpos[..., 3:7], inp.e_qpos[..., 3:7]))[..., 0]
    rq_r = _exp(k_rq, rq_dist)
    comps = jnp.stack([pose_r, vel_r, ee_r, rp_r, rq_r], axis=-1)
    return jnp.prod(comps, axis=-1), comps


def local_world_reward_v1(inp: RewardInputs, ws: dict):
    """(:395-467) quat_v2 + a world-frame ee term."""
    w_p, w_v, w_e = ws.get("w_p", 0.4), ws.get("w_v", 0.05), ws.get("w_e", 0.15)
    w_we, w_c, w_r = ws.get("w_we", 0.1), ws.get("w_c", 0.1), ws.get("w_r", 0.2)
    k_p, k_v, k_e = ws.get("k_p", 2.0), ws.get("k_v", 0.005), ws.get("k_e", 20.0)
    k_we, k_c = ws.get("k_we", 20.0), ws.get("k_c", 1000.0)
    v_ord = ws.get("v_ord", 2)
    pose_r = _pose_nonroot(inp, ws, k_p)
    vel_r = _exp(k_v, _norm(inp.bangvel[..., 3:] - inp.e_bangvel[..., 3:], v_ord))
    ee_r = _exp(k_e, _norm(inp.ee_pos - inp.e_ee_pos))
    wee_r = _exp(k_we, _norm(inp.ee_wpos - inp.e_ee_wpos))
    com_r = _exp(k_c, _norm(inp.com - inp.e_com))
    root_r = _root_composite(inp, ws)
    total = w_p + w_v + w_e + w_we + w_c + w_r
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_we * wee_r
              + w_c * com_r + w_r * root_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, wee_r, com_r, root_r],
                             axis=-1)


def _local_world_v23(inp: RewardInputs, ws: dict, com_z_only: bool):
    w_p, w_v, w_e = ws.get("w_p", 0.4), ws.get("w_v", 0.05), ws.get("w_e", 0.15)
    w_h, w_c, w_r = ws.get("w_h", 0.1), ws.get("w_c", 0.1), ws.get("w_r", 0.2)
    k_p, k_v, k_e = ws.get("k_p", 2.0), ws.get("k_v", 0.005), ws.get("k_e", 20.0)
    k_h, k_c = ws.get("k_h", 20.0), ws.get("k_c", 1000.0)
    v_ord = ws.get("v_ord", 2)
    pose_r = _pose_nonroot(inp, ws, k_p)
    vel_r = _exp(k_v, _norm(inp.bangvel[..., 3:] - inp.e_bangvel[..., 3:], v_ord))
    ee_r = _exp(k_e, _norm(inp.ee_pos - inp.e_ee_pos))
    h_dist = tmath.wrap_to_pi(tmath.heading(inp.qpos[..., 3:7])
                              - tmath.heading(inp.e_qpos[..., 3:7]))
    h_r = _exp(k_h, h_dist)
    com_d = (inp.com[..., 2] - inp.e_com[..., 2]) if com_z_only \
        else _norm(inp.com - inp.e_com)
    com_r = _exp(k_c, com_d)
    root_r = _root_composite(inp, ws)
    total = w_p + w_v + w_e + w_h + w_c + w_r
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_h * h_r
              + w_c * com_r + w_r * root_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, h_r, com_r, root_r], axis=-1)


def local_world_reward_v2(inp: RewardInputs, ws: dict):
    """(:468-540) quat_v2 + heading kernel, full-vector com."""
    return _local_world_v23(inp, ws, com_z_only=False)


def local_world_reward_v3(inp: RewardInputs, ws: dict):
    """(:541-613) v2 with com-z only."""
    return _local_world_v23(inp, ws, com_z_only=True)


def world_quat_space_reward(inp: RewardInputs, ws: dict):
    """(:614-666) weighted pose + vel + world ee + com."""
    w_p, w_v, w_e, w_c = (ws.get("w_p", 0.6), ws.get("w_v", 0.1),
                          ws.get("w_e", 0.2), ws.get("w_c", 0.1))
    k_p, k_v, k_e, k_c = (ws.get("k_p", 2.0), ws.get("k_v", 0.005),
                          ws.get("k_e", 20.0), ws.get("k_c", 1000.0))
    v_ord = ws.get("v_ord", 2)
    pd = tmath.multi_quat_norm(tmath.multi_quat_diff(inp.bquat, inp.e_bquat))
    pd = pd.at[..., 1:].multiply(inp.b_diffw)
    pose_r = _exp(k_p, jnp.linalg.norm(pd, axis=-1))
    vel_r = _exp(k_v, _norm(inp.bangvel - inp.e_bangvel, v_ord))
    ee_r = _exp(k_e, _norm(inp.ee_wpos - inp.e_ee_wpos))
    com_r = _exp(k_c, _norm(inp.com - inp.e_com))
    total = w_p + w_v + w_e + w_c
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_c * com_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, com_r], axis=-1)


def world_quat_space_reward_v2(inp: RewardInputs, ws: dict):
    """(:667-739) world_quat + composite world-frame root kernel."""
    w_p, w_v, w_e = ws.get("w_p", 0.3), ws.get("w_v", 0.1), ws.get("w_e", 0.3)
    w_c, w_r = ws.get("w_c", 0.1), ws.get("w_r", 0.2)
    k_r = ws.get("k_r", 1.0)
    w_rpos, w_rq = ws.get("w_rpos", 5.0), ws.get("w_rq", 2.0)
    w_rlinv, w_rangv = ws.get("w_rlinv", 1.0), ws.get("w_rangv", 0.1)
    base, comps = world_quat_space_reward(inp, ws)
    rpos_dist = _norm(inp.qpos[..., :3] - inp.e_qpos[..., :3])
    rq_dist = tmath.multi_quat_norm(tmath.multi_quat_diff(
        inp.qpos[..., 3:7], inp.e_qpos[..., 3:7]))[..., 0]
    rlinv_dist = _norm(inp.rlinv - inp.e_rlinv)
    rangv_dist = _norm(inp.rangv - inp.e_rangv)
    root_r = _exp(k_r, w_rpos * rpos_dist + w_rq * rq_dist
                  + w_rlinv * rlinv_dist + w_rangv * rangv_dist)
    total = w_p + w_v + w_e + w_c + w_r
    pose_r, vel_r, ee_r, com_r = [comps[..., i] for i in range(4)]
    reward = (w_p * pose_r + w_v * vel_r + w_e * ee_r + w_c * com_r
              + w_r * root_r) / total
    return reward, jnp.stack([pose_r, vel_r, ee_r, com_r, root_r], axis=-1)


def constant_reward(inp, ws, dt):
    one = jnp.ones(inp.head_pose.shape[:-1], inp.head_pose.dtype)
    return one, one[..., None]


# ---------------------------------------------------------------------------
# fine_tune family (UHC-controller fine-tuning under egocentric head
# supervision, kin_poly/core/reward_function.py:740-930): head tracking vs
# the expert 'head_info'/'hvel' features, plus an action-regularization
# term toward the pre-fine-tune policy's action.
# ---------------------------------------------------------------------------


class FineTuneInputs(NamedTuple):
    """Inputs to the fine_tune_* rewards (reward_function.py:740-930)."""
    head_pose: jax.Array        # (..., 7) simulated head, world frame
    prev_head_pose: jax.Array   # (..., 7) previous control step
    e_head_pose: jax.Array      # (..., 7) expert 'head_info' at this frame
    e_head_vel: jax.Array       # (..., 6) expert 'hvel' (lin + ang)
    bquat: jax.Array            # (..., 92) non-root body quats (get_body_quat()[4:])
    e_bquat: jax.Array = None   # (..., 92) from the kinematic pose
    action: jax.Array = None
    old_action: jax.Array = None  # the frozen pre-fine-tune policy's action
    end_reward: jax.Array = 0.0   # env.end_reward scalar
    is_end: jax.Array = False     # info['end'] per env


def _fine_tune_head_terms(inp: FineTuneInputs, ws: dict, dt: float):
    """hp/hq/hvel — shared by all three variants (:775-790, :835-850)."""
    k_rp, k_rq = ws.get("k_rp", 1.0), ws.get("k_rq", 1.0)
    k_v = ws.get("k_v", 0.1)
    hp_r = jnp.exp(-k_rp * _norm(
        inp.head_pose[..., :3] - inp.e_head_pose[..., :3]) ** 2)
    hq_d = jnp.linalg.norm(multi_quat_norm_v2(tmath.multi_quat_diff(
        inp.head_pose[..., 3:], inp.e_head_pose[..., 3:])), axis=-1)
    hq_r = jnp.exp(-k_rq * hq_d**2)
    hpvel = (inp.head_pose[..., :3] - inp.prev_head_pose[..., :3]) / dt
    hqvel = tmath.angvel_fd(inp.prev_head_pose[..., 3:],
                            inp.head_pose[..., 3:], dt)
    hvel_r = jnp.exp(-_norm(hpvel - inp.e_head_vel[..., :3])
                     - k_v * _norm(hqvel - inp.e_head_vel[..., 3:]))
    return hp_r, hq_r, hvel_r


def _fine_tune_pose_action(inp: FineTuneInputs, ws: dict):
    k_a, k_p = ws.get("k_a", 1.0), ws.get("k_p", 1.0)
    action_r = jnp.exp(-k_a * _norm(inp.action - inp.old_action) ** 2)
    pose_d = jnp.linalg.norm(multi_quat_norm_v2(
        tmath.multi_quat_diff(inp.bquat, inp.e_bquat)), axis=-1)
    pose_r = jnp.exp(-k_p * pose_d**2)
    return action_r, pose_r


def fine_tune_kin_action_reward(inp: FineTuneInputs, ws: dict, dt: float):
    """Weighted-sum head + pose + action regularization (:740-805).

    The reference's cc_cfg.adap_weight branch (:766-772) re-balances
    w_p/w_a from kinematic-velocity error; no shipped fine-tune config
    enables it, so the static-weight path is the contract here.
    """
    w_rp, w_rq = ws.get("w_rp", 1.0), ws.get("w_rq", 1.0)
    w_a, w_p, w_v = ws.get("w_a", 0.05), ws.get("w_p", 1.0), ws.get("w_v", 1.0)
    w_end = ws.get("w_end", 0.0)
    hp_r, hq_r, hvel_r = _fine_tune_head_terms(inp, ws, dt)
    action_r, pose_r = _fine_tune_pose_action(inp, ws)
    reward = (w_rp * hp_r + w_rq * hq_r + w_v * hvel_r + w_p * pose_r
              + w_a * action_r) / (w_rp + w_rq + w_v + w_p + w_a)
    reward = reward + jnp.where(inp.is_end, w_end * inp.end_reward, 0.0)
    return reward, jnp.stack([hp_r, hq_r, hvel_r, pose_r, action_r], axis=-1)


def fine_tune_action_reward(inp: FineTuneInputs, ws: dict, dt: float):
    """Multiplicative head tracking + additive action term (:807-861)."""
    w_a, w_end = ws.get("w_a", 0.05), ws.get("w_end", 1.0)
    k_a = ws.get("k_a", 1.0)
    hp_r, hq_r, hvel_r = _fine_tune_head_terms(inp, ws, dt)
    action_r = jnp.exp(-k_a * _norm(inp.action - inp.old_action) ** 2)
    reward = hp_r * hq_r * hvel_r + w_a * action_r
    reward = reward + jnp.where(inp.is_end, w_end * inp.end_reward, 0.0)
    return reward, jnp.stack([hp_r, hq_r, hvel_r, action_r], axis=-1)


def fine_tune_reward(inp: FineTuneInputs, ws: dict, dt: float):
    """Fully multiplicative head + pose tracking; the end bonus is a
    multiplier here, not an addend (:863-930)."""
    hp_r, hq_r, hvel_r = _fine_tune_head_terms(inp, ws, dt)
    k_p = ws.get("k_p", 1.0)
    pose_d = jnp.linalg.norm(multi_quat_norm_v2(
        tmath.multi_quat_diff(inp.bquat, inp.e_bquat)), axis=-1)
    pose_r = jnp.exp(-k_p * pose_d**2)
    reward = hp_r * hq_r * hvel_r * pose_r
    reward = reward * jnp.where(inp.is_end, inp.end_reward, 1.0)
    return reward, jnp.stack([hp_r, hq_r, hvel_r, pose_r], axis=-1)


# The reference registry lists 22 ids (kin_poly/core/reward_function.py:
# 1292-1313). The dynamic_supervision family, which every shipped config
# uses, is implemented (v1 lives in HumanoidAREnv._reward: it needs
# env-local prev-state bookkeeping). All 22 are now registered; the
# fine_tune trio runs on FineTuneInputs (head supervision + old_action).
LEGACY_KIN_POLY_IDS = ()

# fine_tune family: UHC-controller fine-tuning rewards; they consume
# FineTuneInputs, not ARRewardInputs (reward_function.py:740-930)
FINE_TUNE_REWARDS: dict[str, Callable] = {
    "fine_tune_kin_action_reward": fine_tune_kin_action_reward,
    "fine_tune_action_reward": fine_tune_action_reward,
    "fine_tune_reward": fine_tune_reward,
}

# legacy imitation rewards: humanoid_im-style formulas living in the
# kin-poly registry (the reference's copycat fine-tune experiments); they
# run on the UHC env's RewardInputs and are exposed through BOTH registries
LEGACY_IMITATION_REWARDS: dict[str, Callable] = {
    "quat_v2": quat_space_reward_v2,
    "quat_v3": quat_space_reward_v3,
    "deep_mimic": deep_mimic_reward,
    "deep_mimic_v2": deep_mimic_reward_v2,
    "deep_mimic_reward_v2_vf": deep_mimic_reward_v2_vf,
    # _vf_vq's body computes the identical 5 terms as deep_mimic_v2
    # (reference :281-335: no vf/vq term survives in the final formula)
    "deep_mimic_reward_v2_vf_vq": deep_mimic_reward_v2,
    "multiplicable_reward": multiplicable_reward,
    "local_world_v1": local_world_reward_v1,
    "local_world_v2": local_world_reward_v2,
    "local_world_v3": local_world_reward_v3,
    "world_quat": world_quat_space_reward,
    "world_quat_v2": world_quat_space_reward_v2,
}

# ids whose formulas read the local-frame features (rq_rmh/rlinv/rangv/
# ee_pos): humanoid_im builds those inputs for these ids
NEEDS_LOCAL_IDS = frozenset((
    "quat_v2", "quat_v3", "deep_mimic", "deep_mimic_v2",
    "deep_mimic_reward_v2_vf", "deep_mimic_reward_v2_vf_vq",
    "multiplicable_reward", "local_world_v1", "local_world_v2",
    "local_world_v3", "world_quat_v2",
))

KIN_POLY_REWARDS: dict[str, Callable] = {
    # dynamic_supervision_v1 is implemented inside HumanoidAREnv (it needs
    # env-local prev-state bookkeeping); registered there.
    "dynamic_supervision_v2": dynamic_supervision_v2,
    "dynamic_supervision_v3": dynamic_supervision_v3,
    "dynamic_supervision_v4": dynamic_supervision_v4,
    "dynamic_supervision_v5": dynamic_supervision_v5,
    "dynamic_supervision_v6": dynamic_supervision_v6,
    "constant": constant_reward,
}

UHC_EXTRA_IMITATION = LEGACY_IMITATION_REWARDS  # alias for the UHC registry


def get_kin_poly_reward(reward_id: str) -> Callable:
    if reward_id in FINE_TUNE_REWARDS:
        return FINE_TUNE_REWARDS[reward_id]
    if reward_id in LEGACY_IMITATION_REWARDS:
        # imitation-style legacy ids run on the UHC env's inputs
        # (humanoid_im dispatch), not the AR env's
        raise KeyError(
            f"kin-poly reward_id {reward_id!r} is an imitation reward; "
            f"set it as the UHC env's reward_id instead")
    if reward_id not in KIN_POLY_REWARDS:
        raise KeyError(f"unknown kin-poly reward_id {reward_id!r}; "
                       f"available: {sorted(KIN_POLY_REWARDS)}")
    return KIN_POLY_REWARDS[reward_id]


def get_uhc_reward(reward_id: str) -> Callable:
    if reward_id in LEGACY_IMITATION_REWARDS:
        return LEGACY_IMITATION_REWARDS[reward_id]
    if reward_id not in UHC_REWARDS:
        raise KeyError(f"unknown UHC reward_id {reward_id!r}; "
                       f"available: {sorted(UHC_REWARDS) + sorted(LEGACY_IMITATION_REWARDS)}")
    return UHC_REWARDS[reward_id]
