"""TrajARNet — the autoregressive kinematic policy network.

Port of ``kin_poly/models/traj_ar_smpl_net.py`` (526 LoC of stateful torch)
into a pure flax module whose AR rollout is one `lax.scan`: the per-step
GRU + MLP + kinematic integration + FK all trace into a single fused XLA
program (the reference runs this loop per-frame in Python on CPU inside
every rollout worker).

Feature layout (kin_poly.yml: use_head=True, use_action=True, use_vel=False,
use_context=False, has_z=True):

- context input  (B, T, 17): [obj_head_relative_poses 7, head_vels 6,
                              action_one_hot 4]
- AR state       (B, 101/105): [deheaded qpos[2:] 74, diff head pos 3,
  diff head rot 4, pred obj-rel-head 7, target head angvel 3, target head
  linvel 3, target obj-rel-head 7, (+ action one-hot 4 when as_policy)]
- action         (B, 80): [z 1, root quat 4, body pose 69, root vel 6]
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath
from kinpoly_tpu.models.nets import MLP
from kinpoly_tpu.physics import fk as fklib


@dataclass(frozen=True)
class TrajARConfig:
    use_of: bool = False
    use_head: bool = True
    use_action: bool = True
    use_vel: bool = False
    use_context: bool = False
    has_z: bool = True
    pose_delta: bool = False
    add_noise: bool = True
    noise_std: float = 0.01
    model_v: int = 1
    rnn_hdim: int = 1024
    mlp_hsize: tuple = (1024, 512, 256)
    mlp_htype: str = "relu"
    of_dim: int = 512
    # loss weights (model_specs, kin_poly.yml:22-31)
    w_rp: float = 50.0
    w_rr: float = 50.0
    w_p: float = 1.0
    w_v: float = 1.0
    w_ee: float = 10.0
    w_op: float = 1.0
    w_or: float = 10.0

    @property
    def context_dim(self) -> int:
        d = 0
        if self.use_of:
            d += self.of_dim
        if self.use_head:
            d += 7 + 6
        if self.use_action:
            d += 4
        return d

    @property
    def action_dim(self) -> int:
        return 80 if self.has_z else 79  # target layout of the dataset

    @property
    def init_dim(self) -> int:
        return self.action_dim + 75


QPOS_LM = 74
QVEL_LM = 75
POSE_START = 7
DT = 1.0 / 30


# ---------------------------------------------------------------------------
# kinematic integration (reference TrajARNet.step, traj_ar_smpl_net.py:292)
# ---------------------------------------------------------------------------


def step_ar(qpos: jax.Array, action: jax.Array, cfg: TrajARConfig,
            dt: float = DT) -> jax.Array:
    """Integrate one kinematic action into the next-frame qpos."""
    curr_pos, curr_rot = qpos[..., :3], qpos[..., 3:7]
    curr_heading = tmath.heading_q(curr_rot)

    body_pose = action[..., POSE_START - 2:QPOS_LM]
    if cfg.pose_delta:
        body_pose = tmath.wrap_to_pi(body_pose + qpos[..., POSE_START:])

    if cfg.has_z:
        # action = [z, root quat 4, body pose 69, root vel 6]; xy integrated
        # from the heading-rotated linear velocity, z taken from the action
        root_qvel = action[..., QPOS_LM:]
        linv = tmath.quat_rot_vec(curr_heading, root_qvel[..., :3])
        new_xy = curr_pos[..., :2] + linv[..., :2] * dt
        pos_part = jnp.concatenate([new_xy, action[..., 0:1]], axis=-1)
    else:
        root_qvel = action[..., QVEL_LM:]
        linv = tmath.quat_rot_vec(curr_heading, root_qvel[..., :3])
        pos_part = curr_pos + linv * dt

    # the action's quat slot is supervised by losses but the next-frame root
    # rotation comes from integrating the predicted angular velocity
    # (traj_ar_smpl_net.py:322-327)
    angv = tmath.quat_rot_vec(curr_rot, root_qvel[..., 3:6])
    new_rot = tmath.quat_mul(tmath.quat_from_expmap(angv * dt), curr_rot)
    new_rot = tmath.quat_norm(new_rot)

    return jnp.concatenate([pos_part, new_rot, body_pose], axis=-1)


def step_ar_with_vel(qpos, qvel, action, cfg: TrajARConfig, dt: float = DT):
    next_qpos = step_ar(qpos, action, cfg, dt)
    next_qvel = tmath.qvel_fd(qpos, next_qpos, dt)
    return next_qpos, next_qvel


def clamp_qpos(spec, prev_qpos: jax.Array, q: jax.Array) -> jax.Array:
    """Bound an integrated kinematic pose near physical ranges: per-step
    root translation <= 1 m, hinges within joint range +- 0.5 rad, non-
    finite entries fall back to the previous pose. An untrained step-GRU
    diverges exponentially over a 100-frame open-loop rollout; the
    reference trains in f64 (range 1e308) and merely produces a huge loss,
    while f32 overflows to inf and NaNs the update. The clamp keeps both
    the training loss and the env target finite without changing converged
    behaviour (trained policies stay far inside these bounds)."""
    pos = jnp.clip(q[..., :3],
                   prev_qpos[..., :3] - 1.0, prev_qpos[..., :3] + 1.0)
    quat = tmath.quat_norm(jnp.where(
        jnp.isfinite(q[..., 3:7]), q[..., 3:7], prev_qpos[..., 3:7]))
    lo = jnp.asarray(spec.jnt_range[:, 0] - 0.5, q.dtype)
    hi = jnp.asarray(spec.jnt_range[:, 1] + 0.5, q.dtype)
    hinge = jnp.clip(q[..., 7:], lo, hi)
    out = jnp.concatenate([pos, quat, hinge], axis=-1)
    return jnp.where(jnp.isfinite(out), out, prev_qpos)


# ---------------------------------------------------------------------------
# observation builder (reference get_obs, traj_ar_smpl_net.py:203-290)
# ---------------------------------------------------------------------------


class ClipData(NamedTuple):
    """Per-window training data (B, T, ...) — the StateARDataset sample."""
    qpos: jax.Array                      # (B, T, 76)
    qvel: jax.Array                      # (B, T, 75)
    wbpos: jax.Array                     # (B, T, 72)
    head_pose: jax.Array                 # (B, T, 7)
    head_vels: jax.Array                 # (B, T, 6)
    obj_pose: jax.Array                  # (B, T, 14) active object + secondary
    #                                        (push: table; else parked slot)
    obj_head_relative_poses: jax.Array   # (B, T, 7)
    action_one_hot: jax.Array            # (B, T, 4)
    target: jax.Array                    # (B, T, action_dim)
    of: jax.Array | None = None          # (B, T, of_dim)
    length: jax.Array | None = None      # (B,) true (unpadded) window length
    take_idx: jax.Array | None = None    # (B,) source take per window


def ar_obs(spec, cfg: TrajARConfig, qpos, qvel, head_pose_t, head_vels_t,
           obj_pose_t, obj_rel_head_t, action_one_hot_t, of_t=None,
           context_feat_t=None, as_policy: bool = False, noise=None,
           fk_res=None):
    """AR state vector + FK features for the current sim qpos against the
    frame-t context. All inputs batched (..., d). `fk_res` lets a caller
    that already holds FK(qpos) (the AR env caches it across steps) skip
    the recompute."""
    if fk_res is None:
        fk_res = fklib.fk(spec, qpos)
    head_idx = spec.body_index("Head")
    pred_hpos = fk_res.xpos[..., head_idx, :]
    pred_hrot = fk_res.xquat[..., head_idx, :]

    qpos_local = jnp.concatenate(
        [qpos[..., :3], tmath.de_heading(qpos[..., 3:7]), qpos[..., 7:]], axis=-1
    )

    obs = []
    if (cfg.use_context or cfg.use_of) and context_feat_t is not None:
        obs.append(context_feat_t)

    t_hpos, t_hrot = head_pose_t[..., :3], head_pose_t[..., 3:]
    t_hlvel, t_havel = head_vels_t[..., :3], head_vels_t[..., 3:]
    t_obj_rel = obj_rel_head_t
    if noise is not None:
        k1, k2, k3, k4, k5 = jax.random.split(noise, 5)
        s = cfg.noise_std
        t_hrot = t_hrot + s * jax.random.normal(k1, t_hrot.shape, t_hrot.dtype)
        t_hpos = t_hpos + s * jax.random.normal(k2, t_hpos.shape, t_hpos.dtype)
        t_havel = t_havel + s * jax.random.normal(k3, t_havel.shape, t_havel.dtype)
        t_hlvel = t_hlvel + s * jax.random.normal(k4, t_hlvel.shape, t_hlvel.dtype)
        t_obj_rel = t_obj_rel + s * jax.random.normal(k5, t_obj_rel.shape, t_obj_rel.dtype)

    diff_hpos = tmath.transform_vec(t_hpos - pred_hpos, pred_hrot, "heading")
    diff_hrot = tmath.quat_mul(tmath.quat_inv(t_hrot), pred_hrot)

    q_heading = tmath.heading_q(pred_hrot)
    diff_obj = obj_pose_t[..., :3] - pred_hpos
    diff_obj_loc = tmath.transform_vec(diff_obj, pred_hrot, "heading")
    obj_rot_local = tmath.quat_mul(tmath.quat_inv(q_heading), obj_pose_t[..., 3:7])
    pred_obj_rel_head = jnp.concatenate([diff_obj_loc, obj_rot_local], axis=-1)

    obs.append(qpos_local[..., 2:])
    if cfg.use_vel:
        obs.append(qvel)
    if cfg.use_head:
        obs.append(diff_hpos)
        obs.append(diff_hrot)
    obs.append(pred_obj_rel_head)
    if cfg.use_head:
        obs.append(t_havel)
        obs.append(t_hlvel)
        obs.append(t_obj_rel)
    if cfg.use_action and cfg.model_v > 0 and as_policy:
        obs.append(action_one_hot_t)
    if cfg.use_of and as_policy and of_t is not None:
        obs.append(of_t)

    features = dict(
        pred_wbpos=fk_res.xpos.reshape(qpos.shape[:-1] + (-1,)),
        pred_wbquat=fk_res.xquat.reshape(qpos.shape[:-1] + (-1,)),
        obj_2_head=pred_obj_rel_head,
        qpos=qpos, qvel=qvel,
    )
    return jnp.concatenate(obs, axis=-1), features


def obs_dim(cfg: TrajARConfig, as_policy: bool = False) -> int:
    d = QPOS_LM
    if cfg.use_context or cfg.use_of:
        d += cfg.rnn_hdim
    if cfg.use_vel:
        d += QVEL_LM
    if cfg.use_head:
        d += 3 + 4 + 3 + 3 + 7
    d += 7
    if cfg.use_action and cfg.model_v > 0 and as_policy:
        d += 4
    if cfg.use_of and as_policy:
        d += cfg.of_dim
    return d


# ---------------------------------------------------------------------------
# the flax module
# ---------------------------------------------------------------------------


class TrajARNet(nn.Module):
    spec: Any                 # HumanoidSpec (static)
    cfg: TrajARConfig
    as_policy: bool = False

    def setup(self):
        c = self.cfg
        self.context_gru = nn.GRUCell(features=c.rnn_hdim)
        self.context_mlp = MLP(c.mlp_hsize, c.mlp_htype)
        self.context_fc = nn.Dense(c.init_dim)
        if c.model_v in (0, 1):
            self.action_gru = nn.GRUCell(features=c.rnn_hdim)
        self.action_mlp = MLP(c.mlp_hsize, c.mlp_htype)
        self.action_fc = nn.Dense(c.action_dim)

    # -- context ------------------------------------------------------------

    def context_input(self, data: ClipData) -> jax.Array:
        c = self.cfg
        feats = []
        if c.use_of:
            feats.append(data.of)
        if c.use_head:
            feats.append(data.obj_head_relative_poses)
            feats.append(data.head_vels)
        if c.use_action:
            feats.append(data.action_one_hot)
        return jnp.concatenate(feats, axis=-1)

    def context_features(self, data: ClipData) -> jax.Array:
        """(B, T, rnn_hdim) batch-GRU over per-frame context."""
        x = self.context_input(data)
        B = x.shape[0]
        carry0 = jnp.zeros((B, self.cfg.rnn_hdim), x.dtype)

        def scan_fn(cell, carry, xt):
            return cell(carry, xt)

        scan = nn.transforms.scan(
            scan_fn, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1)
        _, out = scan(self.context_gru, carry0, x)
        return out

    def init_states(self, data: ClipData):
        """Predict the initial (qpos, qvel) from the mean context feature
        (reference init_states, :180-201)."""
        ctx = self.context_features(data)
        ctx_mean = ctx.mean(axis=1)
        init_state = self.context_fc(self.context_mlp(ctx_mean))
        init_pred_state = init_state[..., :self.cfg.action_dim]
        init_pred_vel = init_state[..., self.cfg.action_dim:]

        # layout: xy from data, z + heading-restored quat + 69 pose predicted
        # (reference init_pred_qpos, :166-178)
        init_pos = data.qpos[:, 0, :3]
        init_rot = data.qpos[:, 0, 3:7]
        init_heading = tmath.heading_q(init_rot)
        root_q = tmath.quat_norm(
            tmath.quat_mul(init_heading, init_pred_state[..., 1:5]))
        qpos0 = jnp.concatenate(
            [init_pos[..., :2], init_pred_state[..., 0:1], root_q,
             init_pred_state[..., 5:QPOS_LM]], axis=-1)
        return qpos0, init_pred_vel, ctx

    # -- per-step action ----------------------------------------------------

    def action(self, carry, state):
        """(gru_carry, state) -> (new_carry, action)."""
        if self.cfg.model_v in (0, 1):
            carry, rnn_out = self.action_gru(carry, state)
            x = jnp.concatenate([state, rnn_out], axis=-1)
        else:
            x = state
        return carry, self.action_fc(self.action_mlp(x))

    def init_action_carry(self, batch: int, dtype=jnp.float32):
        return jnp.zeros((batch, self.cfg.rnn_hdim), dtype)

    # -- full AR rollout over a window (reference forward, :346-383) ---------

    def __call__(self, data: ClipData, gt_rate: float = 0.0,
                 rngs_key: jax.Array | None = None, train: bool = False):
        c = self.cfg
        spec = self.spec
        # drop per-window metadata (no time axis) before the (B, T, ...)
        # tree transforms below
        data = data._replace(length=None, take_idx=None)
        B, T = data.qpos.shape[:2]
        dtype = data.qpos.dtype
        if rngs_key is None:
            rngs_key = jax.random.PRNGKey(0)
        k_init, k_roll = jax.random.split(rngs_key)

        qpos0, qvel0, ctx = self.init_states(data)

        # scheduled sampling on the init state
        use_gt0 = jax.random.bernoulli(jax.random.fold_in(k_init, 0), gt_rate)
        qpos0 = jnp.where((gt_rate > 0) & use_gt0, data.qpos[:, 0], qpos0)
        qvel0 = jnp.where((gt_rate > 0) & use_gt0, data.qvel[:, 0], qvel0)

        carry0 = self.init_action_carry(B, dtype)

        def frame(data, t):
            return jax.tree.map(lambda x: x[:, t] if x is not None else None, data)

        def obs_at(qpos, qvel, t_data, ctx_t, noise_key):
            return ar_obs(
                spec, c, qpos, qvel, t_data.head_pose, t_data.head_vels,
                t_data.obj_pose, t_data.obj_head_relative_poses,
                t_data.action_one_hot, t_data.of, ctx_t,
                as_policy=self.as_policy,
                noise=noise_key if (c.add_noise and train) else None)

        data_tm = jax.tree.map(
            lambda x: jnp.moveaxis(x, 1, 0) if x is not None else None, data)
        # per-step context features (use_context/use_of configs,
        # traj_ar_smpl_net.py:138-178 + get_obs:212): ctx (B, T, H) from the
        # batch context GRU, threaded through the rollout scan
        use_ctx = c.use_context or c.use_of
        ctx_tm = jnp.moveaxis(ctx, 1, 0) if use_ctx else None

        state0, feat0 = obs_at(qpos0, qvel0, frame(data, 0),
                               ctx[:, 0] if use_ctx else None,
                               jax.random.fold_in(k_roll, 0))

        def scan_fn(mdl, carry, xs):
            qpos, qvel, gru, state = carry
            t_data, ctx_t, keys = xs
            k_noise, k_ss = keys
            gru, act = mdl.action(gru, state)
            next_qpos = clamp_qpos(spec, qpos, step_ar(qpos, act, c))
            next_qvel = tmath.qvel_fd(qpos, next_qpos, DT)
            use_gt = jax.random.bernoulli(k_ss, gt_rate)
            next_qpos = jnp.where((gt_rate > 0) & use_gt, t_data.qpos, next_qpos)
            next_qvel = jnp.where((gt_rate > 0) & use_gt, t_data.qvel, next_qvel)
            state, feat = obs_at(next_qpos, next_qvel, t_data, ctx_t, k_noise)
            return (next_qpos, next_qvel, gru, state), (feat, act)

        keys_noise = jax.random.split(jax.random.fold_in(k_roll, 1), T - 1)
        keys_ss = jax.random.split(jax.random.fold_in(k_roll, 2), T - 1)
        tail = jax.tree.map(lambda x: x[1:] if x is not None else None, data_tm)
        ctx_tail = ctx_tm[1:] if use_ctx else None
        (qpos_T, qvel_T, gru_T, state_T), (feats, acts) = self._scan_rollout(
            scan_fn, (qpos0, qvel0, carry0, state0),
            (tail, ctx_tail, (keys_noise, keys_ss)))

        _, last_act = self.action(gru_T, state_T)

        # stack: t=0 features + t=1..T-1; actions t=1..T-1 + last
        def cat0(f0, fs):
            return jnp.concatenate([f0[None], fs], axis=0)

        feats = {k: jnp.moveaxis(cat0(feat0[k], feats[k]), 0, 1)
                 for k in feat0}
        actions = jnp.moveaxis(
            jnp.concatenate([acts, last_act[None]], axis=0), 0, 1)
        feats["action"] = actions
        # fix_qvel (reference :385): shift qvel one step forward
        qvel_seq = feats["qvel"]
        feats["qvel"] = jnp.concatenate(
            [qvel_seq[:, 1:], qvel_seq[:, -2:-1]], axis=1)
        return feats

    def _scan_rollout(self, scan_fn, carry, xs):
        scan = nn.transforms.scan(
            scan_fn, variable_broadcast="params", split_rngs={"params": False})
        return scan(self, carry, xs)


# ---------------------------------------------------------------------------
# losses (reference compute_loss*, traj_ar_smpl_net.py:390-527 +
# kin_poly/utils/compute_loss.py)
# ---------------------------------------------------------------------------


def _quat_iden_loss(q_pred, q_gt):
    d = tmath.quat_mul(q_gt, tmath.quat_inv(q_pred))
    iden = jnp.zeros_like(d).at[..., 0].set(1.0)
    return jnp.sum((jnp.abs(d) - iden) ** 2, axis=-1)


EE_COLS = None  # all 24 bodies enter the 'end effector' loss (reference uses full wbpos)


def compute_loss(cfg: TrajARConfig, feats: dict, data: ClipData):
    """Full-rollout supervised loss (reference compute_loss :390-457)."""
    pred_qpos, gt_qpos = feats["qpos"], data.qpos
    r_pos = jnp.sum((gt_qpos[..., :3] - pred_qpos[..., :3]) ** 2, axis=-1).mean()
    r_rot = _quat_iden_loss(pred_qpos[..., 3:7], gt_qpos[..., 3:7]).mean()
    p_rot = jnp.sum((gt_qpos[..., 7:] - pred_qpos[..., 7:]) ** 2, axis=-1).mean()

    pred_qvel = feats["qvel"][:, :-1]
    gt_qvel = data.qvel[:, 1:]
    vl = jnp.sum((gt_qvel[..., :3] - pred_qvel[..., :3]) ** 2, axis=-1).mean()
    va = jnp.sum((gt_qvel[..., 3:6] - pred_qvel[..., 3:6]) ** 2, axis=-1).mean()

    ee = jnp.sum((data.wbpos - feats["pred_wbpos"]) ** 2, axis=-1).mean()

    o_pos = jnp.sum(
        (data.obj_head_relative_poses[..., :3] - feats["obj_2_head"][..., :3]) ** 2,
        axis=-1).mean()
    o_rot = _quat_iden_loss(
        feats["obj_2_head"][..., 3:], data.obj_head_relative_poses[..., 3:]).mean()

    loss = (cfg.w_rp * r_pos + cfg.w_rr * r_rot + cfg.w_p * p_rot
            + cfg.w_v * vl + cfg.w_v * va + cfg.w_ee * ee
            + cfg.w_op * o_pos + cfg.w_or * o_rot)
    return loss, dict(r_pos=r_pos, r_rot=r_rot, p_rot=p_rot, vl=vl, va=va,
                      ee=ee, o_pos=o_pos, o_rot=o_rot)


def compute_loss_lite(spec, cfg: TrajARConfig, pred_qpos, gt_qpos,
                      reduce_mean: bool = True):
    """Per-frame qpos supervision (reference compute_loss_lite :459-497)."""
    fk_pred = fklib.fk(spec, pred_qpos)
    fk_gt = fklib.fk(spec, gt_qpos)
    pred_w = fk_pred.xpos.reshape(pred_qpos.shape[:-1] + (-1,))
    gt_w = fk_gt.xpos.reshape(gt_qpos.shape[:-1] + (-1,))

    r_pos = jnp.sum((gt_qpos[..., :3] - pred_qpos[..., :3]) ** 2, axis=-1)
    r_rot = _quat_iden_loss(pred_qpos[..., 3:7], gt_qpos[..., 3:7])
    p_rot = jnp.sum((gt_qpos[..., 7:] - pred_qpos[..., 7:]) ** 2, axis=-1)
    ee = jnp.sum((gt_w - pred_w) ** 2, axis=-1)
    loss = cfg.w_rp * r_pos + cfg.w_rr * r_rot + cfg.w_p * p_rot + cfg.w_ee * ee
    if reduce_mean:
        loss = loss.mean()
    return loss, dict(r_pos=r_pos.mean(), r_rot=r_rot.mean(),
                      p_rot=p_rot.mean(), ee=ee.mean())


def compute_loss_init(spec, cfg: TrajARConfig, pred_qpos, gt_qpos,
                      pred_qvel, gt_qvel):
    """Init-state supervision (reference compute_loss_init,
    traj_ar_smpl_net.py:499-527). NOTE: the reference function accepts
    pred_qvel/gt_qvel but never uses them — its loss is
    w_rp*r_pos + w_rr*r_rot + w_p*p_rot + w_ee*ee only. We keep the same
    signature and the same (velocity-free) behaviour."""
    del pred_qvel, gt_qvel
    loss, info = compute_loss_lite(spec, cfg, pred_qpos, gt_qpos)
    return loss, info
