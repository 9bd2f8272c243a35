"""Kinematic-policy environment (humanoid_ar) — pure functional.

Port of ``kin_poly/envs/humanoid_ar_v1.py``: the action is the next-frame
kinematic pose proposal (80-d, policy_v=1); the env integrates it
(``step_ar``:216), forms the tracking target via FK, runs the *frozen UHC
controller in-loop* (cc policy apply -> stable-PD -> physics), and rewards
with ``dynamic_supervision_v1`` (``kin_poly/core/reward_function.py:931``).

TPU-native restructuring: the UHC policy is just another pure apply inside
the jitted step (the reference crosses a process + C boundary per substep);
contexts are precomputed per-window batches; everything vmaps over envs.

Round-1 simplification (documented): interactable objects are static scene
geometry — their poses come from the context and they do not yet receive
forces back (the reference's chair/table are quasi-static too: mass 1e5 /
500; the dynamic 'push' box is the one behavior this defers).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath
from kinpoly_tpu.envs.humanoid_im import EnvConfig, TargetFrame, full_obs
from kinpoly_tpu.models import nets
from kinpoly_tpu.models.traj_ar import TrajARConfig, ar_obs, step_ar
from kinpoly_tpu.physics import engine as eng
from kinpoly_tpu.physics import fk as fklib


@dataclass(frozen=True)
class ARRewardWeights:
    """dynamic_supervision family weights (config/statear/kin_poly.yml:73-86;
    defaults for v3-v6 from kin_poly/core/reward_function.py get() defaults)."""
    reward_id: str = "dynamic_supervision_v1"
    w_hp: float = 0.15
    w_hq: float = 0.15
    w_p: float = 0.2
    w_jp: float = 0.2
    w_act_p: float = 0.2
    w_act_v: float = 0.1
    w_hv: float = 0.05
    k_hp: float = 45.0
    k_hq: float = 45.0
    k_p: float = 50.0
    k_jp: float = 50.0
    k_act_p: float = 5.0
    k_act_v: float = 0.005
    k_rp: float = 0.1
    k_rq: float = 0.1
    v_ord: int = 2


class ARContext(NamedTuple):
    """Per-window context bank (N, T, ...): ground truth + AR-net rollout."""
    qpos: jax.Array          # GT (N, T, 76)
    qvel: jax.Array
    bquat: jax.Array         # GT sim-frame body quats (N, T, 96)
    gt_wbpos: jax.Array      # FK of GT qpos (N, T, 72)
    head_pose: jax.Array     # (N, T, 7)
    head_vels: jax.Array     # (N, T, 6)
    obj_pose: jax.Array      # (N, T, 7)
    obj_head_relative_poses: jax.Array  # (N, T, 7)
    action_one_hot: jax.Array           # (N, T, 4)
    ar_qpos: jax.Array       # ARNet rollout (N, T, 76), smoothed
    ar_qvel: jax.Array
    ar_wbpos: jax.Array
    init_qpos: jax.Array     # (N, 76)
    init_qvel: jax.Array     # (N, 75)
    length: jax.Array        # (N,) int32 (episode len = true frames - 1;
    #                          padded frames do NOT count toward coverage)
    context_feat: jax.Array = None   # (N, T, H) per-step context GRU features
    #                                  (use_context / use_of configs)
    of: jax.Array = None             # (N, T, of_dim) raw optical-flow features
    #                                  (use_of: the policy obs appends of_t,
    #                                   reference get_ar_obs_v1)


class AREnvState(NamedTuple):
    sim: eng.SimState
    cur_t: jax.Array
    prev_bquat: jax.Array     # (96,)
    prev_hpos: jax.Array      # (7,) previous head pose
    target_qpos: jax.Array    # (76,) current AR target
    clip_idx: jax.Array
    done: jax.Array
    fail: jax.Array
    rng: jax.Array
    # cached FK of sim.qpos (round-4): cc_obs and ar_obs both need FK of the
    # CURRENT sim pose, which the previous step already computed — carrying
    # it saves 2 of the 4 full env-level FK calls per control step
    sim_fk: fklib.FKResult = None


def multi_quat_norm_v2(nq: jax.Array) -> jax.Array:
    """Per-joint norm of (|w|-1, x, y, z) (uhc/utils/math_utils.py:111)."""
    q = nq.reshape(nq.shape[:-1] + (-1, 4))
    d = jnp.concatenate([jnp.abs(q[..., :1]) - 1.0, q[..., 1:]], axis=-1)
    return jnp.linalg.norm(d, axis=-1)


class HumanoidAREnv:
    """Stateless namespace bound to (physics model, configs, frozen UHC
    policy params + obs-norm, context bank)."""

    def __init__(self, model: eng.PhysicsModel, kin_cfg: TrajARConfig,
                 cc_cfg: EnvConfig, reward_w: ARRewardWeights,
                 context: ARContext,
                 cc_policy_apply, cc_policy_params, cc_norm,
                 mode: str = "train", wild: bool = False,
                 cc_log_std: float = -2.3,
                 body_diff_thresh: float = 10.0,
                 body_diff_gt_thresh: float = 12.0,
                 env_episode_len: int = 100000,
                 policy_v: int = 1):
        self.model = model
        self.kin_cfg = kin_cfg
        self.cc_cfg = cc_cfg
        self.rw = reward_w
        self.ctx = context
        self.cc_policy_apply = cc_policy_apply
        self.cc_policy_params = cc_policy_params
        self.cc_norm = cc_norm
        self.cc_log_std = cc_log_std
        self.mode = mode
        self.wild = wild
        self.body_diff_thresh = body_diff_thresh
        self.body_diff_gt_thresh = body_diff_gt_thresh
        self.env_episode_len = env_episode_len
        self.base_rot = jnp.asarray(cc_cfg.base_rot, jnp.float32)
        spec = model.spec
        self.head_idx = spec.body_index("Head")
        from kinpoly_tpu.config.defaults import (b_diff_weights_pose,
                                                 body_diff_weights)
        self.jpos_diffw = jnp.asarray(body_diff_weights(spec))
        self.b_diffw = jnp.asarray(b_diff_weights_pose(spec))
        self.policy_v = policy_v
        # action index -> scene-object index, derived from the parsed spec's
        # object names (shared constant with pose_metrics; asserts the scene
        # actually contains chair/box/Can/step when objects are present)
        from kinpoly_tpu.metrics.pose_metrics import action_object_indices
        self.obj_of_action = (jnp.asarray(action_object_indices(spec))
                              if spec.objects else jnp.zeros(4, jnp.int32))
        # policy_v=1: 80-d kinematic update; policy_v=2: 76-d qpos directly
        # (humanoid_ar_v1.py:251-254)
        self.action_dim = 76 if policy_v == 2 else kin_cfg.action_dim

    # -- context access ------------------------------------------------------
    # The context bank is refreshed every training epoch (new windows + new
    # AR rollouts), so it flows through step/reset as an explicit argument —
    # a jit closure would bake it in as a compile-time constant. `ctx=None`
    # falls back to the bank given at construction (tests, eval).

    def _ctx(self, ctx):
        return self.ctx if ctx is None else ctx

    def clip(self, state: AREnvState, ctx=None) -> ARContext:
        return jax.tree.map(lambda x: x[state.clip_idx], self._ctx(ctx))

    def _at(self, ctx, state, field: str, t):
        """Fused ctx[field][clip_idx, min(t, T-1)] gather. Chaining
        clip()[field][t] (two dynamic gathers) hits an XLA:TPU vmap
        miscompile when the clip axis has size 1 — see
        data/expert.bank_frame."""
        x = getattr(self._ctx(ctx), field)
        return x[state.clip_idx, jnp.minimum(t, x.shape[1] - 1)]

    # -- observation (get_ar_obs_v1, humanoid_ar_v1.py:133) ------------------

    def _sim_obj_pose(self, state: AREnvState, ctx=None):
        """The active object's pose as the obs sees it: simulated when the
        objects are free bodies (reference get_ar_obs_v1 reads
        env.get_obj_qpos(), i.e. the sim), context data otherwise."""
        if self.model.movable_objects and state.sim.obj_qpos is not None:
            a_oh = self._at(ctx, state, "action_one_hot", 0)
            o_idx = self.obj_of_action[jnp.argmax(a_oh, axis=-1)]
            return jnp.take_along_axis(
                state.sim.obj_qpos, o_idx[..., None, None], axis=-2)[..., 0, :]
        return self._at(ctx, state, "obj_pose", state.cur_t)[..., :7]

    def get_obs(self, state: AREnvState, ctx=None):
        t = state.cur_t
        kc = self.kin_cfg
        ctx_feat = None
        if kc.use_context or kc.use_of:
            the_ctx = self._ctx(ctx)
            ctx_feat = (self._at(ctx, state, "context_feat", t)
                        if the_ctx.context_feat is not None
                        else jnp.zeros(state.sim.qpos.shape[:-1]
                                       + (kc.rnn_hdim,), state.sim.qpos.dtype))
        of_t = None
        if kc.use_of:
            the_ctx = self._ctx(ctx)
            of_t = (self._at(ctx, state, "of", t)
                    if the_ctx.of is not None
                    else jnp.zeros(state.sim.qpos.shape[:-1]
                                   + (kc.of_dim,), state.sim.qpos.dtype))
        obs, _ = ar_obs(
            self.model.spec, kc,
            state.sim.qpos, state.sim.qvel,
            self._at(ctx, state, "head_pose", t),
            self._at(ctx, state, "head_vels", t),
            self._sim_obj_pose(state, ctx),
            self._at(ctx, state, "obj_head_relative_poses", t),
            self._at(ctx, state, "action_one_hot", 0),
            of_t=of_t,
            context_feat_t=ctx_feat,
            as_policy=True, noise=None,
            fk_res=state.sim_fk,
        )
        if self.policy_v == 2:
            # the residual policy sees the AR rollout pose as the last 76
            # entries (humanoid_ar_v1.py:209-210; policy_ar.py:191)
            obs = jnp.concatenate(
                [obs, self._at(ctx, state, "ar_qpos", t)], axis=-1)
        return obs

    # -- cc controller in-loop ------------------------------------------------

    def target_frame(self, next_qpos: jax.Array):
        fk_res = fklib.fk(self.model.spec, next_qpos)
        shape = next_qpos.shape[:-1]
        return TargetFrame(
            qpos=next_qpos,
            wbpos=fk_res.xpos.reshape(shape + (-1,)),
            body_com=fk_res.xipos.reshape(shape + (-1,)),
            wbquat=fk_res.xquat.reshape(shape + (-1,)),
        ), fk_res

    def cc_obs(self, sim: eng.SimState, target: TargetFrame, fk_res=None):
        if fk_res is None:
            fk_res = fklib.fk(self.model.spec, sim.qpos)
        obs = full_obs(self.cc_cfg, self.base_rot, sim, fk_res, target,
                       include_com=(self.cc_cfg.obs_v == 1))
        from kinpoly_tpu.rl import running_norm as rn
        return rn.apply(self.cc_norm, obs)

    # -- step -----------------------------------------------------------------

    def step(self, state: AREnvState, a: jax.Array, ctx=None, cc_params=None):
        """`cc_params` overrides the frozen UHC controller weights — used by
        joint_controller fine-tuning (kin_poly/core/agent_ar.py:749,774)."""
        spec = self.model.spec
        rng, k_cc = jax.random.split(state.rng)

        prev_sim = state.sim
        prev_bquat = state.prev_bquat
        prev_hpos = state.prev_hpos

        if self.policy_v == 2:
            next_qpos = a                       # action IS the next qpos
        else:
            next_qpos = step_ar(prev_sim.qpos, a, self.kin_cfg)
        next_qpos = self._sanitize_target(prev_sim.qpos, next_qpos)
        target, tgt_fk = self.target_frame(next_qpos)
        tgt_bquat = fklib.body_quat_sim(spec, next_qpos)

        cc_obs = self.cc_obs(prev_sim, target, fk_res=state.sim_fk)
        cc_mean, cc_log_std = self.cc_policy_apply(
            self.cc_policy_params if cc_params is None else cc_params, cc_obs)
        mean_action = self.mode == "test"
        if mean_action:
            cc_action = cc_mean
        else:
            cc_action = cc_mean + jnp.exp(cc_log_std) * jax.random.normal(
                k_cc, cc_mean.shape, cc_mean.dtype)

        if self.model.movable_objects:
            # objects live in the sim state (substep integrates them)
            obj_qpos = None
        elif self.model.scene is not None:
            obj_qpos = self.convert_obj_qpos(
                self._at(ctx, state, "action_one_hot", 0),
                self._at(ctx, state, "obj_pose", 0))
        else:
            obj_qpos = None
        sim = eng.control_step(self.model, prev_sim, cc_action,
                               next_qpos[..., 7:], self.base_rot,
                               obj_qpos=obj_qpos)
        # non-finite guard (see humanoid_im.step): snap to the AR target and
        # terminate instead of letting NaNs block the auto-reset
        bad = ~(jnp.isfinite(sim.qpos).all(axis=-1)
                & jnp.isfinite(sim.qvel).all(axis=-1))
        sim = sim._replace(
            qpos=jnp.where(bad[..., None], next_qpos, sim.qpos),
            qvel=jnp.where(bad[..., None], jnp.zeros_like(sim.qvel), sim.qvel))

        new_t = state.cur_t + 1
        c = self.clip(state, ctx)
        fk_cur = fklib.fk(spec, sim.qpos)
        cur_bquat = fklib.body_quat_sim(spec, sim.qpos)
        cur_wbpos = fk_cur.xpos

        reward, rinfo = self._reward(
            state, sim, fk_cur, cur_bquat, prev_bquat, prev_hpos,
            tgt_bquat, target, ctx, new_t)

        # termination (humanoid_ar_v1.py:295-308): sum-norm body diff
        diff = (cur_wbpos - target.wbpos.reshape(cur_wbpos.shape)) * self.jpos_diffw[:, None]
        body_diff = jnp.linalg.norm(diff, axis=-1).sum(axis=-1)
        fail = (body_diff > self.body_diff_thresh) | bad
        if self.mode == "train" and not self.wild:
            gt_wb = self._at(ctx, state, "gt_wbpos", new_t).reshape(cur_wbpos.shape)
            gt_diff = jnp.linalg.norm(
                (cur_wbpos - gt_wb) * self.jpos_diffw[:, None], axis=-1).sum(axis=-1)
            fail = fail | (gt_diff > self.body_diff_gt_thresh)

        end = (new_t >= self.env_episode_len) | (new_t >= c.length)
        done = fail | end
        percent = new_t.astype(sim.qpos.dtype) / c.length.astype(sim.qpos.dtype)

        new_state = state._replace(
            sim=sim, cur_t=new_t, prev_bquat=cur_bquat,
            prev_hpos=self._head_pose(fk_cur), target_qpos=next_qpos,
            done=done, fail=fail, rng=rng, sim_fk=fk_cur)
        obs = self.get_obs(new_state, ctx)
        info = dict(fail=fail, end=end, percent=percent,
                    cc_action=cc_action, cc_state=cc_obs, reward_info=rinfo)
        return new_state, obs, reward, done, info

    def _sanitize_target(self, prev_qpos: jax.Array,
                         next_qpos: jax.Array) -> jax.Array:
        """Keep the kinematic target finite and physical: an under-trained
        policy can emit extreme pose proposals whose FK overflows f32 and
        NaNs the whole step (see traj_ar.clamp_qpos)."""
        from kinpoly_tpu.models.traj_ar import clamp_qpos
        return clamp_qpos(self.model.spec, prev_qpos, next_qpos)

    def _head_pose(self, fk_res: fklib.FKResult):
        return jnp.concatenate(
            [fk_res.xpos[..., self.head_idx, :], fk_res.xquat[..., self.head_idx, :]],
            axis=-1)

    # -- reward dynamic_supervision_v1 (reward_function.py:931-996) ----------

    def _reward(self, state, sim, fk_cur, cur_bquat, prev_bquat, prev_hpos,
                tgt_bquat, target: TargetFrame, ctx, new_t):
        rw = self.rw
        dt = self.model.control_dt
        ind = new_t

        if rw.reward_id != "dynamic_supervision_v1":
            # registry dispatch (kin_poly/core/reward_function.py:1292-1313)
            import dataclasses

            from kinpoly_tpu.rl import rewards as rwlib

            fn = rwlib.get_kin_poly_reward(rw.reward_id)
            spec = self.model.spec
            cur_wbpos = fk_cur.xpos.reshape(sim.qpos.shape[:-1] + (-1,))
            ar_qpos = self._at(ctx, state, "ar_qpos", ind)
            ar_qpos_prev = self._at(ctx, state, "ar_qpos", jnp.maximum(ind - 1, 0))
            inp = rwlib.ARRewardInputs(
                head_pose=self._head_pose(fk_cur),
                tgt_head_pose=self._at(ctx, state, "head_pose", ind),
                bquat=cur_bquat,
                wbpos=cur_wbpos,
                tgt_bquat=tgt_bquat,
                tgt_wbpos=target.wbpos,
                gt_bquat=(gt_bq := self._at(ctx, state, "bquat", ind)),
                gt_prev_bquat=(gt_pbq := self._at(
                    ctx, state, "bquat", jnp.maximum(ind - 1, 0))),
                gt_wbpos=self._at(ctx, state, "gt_wbpos", ind),
                gt_bangvel=tmath.angvel_fd(gt_pbq, gt_bq, dt),
                bangvel=tmath.angvel_fd(prev_bquat, cur_bquat, dt),
                b_diffw=self.b_diffw,
                tgt_qpos=target.qpos,
                ar_qpos=ar_qpos,
                ar_bquat=fklib.body_quat_sim(spec, ar_qpos),
                ar_prev_bquat=fklib.body_quat_sim(spec, ar_qpos_prev),
                prev_bquat=prev_bquat,
            )
            ws = {f.name: getattr(rw, f.name) for f in dataclasses.fields(rw)}
            return fn(inp, ws, dt)

        tgt_hpose = self._at(ctx, state, "head_pose", ind)
        cur_hpose = self._head_pose(fk_cur)

        hp_dist = jnp.linalg.norm(cur_hpose[..., :3] - tgt_hpose[..., :3], axis=-1)
        hp_reward = jnp.exp(-rw.k_hp * hp_dist**2)

        hq_dist = multi_quat_norm_v2(
            tmath.quat_mul(cur_hpose[..., 3:], tmath.quat_inv(tgt_hpose[..., 3:]))
        ).mean(axis=-1)
        hq_reward = jnp.exp(-rw.k_hq * hq_dist**2)

        pose_quat_diff = multi_quat_norm_v2(
            tmath.multi_quat_diff(cur_bquat, tgt_bquat)).mean(axis=-1)
        cur_wbpos = fk_cur.xpos
        pose_pos_diff = jnp.linalg.norm(
            cur_wbpos - target.wbpos.reshape(cur_wbpos.shape), axis=-1).mean(axis=-1)
        p_reward = jnp.exp(-rw.k_p * pose_quat_diff**2)
        jp_reward = jnp.exp(-rw.k_jp * pose_pos_diff**2)

        gt_bquat = self._at(ctx, state, "bquat", ind)
        gt_prev_bquat = self._at(ctx, state, "bquat", jnp.maximum(ind - 1, 0))
        pose_gt_diff = multi_quat_norm_v2(
            tmath.multi_quat_diff(gt_bquat, cur_bquat)).mean(axis=-1)
        gt_p_reward = jnp.exp(-rw.k_act_p * pose_gt_diff)

        cur_bangvel = tmath.angvel_fd(prev_bquat, cur_bquat, dt)
        tgt_bangvel = tmath.angvel_fd(gt_prev_bquat, gt_bquat, dt)
        vel_dist = jnp.linalg.norm(cur_bangvel - tgt_bangvel, ord=rw.v_ord, axis=-1)
        act_v_reward = jnp.exp(-rw.k_act_v * vel_dist**2)

        reward = (rw.w_hp * hp_reward + rw.w_hq * hq_reward + rw.w_p * p_reward
                  + rw.w_jp * jp_reward + rw.w_act_p * gt_p_reward
                  + rw.w_act_v * act_v_reward)
        info = jnp.stack([hp_reward, hq_reward, p_reward, jp_reward,
                          gt_p_reward, act_v_reward], axis=-1)
        return reward, info

    # -- reset / fail-safe ----------------------------------------------------

    def reset(self, rng: jax.Array, clip_idx: jax.Array, ctx=None,
              ar_mode: bool = False):
        c = jax.tree.map(lambda x: x[clip_idx], self._ctx(ctx))
        if ar_mode:
            qpos0, qvel0 = c.ar_qpos[0], c.ar_qvel[0]
        else:
            qpos0, qvel0 = c.init_qpos, c.init_qvel
        if self.model.movable_objects:
            obj0 = self.convert_obj_qpos(c.action_one_hot[0], c.obj_pose[0])
            sim = eng.SimState(qpos=qpos0, qvel=qvel0, obj_qpos=obj0,
                               obj_qvel=jnp.zeros(obj0.shape[:-1] + (6,),
                                                  qpos0.dtype))
        else:
            sim = eng.SimState(qpos=qpos0, qvel=qvel0)
        fk0 = fklib.fk(self.model.spec, qpos0)
        state = AREnvState(
            sim=sim,
            cur_t=jnp.asarray(0, jnp.int32),
            prev_bquat=fklib.body_quat_sim(self.model.spec, qpos0),
            prev_hpos=self._head_pose(fk0),
            target_qpos=qpos0,
            clip_idx=jnp.asarray(clip_idx, jnp.int32),
            done=jnp.asarray(False),
            fail=jnp.asarray(False),
            rng=rng,
            sim_fk=fk0,
        )
        return state, self.get_obs(state, ctx)

    def convert_obj_qpos(self, action_one_hot: jax.Array,
                         obj_pose: jax.Array) -> jax.Array:
        """Place the action's active object at its context pose and park the
        others far away (humanoid_ar_v1.convert_obj_qpos:479-497). With a
        14-d obj_pose (push: box + table, reference action_len=[7,14,7,7])
        the secondary slot lands on the table body.
        Returns (..., n_obj, 7)."""
        n_obj = len(self.model.spec.objects)
        default = np.zeros((n_obj, 7))
        for i in range(n_obj):
            default[i, :3] = [(i + 1) * 100.0, 100.0, 0.0]
        default[:, 3] = 1.0
        out = jnp.broadcast_to(
            jnp.asarray(default, obj_pose.dtype),
            action_one_hot.shape[:-1] + (n_obj, 7))
        # action index -> object body index (humanoid_ar_v1.py
        # action_index_map maps into the flat obj qpos [0, 7, 21, 28])
        obj_of_action = self.obj_of_action
        has_action = jnp.sum(action_one_hot, axis=-1) > 0
        a_idx = jnp.argmax(action_one_hot, axis=-1)
        o_idx = obj_of_action[a_idx]
        placed = out.at[..., o_idx, :].set(obj_pose[..., :7])
        if obj_pose.shape[-1] >= 14 and n_obj > 2:
            # secondary slot (the push table; parked-table pose otherwise,
            # so the unconditional scatter is a no-op for other actions)
            names = [o.name for o in self.model.spec.objects]
            placed = placed.at[..., names.index("table"), :].set(
                obj_pose[..., 7:14])
        return jnp.where(has_action[..., None, None], placed, out)

    def ar_fail_safe(self, state: AREnvState, ctx=None) -> AREnvState:
        """Teleport the sim to the AR-predicted pose (humanoid_ar_v1.py:328);
        object state is left as simulated."""
        t = state.cur_t + 1
        qpos = self._at(ctx, state, "ar_qpos", t)
        return state._replace(
            sim=state.sim._replace(
                qpos=qpos, qvel=self._at(ctx, state, "ar_qvel", t)),
            sim_fk=fklib.fk(self.model.spec, qpos))

