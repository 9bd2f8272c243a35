"""UHC motion-imitation environment (humanoid_im) as a pure function.

The reference ``uhc/envs/humanoid_im.py`` is an OO gym env around a live
MuJoCo sim; here it is a pytree-in/pytree-out step function over the batched
JAX engine, so `vmap(step)` runs thousands of humanoids per chip and the whole
rollout loop lives inside one jitted `lax.scan`.

Faithful ports (file:line cites into /root/reference):
- observation v1/v2 builders      humanoid_im.py:144-233, 240-317
- world_rfc_implicit reward       uhc/core/reward_function.py:4-54
- termination / episode end       humanoid_im.py:535-572
- reset with reactive init        humanoid_im.py:574-623
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath
from kinpoly_tpu.data import expert as exlib
from kinpoly_tpu.physics import engine as eng
from kinpoly_tpu.physics import fk as fklib


@dataclass(frozen=True)
class EnvConfig:
    obs_v: int = 1
    obs_coord: str = "root"
    obs_vel: str = "full"
    env_term_body: str = "body"
    body_diff_thresh: float = 0.5
    env_episode_len: int = 100000
    env_expert_trail_steps: int = 0
    env_init_noise: float = 0.0
    reactive_v: int = 1
    reactive_rate: float = 0.3
    base_rot: tuple = (0.7071, 0.7071, 0.0, 0.0)
    # reward selection + weights (uhc.yml:36-48; defaults for the extra
    # families from uhc/core/reward_function.py get() defaults)
    reward_id: str = "world_rfc_implicit"
    w_p: float = 0.3
    w_v: float = 0.1
    w_e: float = 0.45
    w_c: float = 0.1
    w_vf: float = 0.05
    k_p: float = 2.0
    k_v: float = 0.005
    k_e: float = 5.0
    k_c: float = 100.0
    k_vf: float = 1.0
    v_ord: int = 2
    # local_rfc_* root terms
    w_rp: float = 0.1
    w_rv: float = 0.1
    k_rh: float = 300.0
    k_rq: float = 300.0
    k_rl: float = 5.0
    k_ra: float = 0.5
    # *_explicit contact-point regularizer
    w_cp: float = 0.0
    k_cp: float = 1.0
    # v2/v3 world-quat/jpos terms
    w_wp: float = 0.4
    w_j: float = 100.0
    k_wp: float = 0.4
    k_j: float = 100.0


class TargetFrame(NamedTuple):
    """Everything the UHC observation needs about its tracking target."""
    qpos: jax.Array      # (..., 76)
    wbpos: jax.Array     # (..., 72)
    body_com: jax.Array  # (..., 72)
    wbquat: jax.Array    # (..., 96)


def full_obs(cfg: "EnvConfig", base_rot: jax.Array, sim: eng.SimState,
             fk_res: fklib.FKResult, tgt: TargetFrame, include_com: bool):
    """UHC observation v1 (with per-body CoM blocks) / v2 (without),
    replicating the reference quirks exactly: double root-frame transform of
    the linear velocity (humanoid_im.py:150+173) and 'rel_pos' computed from
    quaternion components (:187) — the trained policies saw these features.

    Standalone so the kinematic-policy env can reuse it with its AR-proposed
    target (humanoid_ar_v1.py get_cc_obs)."""
    qpos = sim.qpos
    qvel = sim.qvel

    def remove_base(q):
        return tmath.quat_mul(q, tmath.quat_conj(base_rot))

    lin = tmath.transform_vec(qvel[..., :3], qpos[..., 3:7], cfg.obs_coord)

    curr_root_quat = remove_base(qpos[..., 3:7])
    hq = tmath.heading_q(curr_root_quat)

    target_qpos = tgt.qpos
    target_root_quat = remove_base(target_qpos[..., 3:7])

    qpos_dh = jnp.concatenate(
        [qpos[..., :3], tmath.de_heading(curr_root_quat), qpos[..., 7:]], axis=-1
    )
    diff_rot = tmath.quat_mul(target_root_quat, tmath.quat_inv(curr_root_quat))
    diff_qpos = jnp.concatenate(
        [target_qpos[..., :2],
         target_qpos[..., 2:3] - qpos_dh[..., 2:3],
         diff_rot,
         target_qpos[..., 7:] - qpos_dh[..., 7:]], axis=-1
    )

    obs = [hq, target_qpos[..., 2:], qpos_dh[..., 2:], diff_qpos[..., 2:]]

    # velocity (the reference double-transforms the linear part)
    lin2 = tmath.transform_vec(lin, curr_root_quat, cfg.obs_coord)
    vel = jnp.concatenate([lin2, qvel[..., 3:]], axis=-1)
    obs.append(vel if cfg.obs_vel == "full" else vel[..., :6])

    rel_h = tmath.wrap_to_pi(tmath.heading(target_root_quat) - tmath.heading(curr_root_quat))
    obs.append(rel_h[..., None])

    # reference quirk: 'rel_pos' built from quat components (w, x) - xy pos
    rel_pos = target_root_quat[..., :3] - qpos[..., :3]
    rel_pos = tmath.transform_vec(rel_pos, curr_root_quat, cfg.obs_coord)
    obs.append(rel_pos[..., :2])

    curr_jpos = fk_res.xpos
    r_jpos = curr_jpos - qpos[..., None, :3]
    r_jpos = tmath.transform_vec(r_jpos, curr_root_quat[..., None, :], cfg.obs_coord)
    obs.append(r_jpos.reshape(qpos.shape[:-1] + (-1,)))

    target_jpos = tgt.wbpos.reshape(qpos.shape[:-1] + (24, 3))
    diff_jpos = target_jpos - curr_jpos
    diff_jpos = tmath.transform_vec(diff_jpos, curr_root_quat[..., None, :], cfg.obs_coord)
    obs.append(diff_jpos.reshape(qpos.shape[:-1] + (-1,)))

    if include_com:
        curr_com = fk_res.xipos
        r_com = curr_com - qpos[..., None, :3]
        r_com = tmath.transform_vec(r_com, curr_root_quat[..., None, :], cfg.obs_coord)
        obs.append(r_com.reshape(qpos.shape[:-1] + (-1,)))
        target_com = tgt.body_com.reshape(qpos.shape[:-1] + (24, 3))
        diff_com = target_com - curr_com
        diff_com = tmath.transform_vec(diff_com, curr_root_quat[..., None, :], cfg.obs_coord)
        obs.append(diff_com.reshape(qpos.shape[:-1] + (-1,)))

    cur_quat = fk_res.xquat
    r_quat = tmath.quat_mul(tmath.quat_inv(hq)[..., None, :], cur_quat)
    obs.append(r_quat.reshape(qpos.shape[:-1] + (-1,)))

    target_quat = tgt.wbquat.reshape(qpos.shape[:-1] + (24, 4))
    rel_quat = tmath.quat_mul(tmath.quat_inv(cur_quat), target_quat)
    obs.append(rel_quat.reshape(qpos.shape[:-1] + (-1,)))

    return jnp.concatenate(obs, axis=-1)


class EnvState(NamedTuple):
    sim: eng.SimState
    cur_t: jax.Array          # int32
    start_ind: jax.Array      # int32
    prev_bquat: jax.Array     # (96,)
    clip_idx: jax.Array       # int32 (index into the expert bank)
    done: jax.Array           # bool
    fail: jax.Array           # bool
    rng: jax.Array


class HumanoidImEnv:
    """Stateless env namespace bound to (physics model, config, expert bank,
    neutral standing pose). All methods are pure and jit/vmap-safe; `self`
    only holds static host-side data."""

    def __init__(self, model: eng.PhysicsModel, cfg: EnvConfig,
                 bank: exlib.ExpertClip, neutral_qpos: np.ndarray,
                 neutral_qvel: np.ndarray, mode: str = "train",
                 hard_states: tuple | None = None):
        self.model = model
        self.cfg = cfg
        self.bank = bank
        self.mode = mode
        # (qpos (K, 76), qvel (K, 75)) hard-negative init bank (reactive_v=2)
        self.hard_states = (tuple(jnp.asarray(x) for x in hard_states)
                            if hard_states is not None else None)
        self.neutral_qpos = jnp.asarray(neutral_qpos)
        self.neutral_qvel = jnp.asarray(neutral_qvel)
        # f32 explicitly: under x64 a python-float tuple becomes f64
        # and silently promotes the whole physics chain when the env
        # data is f32 (scan carry dtype mismatch)
        self.base_rot = jnp.asarray(cfg.base_rot, jnp.float32)
        spec = model.spec
        self.head_idx = spec.body_index("Head")
        self.ee_idx = fklib.make_body_index(spec, exlib.EE_NAMES)
        from kinpoly_tpu.config.defaults import b_diff_weights_pose, body_diff_weights
        self.jpos_diffw = jnp.asarray(body_diff_weights(spec))
        self.b_diffw = jnp.asarray(b_diff_weights_pose(spec))
        # from the control params, so explicit-RFC layouts (per-body wrench
        # blocks) size the action correctly (reference humanoid_im.py:71-89)
        self.vf_dim = model.ctrl.vf_dim
        self.action_dim = 69 + self.vf_dim + (2 * model.n_substeps if model.ctrl.meta_pd else 0)

    # -- expert access -----------------------------------------------------

    def expert(self, state: EnvState) -> exlib.ExpertClip:
        return exlib.index_clip(self.bank, state.clip_idx)

    def expert_frame(self, state: EnvState, delta_t: int = 0) -> exlib.ExpertClip:
        # fused bank gather (see exlib.bank_frame: avoids an XLA:TPU chained
        # dynamic-gather miscompile under vmap)
        return exlib.bank_frame(self.bank, state.clip_idx,
                                state.start_ind + state.cur_t + delta_t)

    # -- observation -------------------------------------------------------

    def remove_base_rot(self, quat):
        return tmath.quat_mul(quat, tmath.quat_conj(self.base_rot))

    def get_obs(self, state: EnvState, fk_res: fklib.FKResult | None = None):
        if fk_res is None:
            fk_res = fklib.fk(self.model.spec, state.sim.qpos)
        tgt = self.expert_frame(state, delta_t=1)
        target = TargetFrame(qpos=tgt.qpos, wbpos=tgt.wbpos,
                             body_com=tgt.body_com, wbquat=tgt.wbquat)
        if self.cfg.obs_v == 1:
            return full_obs(self.cfg, self.base_rot, state.sim, fk_res, target,
                            include_com=True)
        elif self.cfg.obs_v == 2:
            return full_obs(self.cfg, self.base_rot, state.sim, fk_res, target,
                            include_com=False)
        raise ValueError(f"obs_v {self.cfg.obs_v}")

    # -- reward (registry dispatch, uhc/core/reward_function.py:453-461) ----

    def reward(self, state: EnvState, next_sim: eng.SimState, action,
               fk_res: fklib.FKResult):
        import dataclasses

        from kinpoly_tpu.rl import rewards as rwlib

        cfg = self.cfg
        spec = self.model.spec
        e = self.expert_frame(state)  # reward indexes expert at cur_t (post-increment)
        dt = self.model.control_dt
        rid = cfg.reward_id
        fn = rwlib.get_uhc_reward(rid)

        cur_bquat = fklib.body_quat_sim(spec, next_sim.qpos)
        kw = dict(
            bquat=cur_bquat,
            wbquat=fk_res.xquat.reshape(next_sim.qpos.shape[:-1] + (-1,)),
            wbpos=fk_res.xpos.reshape(next_sim.qpos.shape[:-1] + (-1,)),
            body_com=fk_res.xipos.reshape(next_sim.qpos.shape[:-1] + (-1,)),
            com=fklib.com(spec, fk_res),
            ee_wpos=exlib.ee_world(spec, fk_res, self.ee_idx),
            bangvel=tmath.angvel_fd(state.prev_bquat, cur_bquat, dt),
            head_pose=None,
            e_bquat=e.bquat, e_wbquat=e.wbquat, e_wbpos=e.wbpos,
            e_body_com=e.body_com, e_com=e.com, e_ee_wpos=e.ee_wpos,
            e_bangvel=e.bangvel,
            vf=action[..., 69:69 + self.vf_dim],
            b_diffw=self.b_diffw,
            jpos_diffw=self.jpos_diffw,
        )
        if rid.startswith("local_") or rid in rwlib.NEEDS_LOCAL_IDS:
            # fd velocities of the *simulated* transition (reference computes
            # them from prev_qpos -> cur_qpos, reward_function.py:188-193)
            cur_qvel = tmath.qvel_fd(state.sim.qpos, next_sim.qpos, dt)
            kw.update(
                qpos=next_sim.qpos,
                rq_rmh=tmath.de_heading(next_sim.qpos[..., 3:7]),
                # obs_coord-transform like the expert feature (data/expert.py)
                # and the reference reward side (reward_function.py:188 calls
                # get_qvel_fd_new(prev, cur, dt, cfg.obs_coord), which rotates
                # v by the transition's source-frame root quat)
                rlinv_local=tmath.transform_vec(
                    cur_qvel[..., :3], state.sim.qpos[..., 3:7], cfg.obs_coord),
                rlinv=cur_qvel[..., :3],
                e_rlinv=e.rlinv,
                rangv=cur_qvel[..., 3:6],
                ee_pos=exlib.ee_in_root(spec, fk_res, next_sim.qpos,
                                        self.ee_idx, cfg.obs_coord),
                e_qpos=e.qpos, e_rq_rmh=e.rq_rmh,
                e_rlinv_local=e.rlinv_local, e_rangv=e.rangv,
                e_ee_pos=e.ee_pos,
            )
        if rid.endswith("_explicit"):
            c = self.model.ctrl
            d = c.body_vf_dim
            v = kw["vf"].reshape(kw["vf"].shape[:-1] + (len(c.vf_bodies), d))
            kw.update(vf_cp=v[..., :3], vf_force=v[..., 3:])
        ws = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
        return fn(rwlib.RewardInputs(**kw), ws)

    # -- termination ---------------------------------------------------------

    def calc_body_diff(self, state: EnvState, fk_res: fklib.FKResult):
        e = self.expert_frame(state)
        cur = fk_res.xpos
        ref = e.wbpos.reshape(cur.shape[:-2] + (24, 3))
        diff = (cur - ref) * self.jpos_diffw[:, None]
        return jnp.linalg.norm(diff, axis=-1).mean(axis=-1)

    # -- step / reset ---------------------------------------------------------

    def step(self, state: EnvState, action: jax.Array):
        cfg = self.cfg
        spec = self.model.spec

        tgt = self.expert_frame(state, delta_t=1)
        next_sim = eng.control_step(self.model, state.sim, action,
                                    tgt.qpos[..., 7:], self.base_rot)
        # non-finite guard (reference humanoid_im.py:526-529 catches MuJoCo
        # instabilities): a blown-up env is snapped back to the expert frame
        # and terminated, so NaNs can never poison the batch or block resets
        bad = ~(jnp.isfinite(next_sim.qpos).all(axis=-1)
                & jnp.isfinite(next_sim.qvel).all(axis=-1))
        safe = self.expert_frame(state, delta_t=0)
        next_sim = eng.SimState(
            qpos=jnp.where(bad[..., None], safe.qpos, next_sim.qpos),
            qvel=jnp.where(bad[..., None], safe.qvel, next_sim.qvel))
        fk_res = fklib.fk(spec, next_sim.qpos)

        new_t = state.cur_t + 1
        mid = state._replace(sim=next_sim, cur_t=new_t)

        reward, rinfo = self.reward(state._replace(cur_t=new_t, sim=next_sim),
                                    next_sim, action, fk_res)

        clip = self.expert(state)
        if cfg.env_term_body == "body":
            body_diff = self.calc_body_diff(mid, fk_res)
            fail = body_diff > cfg.body_diff_thresh
        elif cfg.env_term_body == "Head":
            head_z = fk_res.xpos[..., self.head_idx, 2]
            fail = head_z < clip.head_height_lb - 0.1
        else:
            fail = next_sim.qpos[..., 2] < clip.height_lb - 0.1
        fail = fail | bad

        end = (new_t >= cfg.env_episode_len) | (
            new_t + state.start_ind >= clip.length + cfg.env_expert_trail_steps
        )
        done = fail | end
        percent = new_t.astype(next_sim.qpos.dtype) / clip.length.astype(next_sim.qpos.dtype)

        new_bquat = fklib.body_quat_sim(spec, next_sim.qpos)
        new_state = mid._replace(prev_bquat=new_bquat, done=done, fail=fail)
        obs = self.get_obs(new_state, fk_res)
        info = dict(fail=fail, end=end, percent=percent, reward_info=rinfo)
        return new_state, obs, reward, done, info

    def reset(self, rng: jax.Array, clip_idx: jax.Array, start_ind=0,
              deterministic: bool = False):
        """`deterministic=True` starts exactly from the expert frame (eval
        semantics: the reference's test-mode reset skips reactive init and
        noise, humanoid_im.py:590-595)."""
        cfg = self.cfg
        f0 = exlib.bank_frame(self.bank, clip_idx, jnp.asarray(start_ind, jnp.int32))
        rng, k1, k2, k3 = jax.random.split(rng, 4)

        init_qpos = f0.qpos
        init_qvel = f0.qvel
        if deterministic:
            sim = eng.SimState(qpos=init_qpos, qvel=init_qvel)
            state = EnvState(
                sim=sim, cur_t=jnp.asarray(0, jnp.int32),
                start_ind=jnp.asarray(start_ind, jnp.int32),
                prev_bquat=fklib.body_quat_sim(self.model.spec, init_qpos),
                clip_idx=jnp.asarray(clip_idx, jnp.int32),
                done=jnp.asarray(False), fail=jnp.asarray(False), rng=rng)
            return state, self.get_obs(state)
        if cfg.env_init_noise > 0:
            noise = cfg.env_init_noise * jax.random.normal(k1, init_qpos[..., 7:].shape,
                                                           init_qpos.dtype)
            init_qpos = init_qpos.at[..., 7:].add(noise)

        if cfg.reactive_v == 1 and self.mode == "train":
            # with prob reactive_rate start from neutral standing matched to
            # the expert's heading/xy (humanoid_im.py:586-599)
            use_neutral = jax.random.bernoulli(k2, cfg.reactive_rate)
            neutral = self.match_heading_and_pos(init_qpos, self.neutral_qpos.astype(init_qpos.dtype))
            init_qpos = jnp.where(use_neutral, neutral, init_qpos)
            init_qvel = jnp.where(use_neutral, self.neutral_qvel.astype(init_qvel.dtype), init_qvel)
        elif cfg.reactive_v == 2 and self.mode == "train" and \
                self.hard_states is not None:
            # hard-negative init states harvested from failed rollouts
            # (reference uhc/data_process/gen_states.py; scripts/gen_states.py
            # produces the bank) matched to the expert's heading/xy
            use_hard = jax.random.bernoulli(k2, cfg.reactive_rate)
            hq, hv = self.hard_states
            rng, k4 = jax.random.split(rng)
            idx = jax.random.randint(k4, (), 0, hq.shape[0])
            hard = self.match_heading_and_pos(
                init_qpos, hq[idx].astype(init_qpos.dtype))
            init_qpos = jnp.where(use_hard, hard, init_qpos)
            init_qvel = jnp.where(use_hard, hv[idx].astype(init_qvel.dtype),
                                  init_qvel)

        sim = eng.SimState(qpos=init_qpos, qvel=init_qvel)
        state = EnvState(
            sim=sim,
            cur_t=jnp.asarray(0, jnp.int32),
            start_ind=jnp.asarray(start_ind, jnp.int32),
            prev_bquat=fklib.body_quat_sim(self.model.spec, init_qpos),
            clip_idx=jnp.asarray(clip_idx, jnp.int32),
            done=jnp.asarray(False),
            fail=jnp.asarray(False),
            rng=k3,
        )
        return state, self.get_obs(state)

    def match_heading_and_pos(self, qpos_1, qpos_2):
        """Graft qpos_1's xy position + heading onto pose qpos_2
        (humanoid_im.py:636-644)."""
        q1 = self.remove_base_rot(qpos_1[..., 3:7])
        heading_1 = tmath.heading_q(q1)
        new_rot = tmath.quat_mul(heading_1, tmath.de_heading(qpos_2[..., 3:7]))
        return jnp.concatenate(
            [qpos_1[..., :2], qpos_2[..., 2:3], new_rot, qpos_2[..., 7:]], axis=-1
        )

    def fail_safe(self, state: EnvState) -> EnvState:
        """Teleport the sim to the expert pose (humanoid_im.py:235)."""
        f = self.expert_frame(state)
        return state._replace(sim=eng.SimState(qpos=f.qpos, qvel=f.qvel))
