"""On-device rollout for the recurrent kinematic policy (AgentAR.sample,
``kin_poly/core/agent_ar.py:510-600``, minus the 34 worker processes).

The policy GRU hidden lives in the rollout carry next to the env state; on
auto-reset (episode done) the hidden is zeroed and the env restarts on the
same context window (the reference samples a fresh window per episode; window
resampling here happens across iterations via the context bank refresh).

Records everything the composite update needs: obs/action/reward/mask plus
gt_next_qpos, curr_qpos (pre-step sim state), res_qpos (post-step), and the
UHC controller's obs/action (for joint controller fine-tuning).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kinpoly_tpu.models import nets


class ARTrajectory(NamedTuple):
    obs: jax.Array
    actions: jax.Array
    rewards: jax.Array
    masks: jax.Array
    log_probs: jax.Array
    gt_qpos: jax.Array       # GT next-frame qpos at each step
    curr_qpos: jax.Array     # sim qpos *before* the step (AR integrate base)
    res_qpos: jax.Array      # sim qpos after the step
    cc_action: jax.Array
    cc_state: jax.Array
    fails: jax.Array
    ends: jax.Array
    percents: jax.Array
    clips: jax.Array
    obj_qpos: jax.Array = None   # (N, n_obj, 7) simulated object poses
    #                              (movable-objects models only)


class ARRolloutState(NamedTuple):
    env_state: object
    obs: jax.Array
    gru: jax.Array          # (N, H) policy GRU carry
    rng: jax.Array


def make_ar_rollout(env, policy, n_steps: int, fail_safe: bool = False):
    """policy: models.policy_ar.PolicyAR. Returns
    rollout(carry, params, mean_action) -> (carry, ARTrajectory).

    fail_safe=True reproduces the reference eval semantics
    (eval_ar_policy.py:178-200): on tracking failure the sim teleports to
    the AR-predicted pose (env.ar_fail_safe) and the episode continues to
    the end of the clip; the teleports are recorded in `fails` and count
    against per-action success (eval_pose_all.py:459-460)."""

    def rollout(carry: ARRolloutState, params, ctx=None,
                mean_action: bool = True, cc_params=None):
        the_ctx = env.ctx if ctx is None else ctx
        v_step = jax.vmap(lambda s, a: env.step(s, a, the_ctx, cc_params))
        v_reset = jax.vmap(lambda k, i: env.reset(k, i, the_ctx))
        v_failsafe = jax.vmap(lambda s: env.ar_fail_safe(s, the_ctx))
        v_obs = jax.vmap(lambda s: env.get_obs(s, the_ctx))
        def step_fn(c: ARRolloutState, _):
            rng, k_act, k_reset = jax.random.split(c.rng, 3)
            gru, mean = policy.action_mean(params, c.gru, c.obs)
            log_std = jnp.full_like(mean, policy.log_std)
            if mean_action:
                # eval path only; TRAINING rollouts must sample (reference
                # agents/agent.py:22,53: noise_rate=1.0, mean_action=False)
                # or the PPO gradient is exactly zero — see ARTrainConfig
                action = mean
            else:
                action = mean + jnp.exp(log_std) * jax.random.normal(
                    k_act, mean.shape, mean.dtype)
            log_prob = nets.gaussian_log_prob(action, mean, log_std)

            t_next = jnp.minimum(c.env_state.cur_t + 1,
                                 the_ctx.qpos.shape[1] - 1)
            gt_qpos = the_ctx.qpos[c.env_state.clip_idx, t_next]
            curr_qpos = c.env_state.sim.qpos
            cur_clips = c.env_state.clip_idx

            env_state, obs, reward, done, info = v_step(c.env_state, action)

            if fail_safe:
                # teleport on failure, keep rolling; only clip end terminates
                fs = info["fail"] & ~info["end"]
                tele = v_failsafe(env_state)
                env_state = jax.tree.map(
                    lambda a, b: jnp.where(
                        fs.reshape((-1,) + (1,) * (a.ndim - 1)), b, a),
                    env_state, tele)
                obs = jnp.where(fs[:, None], v_obs(env_state), obs)
                done = info["end"]
                info = dict(info, fail=fs)

            reset_keys = jax.random.split(k_reset, mean.shape[0])
            reset_state, reset_obs = v_reset(reset_keys, cur_clips)
            env_state2 = jax.tree.map(
                lambda a, b: jnp.where(
                    done.reshape((-1,) + (1,) * (a.ndim - 1)), b, a),
                env_state, reset_state)
            next_obs = jnp.where(done[:, None], reset_obs, obs)
            gru = gru * (~done)[:, None].astype(gru.dtype)

            out = ARTrajectory(
                obs=c.obs, actions=action, rewards=reward,
                masks=(~done).astype(reward.dtype), log_probs=log_prob,
                gt_qpos=gt_qpos, curr_qpos=curr_qpos,
                res_qpos=env_state.sim.qpos,
                cc_action=info["cc_action"], cc_state=info["cc_state"],
                fails=info["fail"], ends=info["end"],
                percents=info["percent"], clips=cur_clips,
                obj_qpos=env_state.sim.obj_qpos,
            )
            return ARRolloutState(env_state=env_state2, obs=next_obs,
                                  gru=gru, rng=rng), out

        return jax.lax.scan(step_fn, carry, None, length=n_steps)

    return rollout


def init_ar_rollout_state(env, policy, rng, clip_indices, ctx=None) -> ARRolloutState:
    n = clip_indices.shape[0]
    rng, k = jax.random.split(rng)
    keys = jax.random.split(k, n)
    the_ctx = env.ctx if ctx is None else ctx
    env_state, obs = jax.vmap(lambda kk, i: env.reset(kk, i, the_ctx))(keys, clip_indices)
    return ARRolloutState(
        env_state=env_state, obs=obs,
        gru=policy.init_carry((n,), obs.dtype), rng=rng)
