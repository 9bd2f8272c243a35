"""On-device batched rollout — the TPU-native replacement for the reference's
35 fork()ed CPU sampler processes (``uhc/khrylib/rl/agents/agent.py:107-131``).

N envs step in lockstep inside one jitted `lax.scan`; policy apply, physics,
reward, termination and auto-reset all fuse into a single XLA program. Clip
selection on auto-reset samples from a device-side categorical whose
probabilities implement the reference's adaptive hard-sequence mining
(``dataset_amass_single.py:162-181``) — the probs are refreshed host-side
once per iteration.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from kinpoly_tpu.models import nets
from kinpoly_tpu.rl import running_norm as rn


class Trajectory(NamedTuple):
    """(T, N, ...) stacked rollout tensors (the reference TrajBatch)."""
    obs: jax.Array          # normalized obs as seen by the policy
    actions: jax.Array
    rewards: jax.Array
    masks: jax.Array        # 0 where episode terminated at this step
    exps: jax.Array         # 1 where action was stochastic (reference 'exp' flag)
    log_probs: jax.Array
    raw_obs: jax.Array      # un-normalized (for running-norm updates)
    fails: jax.Array
    ends: jax.Array
    percents: jax.Array     # episode progress fraction at each step
    clips: jax.Array        # clip index the env was tracking (int32)
    reward_info: jax.Array  # per-component reward decomposition (LoggerRL avg_c_info)
    # post-step sim state (XLA dead-code-eliminates these when the consumer
    # ignores them; gen_states harvests failure states from them)
    qpos: jax.Array = None
    qvel: jax.Array = None


class RolloutState(NamedTuple):
    env_state: object       # batched EnvState pytree
    obs: jax.Array          # (N, O) raw obs
    rng: jax.Array


def make_rollout(env, policy_apply: Callable, n_steps: int,
                 noise_rate: float = 1.0):
    """Returns `rollout(carry, policy_params, norm, clip_probs, mean_action)`
    -> (new_carry, Trajectory). Pure; wrap in jit/shard_map outside."""

    v_step = jax.vmap(env.step)
    v_reset = jax.vmap(env.reset)

    def rollout(carry: RolloutState, policy_params, norm: rn.RunningNorm,
                clip_probs: jax.Array, mean_action: bool = False,
                noise_rate_t=None):
        """`noise_rate_t` (traced scalar) overrides the construction-time
        noise rate — used by the adaptive schedules
        (copycat_config.py:149-166)."""
        nr = noise_rate if noise_rate_t is None else noise_rate_t

        def step_fn(c: RolloutState, _):
            rng, k_act, k_noise, k_clip, k_reset = jax.random.split(c.rng, 5)
            obs_n = rn.apply(norm, c.obs)
            mean, log_std = policy_apply(policy_params, obs_n)
            n_envs = mean.shape[0]
            if mean_action:
                use_mean = jnp.ones((n_envs,), bool)
            else:
                use_mean = ~jax.random.bernoulli(k_noise, nr, (n_envs,))
            noise = jax.random.normal(k_act, mean.shape, mean.dtype)
            action = mean + jnp.where(use_mean[:, None], 0.0, 1.0) * jnp.exp(log_std) * noise
            log_prob = nets.gaussian_log_prob(action, mean, log_std)

            cur_clips = c.env_state.clip_idx
            env_state, obs, reward, done, info = v_step(c.env_state, action)
            # capture the post-step state BEFORE auto-reset overwrites
            # terminated envs (gen_states wants the failure states)
            sim_qpos, sim_qvel = env_state.sim.qpos, env_state.sim.qvel

            # auto-reset terminated envs with freshly sampled clips
            new_clips = jax.random.categorical(
                k_clip, jnp.log(clip_probs + 1e-12), shape=(n_envs,)
            )
            reset_keys = jax.random.split(k_reset, n_envs)
            reset_state, reset_obs = v_reset(reset_keys, new_clips)
            env_state = jax.tree.map(
                lambda a, b: jnp.where(
                    done.reshape((-1,) + (1,) * (a.ndim - 1)), b, a
                ),
                env_state, reset_state,
            )
            next_obs = jnp.where(done[:, None], reset_obs, obs)

            out = Trajectory(
                obs=obs_n, actions=action, rewards=reward,
                masks=(~done).astype(reward.dtype),
                exps=(~use_mean).astype(reward.dtype),
                log_probs=log_prob, raw_obs=c.obs,
                fails=info["fail"], ends=info["end"],
                percents=info["percent"], clips=cur_clips,
                reward_info=info["reward_info"],
                qpos=sim_qpos, qvel=sim_qvel,
            )
            return RolloutState(env_state=env_state, obs=next_obs, rng=rng), out

        return jax.lax.scan(step_fn, carry, None, length=n_steps)

    return rollout


def init_rollout_state(env, rng, n_envs: int, clip_probs) -> RolloutState:
    rng, k_clip, k_reset = jax.random.split(rng, 3)
    clips = jax.random.categorical(k_clip, jnp.log(clip_probs + 1e-12), shape=(n_envs,))
    keys = jax.random.split(k_reset, n_envs)
    env_state, obs = jax.vmap(env.reset)(keys, clips)
    return RolloutState(env_state=env_state, obs=obs, rng=rng)
