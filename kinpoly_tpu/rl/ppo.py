"""Clipped-surrogate PPO on-device (reference
``uhc/khrylib/rl/agents/agent_ppo.py:6-65`` + ``agent_pg.py``): same loss,
epochs/minibatching, and grad-norm clip 40 — restructured so the entire
update (all epochs x minibatches) runs in one jitted `lax.scan` with no
host round-trips."""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from kinpoly_tpu.models import nets


class PPOConfig(NamedTuple):
    clip_epsilon: float = 0.2
    num_optim_epoch: int = 10
    mini_batch_size: int = 32768
    policy_lr: float = 5e-5
    value_lr: float = 3e-4
    gamma: float = 0.95
    tau: float = 0.95
    l2_reg: float = 0.0
    max_grad_norm: float = 40.0


class TrainState(NamedTuple):
    policy_params: dict
    value_params: dict
    policy_opt: optax.OptState
    value_opt: optax.OptState


def make_optimizers(cfg: PPOConfig):
    # the policy lr is injected as a state hyperparameter so the adaptive
    # schedules (copycat_config.py:149-166) can change it between iterations
    # without recompiling (see set_policy_lr)
    pol = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                      optax.inject_hyperparams(optax.adam)(
                          learning_rate=cfg.policy_lr))
    val = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                      optax.adam(cfg.value_lr))
    return pol, val


def set_policy_lr(policy_opt_state, lr: float):
    """Overwrite the injected learning_rate in a policy optimizer state
    produced by make_optimizers."""
    clip_state, inj = policy_opt_state
    hp = dict(inj.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.asarray(
        hp["learning_rate"]).dtype)
    return (clip_state, inj._replace(hyperparams=hp))


def ppo_update(policy_apply: Callable, value_apply: Callable,
               cfg: PPOConfig, ts: TrainState, rng,
               obs, actions, advantages, returns, fixed_log_probs,
               policy_opt, value_opt, lr_mult: float = 1.0):
    """One full PPO update (epochs x shuffled minibatches) over a flat batch.

    obs (B, O), actions (B, A), advantages/returns/fixed_log_probs (B,).
    Returns new TrainState and a metrics dict.
    """
    B = obs.shape[0]
    mb = min(cfg.mini_batch_size, B)
    n_mb = max(B // mb, 1)

    def value_loss_fn(vp, o, ret):
        v = value_apply(vp, o)
        return jnp.mean((v - ret) ** 2)

    def policy_loss_fn(pp, o, a, adv, flp):
        mean, log_std = policy_apply(pp, o)
        log_probs = nets.gaussian_log_prob(a, mean, log_std)
        ratio = jnp.exp(log_probs - flp)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_epsilon, 1.0 + cfg.clip_epsilon) * adv
        return -jnp.mean(jnp.minimum(surr1, surr2))

    def minibatch_step(carry, idx):
        ts = carry
        o, a = obs[idx], actions[idx]
        adv, ret, flp = advantages[idx], returns[idx], fixed_log_probs[idx]

        vl, vg = jax.value_and_grad(value_loss_fn)(ts.value_params, o, ret)
        v_updates, v_opt = value_opt.update(vg, ts.value_opt, ts.value_params)
        value_params = optax.apply_updates(ts.value_params, jax.tree.map(lambda u: u * 1.0, v_updates))

        pl, pg = jax.value_and_grad(policy_loss_fn)(ts.policy_params, o, a, adv, flp)
        p_updates, p_opt = policy_opt.update(pg, ts.policy_opt, ts.policy_params)
        policy_params = optax.apply_updates(ts.policy_params, jax.tree.map(lambda u: u * lr_mult, p_updates))

        return TrainState(policy_params, value_params, p_opt, v_opt), (pl, vl)

    def epoch_step(ts, key):
        perm = jax.random.permutation(key, B)[: n_mb * mb].reshape(n_mb, mb)
        ts, losses = jax.lax.scan(minibatch_step, ts, perm)
        return ts, losses

    keys = jax.random.split(rng, cfg.num_optim_epoch)
    ts, losses = jax.lax.scan(epoch_step, ts, keys)
    pl, vl = losses
    return ts, {"policy_loss": pl.mean(), "value_loss": vl.mean()}
