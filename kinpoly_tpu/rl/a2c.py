"""A2C / vanilla policy-gradient update (reference
``uhc/khrylib/rl/agents/agent_pg.py``): one policy-gradient step on the
advantage-weighted log-likelihood plus an L2 value regression — the base
update PPO/TRPO specialise."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from kinpoly_tpu.models import nets


def a2c_update(policy_apply: Callable, value_apply: Callable,
               policy_opt, value_opt,
               policy_params, value_params, policy_opt_state, value_opt_state,
               obs, actions, advantages, returns, l2_reg: float = 0.0):
    def value_loss(vp):
        v = value_apply(vp, obs)
        loss = jnp.mean((v - returns) ** 2)
        if l2_reg:
            loss += l2_reg * sum(jnp.sum(x * x) for x in jax.tree.leaves(vp))
        return loss

    vl, vg = jax.value_and_grad(value_loss)(value_params)
    vu, value_opt_state = value_opt.update(vg, value_opt_state, value_params)
    value_params = optax.apply_updates(value_params, vu)

    def policy_loss(pp):
        mean, log_std = policy_apply(pp, obs)
        lp = nets.gaussian_log_prob(actions, mean, log_std)
        return -jnp.mean(lp * advantages)

    pl, pg = jax.value_and_grad(policy_loss)(policy_params)
    pu, policy_opt_state = policy_opt.update(pg, policy_opt_state, policy_params)
    policy_params = optax.apply_updates(policy_params, pu)

    return (policy_params, value_params, policy_opt_state, value_opt_state,
            dict(policy_loss=pl, value_loss=vl))
