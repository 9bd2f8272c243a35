"""TRPO update — natural gradient via conjugate gradient + backtracking line
search (reference ``uhc/khrylib/rl/agents/agent_trpo.py``; unused on the main
path but part of the RL-runtime inventory).

Everything is expressed with jax autodiff: Fisher-vector products come from
double-backward through the mean KL, so no flattening tricks are needed —
pytrees all the way down.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from kinpoly_tpu.models import nets


class TRPOConfig(NamedTuple):
    max_kl: float = 1e-2
    cg_iters: int = 10
    cg_damping: float = 1e-2
    ls_steps: int = 10
    accept_ratio: float = 0.1


def _dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _add(a, b, alpha=1.0):
    return jax.tree.map(lambda x, y: x + alpha * y, a, b)


def conjugate_gradient(avp: Callable, b, iters: int):
    x = jax.tree.map(jnp.zeros_like, b)
    r = b
    p = b
    rdotr = _dot(r, r)

    def body(_, carry):
        x, r, p, rdotr = carry
        Ap = avp(p)
        alpha = rdotr / _dot(p, Ap)
        x = _add(x, p, alpha)
        r = _add(r, Ap, -alpha)
        new_rdotr = _dot(r, r)
        beta = new_rdotr / rdotr
        p = _add(r, p, beta)
        return x, r, p, new_rdotr

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rdotr))
    return x


def trpo_update(policy_apply: Callable, cfg: TRPOConfig, params,
                obs, actions, advantages, fixed_log_probs):
    """One TRPO policy step; returns (new_params, info)."""

    # run the whole update in one float dtype (f64 under x64 testing, f32 on
    # TPU) so the CG/line-search carries keep stable types
    fdtype = jnp.result_type(float)
    params = jax.tree.map(lambda x: x.astype(fdtype), params)
    obs = obs.astype(fdtype)
    actions = actions.astype(fdtype)
    advantages = advantages.astype(fdtype)
    fixed_log_probs = fixed_log_probs.astype(fdtype)

    def surrogate(p):
        mean, log_std = policy_apply(p, obs)
        lp = nets.gaussian_log_prob(actions, mean, log_std)
        return -jnp.mean(jnp.exp(lp - fixed_log_probs) * advantages)

    mean0, log_std0 = policy_apply(params, obs)
    mean0 = jax.lax.stop_gradient(mean0)
    log_std0 = jax.lax.stop_gradient(log_std0)

    def mean_kl(p):
        mean, log_std = policy_apply(p, obs)
        return jnp.mean(nets.gaussian_kl(mean0, log_std0, mean, log_std))

    loss0, g = jax.value_and_grad(surrogate)(params)
    neg_g = jax.tree.map(lambda x: -x, g)

    def fvp(v):
        v = jax.tree.map(lambda t, p: t.astype(p.dtype), v, params)
        _, hvp = jax.jvp(jax.grad(mean_kl), (params,), (v,))
        return _add(hvp, v, cfg.cg_damping)

    stepdir = conjugate_gradient(fvp, neg_g, cfg.cg_iters)
    shs = 0.5 * _dot(stepdir, fvp(stepdir))
    lm = jnp.sqrt(jnp.maximum(shs / cfg.max_kl, 1e-12))
    fullstep = jax.tree.map(lambda x: x / lm, stepdir)
    expected = -_dot(g, fullstep)

    def ls_body(carry, frac):
        best_params, accepted = carry
        cand = _add(params, fullstep, frac)
        loss = surrogate(cand)
        kl = mean_kl(cand)
        improve = loss0 - loss
        ok = (improve / jnp.maximum(expected * frac, 1e-12) > cfg.accept_ratio) \
            & (kl < cfg.max_kl * 1.5) & (~accepted)
        best_params = jax.tree.map(
            lambda b, c: jnp.where(ok, c, b), best_params, cand)
        return (best_params, accepted | ok), ok

    fracs = 0.5 ** jnp.arange(cfg.ls_steps, dtype=jnp.float32)
    (new_params, accepted), _ = jax.lax.scan(ls_body, (params, jnp.asarray(False)), fracs)
    return new_params, dict(loss0=loss0, accepted=accepted, lm=lm)
