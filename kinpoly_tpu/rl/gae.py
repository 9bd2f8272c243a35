"""Generalised advantage estimation (reference
``uhc/khrylib/rl/core/common.py:5-25``), restructured for fixed-shape
(T, N) on-device rollouts with masks and truncation bootstrap."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_advantages(rewards, masks, values, gamma: float, tau: float,
                        bootstrap_value=None, normalize: bool = True):
    """rewards/masks/values: (T, ...) arrays; masks[t] = 0 where the episode
    *terminated* at step t. `bootstrap_value` (...,) bootstraps the value of
    the state after the last step for truncated (mask=1) tails — the
    reference implicitly uses 0 there; bootstrapping is strictly less biased.

    Returns (advantages, returns), each (T, ...), with advantages normalised
    to zero mean / unit std over the whole batch (reference behaviour).
    """
    if bootstrap_value is None:
        bootstrap_value = jnp.zeros_like(values[-1])

    def step(carry, xs):
        prev_value, prev_adv = carry
        reward, mask, value = xs
        delta = reward + gamma * prev_value * mask - value
        adv = delta + gamma * tau * prev_adv * mask
        return (value, adv), adv

    (_, _), advantages = jax.lax.scan(
        step,
        (bootstrap_value, jnp.zeros_like(values[-1])),
        (rewards, masks, values),
        reverse=True,
    )
    returns = values + advantages
    if normalize:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
    return advantages, returns
