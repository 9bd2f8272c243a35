"""Core networks: MLP, value, diagonal-Gaussian policy, MCP policy.

Flax/linen ports of the reference model zoo
(``uhc/khrylib/models/mlp.py``, ``uhc/khrylib/rl/core/{policy_gaussian,
critic,distributions}.py``, ``uhc/core/policy_mcp.py``) — same architectures
and distribution semantics, idiomatic JAX parameterisation (pytrees in,
pytrees out; sampling via explicit PRNG keys).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACT = {
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "gelu": nn.gelu,
}


class MLP(nn.Module):
    hidden: Sequence[int]
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = _ACT[self.activation](nn.Dense(h)(x))
        return x


class Value(nn.Module):
    """MLP + scalar head (uhc/khrylib/rl/core/critic.py:5)."""
    hidden: Sequence[int] = (512, 256)
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = MLP(self.hidden, self.activation)(x)
        return nn.Dense(1)(x)[..., 0]


class PolicyGaussian(nn.Module):
    """MLP -> mean; learnable or fixed log_std
    (uhc/khrylib/rl/core/policy_gaussian.py:7)."""
    action_dim: int
    hidden: Sequence[int] = (512, 256)
    activation: str = "relu"
    log_std_init: float = -2.3
    fix_std: bool = True

    @nn.compact
    def __call__(self, x):
        h = MLP(self.hidden, self.activation)(x)
        mean = nn.Dense(self.action_dim)(h)
        if self.fix_std:
            log_std = jnp.full_like(mean, self.log_std_init)
        else:
            log_std = self.param(
                "log_std",
                lambda k: jnp.full((self.action_dim,), self.log_std_init,
                                   jnp.float32),
            )
            log_std = jnp.broadcast_to(log_std, mean.shape)
        return mean, log_std


class _PrimitiveBank(nn.Module):
    """All P primitive MLPs evaluated as one batched contraction: weights are
    stacked (P, in, out) so each layer is a single einsum that tiles the MXU,
    instead of P small sequential matmuls."""
    num_primitive: int
    hidden: Sequence[int]
    action_dim: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        h = jnp.broadcast_to(x[..., None, :],
                             x.shape[:-1] + (self.num_primitive, x.shape[-1]))
        act = _ACT[self.activation]
        for out in tuple(self.hidden) + (self.action_dim,):
            # dtype pinned: flax initializer default is jnp.float_ which is
            # f64 under x64 and would silently promote every apply
            w = self.param(
                f"w_{out}_{h.shape[-1]}",
                nn.initializers.lecun_normal(batch_axis=(0,)),
                (self.num_primitive, h.shape[-1], out), jnp.float32)
            b = self.param(f"b_{out}_{h.shape[-1]}", nn.initializers.zeros,
                           (self.num_primitive, out), jnp.float32)
            h = jnp.einsum("...pi,pio->...po", h, w) + b
            if out != self.action_dim:
                h = act(h)
        return h                                             # (..., P, A)


class PolicyMCP(nn.Module):
    """Multiplicative compositional policy: N primitive MLP heads + a softmax
    composer over primitives; mean = sum_i w_i mu_i (uhc/core/policy_mcp.py:9,
    used by UHC with actor_type 'mcp', num_primitive 8). Primitives run as a
    fused weight bank (one einsum per layer)."""
    action_dim: int
    num_primitive: int = 8
    hidden: Sequence[int] = (512, 256)
    composer_hidden: Sequence[int] = (300, 200)
    activation: str = "relu"
    log_std_init: float = -2.3
    fix_std: bool = True

    @nn.compact
    def __call__(self, x):
        prims = _PrimitiveBank(self.num_primitive, self.hidden,
                               self.action_dim, self.activation)(x)
        w = MLP(self.composer_hidden, self.activation)(x)
        w = nn.softmax(nn.Dense(self.num_primitive)(w), axis=-1)
        mean = jnp.einsum("...p,...pa->...a", w, prims)
        if self.fix_std:
            log_std = jnp.full_like(mean, self.log_std_init)
        else:
            log_std = self.param(
                "log_std",
                lambda k: jnp.full((self.action_dim,), self.log_std_init,
                                   jnp.float32),
            )
            log_std = jnp.broadcast_to(log_std, mean.shape)
        return mean, log_std


# ---------------------------------------------------------------------------
# diagonal Gaussian distribution ops (uhc/khrylib/rl/core/distributions.py)
# ---------------------------------------------------------------------------


def gaussian_sample(rng, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(rng, mean.shape, mean.dtype)


def gaussian_log_prob(x, mean, log_std):
    var = jnp.exp(2.0 * log_std)
    lp = -((x - mean) ** 2) / (2 * var) - 0.5 * jnp.log(2 * jnp.pi).astype(x.dtype) - log_std
    return jnp.sum(lp, axis=-1)


def gaussian_kl(mean0, log_std0, mean1, log_std1):
    """KL(p0 || p1), summed over action dims."""
    var0, var1 = jnp.exp(2 * log_std0), jnp.exp(2 * log_std1)
    kl = log_std1 - log_std0 + (var0 + (mean0 - mean1) ** 2) / (2 * var1) - 0.5
    return jnp.sum(kl, axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + log_std, axis=-1)
