"""Running observation normalisation — the reference ZFilter
(``uhc/khrylib/utils/zfilter.py:7-73``) as a pure carried state.

Welford-style accumulation, merged across env/device batches with a single
`psum`-friendly (count, mean, M2) reduction instead of per-step pushes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RunningNorm(NamedTuple):
    count: jax.Array   # () float
    mean: jax.Array    # (d,)
    m2: jax.Array      # (d,) sum of squared deviations


def init(dim: int, dtype=jnp.float32) -> RunningNorm:
    return RunningNorm(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
    )


def update_batch(rn: RunningNorm, x: jax.Array) -> RunningNorm:
    """Fold a batch x (..., d) into the running stats (Chan parallel merge)."""
    flat = x.reshape(-1, x.shape[-1])
    n_b = jnp.asarray(flat.shape[0], rn.count.dtype)
    mean_b = flat.mean(axis=0)
    m2_b = jnp.sum((flat - mean_b) ** 2, axis=0)

    n = rn.count + n_b
    delta = mean_b - rn.mean
    mean = rn.mean + delta * n_b / jnp.maximum(n, 1.0)
    m2 = rn.m2 + m2_b + delta**2 * rn.count * n_b / jnp.maximum(n, 1.0)
    return RunningNorm(count=n, mean=mean, m2=m2)


def std(rn: RunningNorm) -> jax.Array:
    return jnp.sqrt(jnp.maximum(rn.m2 / jnp.maximum(rn.count - 1.0, 1.0), 1e-12))


def apply(rn: RunningNorm, x: jax.Array, demean: bool = True, destd: bool = True,
          clip: float = 5.0) -> jax.Array:
    """Normalise x with current stats (ZFilter semantics: clip +-5)."""
    y = x
    if demean:
        y = y - rn.mean
    if destd:
        y = y / (std(rn) + 1e-8)
    if clip:
        y = jnp.clip(y, -clip, clip)
    return y
