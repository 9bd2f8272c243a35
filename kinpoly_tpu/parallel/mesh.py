"""Device-mesh sharding for training — replaces the reference's fork-based
CPU workers + single-GPU updates (SURVEY §2.8) with SPMD over ICI.

Sharding layout for this workload (policies are ~5 M params; the scaling
axis is *simulation throughput*):

- env batch: sharded over the mesh 'dp' axis (each chip steps N/n_dp
  humanoids; physics is embarrassingly parallel)
- params / optimizer state: replicated; gradients reduced with psum over
  'dp' inside the update step
- running-norm statistics: (count, mean, m2) merged with psum (Chan merge
  is associative)

`train_step_dp` wraps a per-shard train iteration with shard_map so XLA
emits the psum collectives on ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n and jax.default_backend() == "cpu":
        # dryrun case only: the default backend already is CPU, so widen onto
        # the virtual host devices (xla_force_host_platform_device_count).
        # On an accelerator backend a too-wide mesh must fail loudly instead
        # of silently moving the whole job to CPU.
        devs = jax.devices("cpu")
    if len(devs) < n:
        raise ValueError(
            f"need {n} devices for the mesh, have {len(devs)} "
            f"(set --xla_force_host_platform_device_count)")
    return Mesh(np.asarray(devs[:n]), (axis,))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Shard leading batch dim over the mesh axis; leaves whose dim0 is not
    divisible by the axis size (e.g. PRNG keys, scalars) are replicated."""
    n = mesh.shape[axis]

    def put(x):
        ndim = getattr(x, "ndim", 0)
        divisible = ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0
        spec = P(axis) if divisible else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def psum_tree(tree, axis: str):
    return jax.tree.map(lambda x: jax.lax.psum(x, axis), tree)


def pmean_tree(tree, axis: str):
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis), tree)
