"""Gradient-based rig conversion — the reference's
``uhc/data_process/grad_rig_conversion.py`` (torch Adam loop fitting MuJoCo
qpos to SMPL joint targets) rebuilt on the differentiable jnp FK: optimize a
whole qpos sequence at once on the accelerator.

fit_qpos solves   argmin_q  || FK(q).xpos - target_jpos ||^2
                + w_smooth  || q[1:] - q[:-1] ||^2
                + w_limit   (joint-range violation penalty)

with the root rotation parameterized by an exponential-map increment about
an initial quaternion (keeps the quat on the manifold without projection).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kinpoly_tpu.core import tmath
from kinpoly_tpu.physics import fk as fklib


class FitResult(NamedTuple):
    qpos: jax.Array      # (T, 76)
    loss: jax.Array      # final total loss
    jpos_err: jax.Array  # (T,) mean per-frame joint error (m)


def _safe_expmap_quat(e: jax.Array) -> jax.Array:
    """Like tmath.quat_from_expmap but with a NaN-free GRADIENT at e=0
    (the optimization initializes the root increment at exactly zero, where
    d||e||/de is undefined; sqrt(e.e + eps) regularizes the pullback)."""
    safe = jnp.sqrt(jnp.sum(e * e, axis=-1, keepdims=True) + 1e-16)
    half = 0.5 * safe
    return jnp.concatenate([jnp.cos(half), e * (jnp.sin(half) / safe)], axis=-1)


def _assemble(params, base_quat):
    trans, rot_exp, hinge = params
    quat = tmath.quat_norm(
        tmath.quat_mul(_safe_expmap_quat(rot_exp), base_quat))
    return jnp.concatenate([trans, quat, hinge], axis=-1)


def fit_qpos(spec, target_jpos: jax.Array, init_qpos: jax.Array | None = None,
             iters: int = 300, lr: float = 0.02, w_smooth: float = 1.0,
             w_limit: float = 10.0, joint_subset: np.ndarray | None = None
             ) -> FitResult:
    """target_jpos (T, 24, 3) world joint positions (spec body order, or a
    subset via joint_subset indices); returns the fitted qpos sequence."""
    T = target_jpos.shape[0]
    dtype = target_jpos.dtype
    if init_qpos is None:
        q0 = jnp.zeros((T, 76), dtype)
        q0 = q0.at[:, 2].set(0.92)
        q0 = q0.at[:, 3].set(0.5).at[:, 4].set(0.5).at[:, 5].set(0.5).at[:, 6].set(0.5)
    else:
        q0 = jnp.broadcast_to(jnp.asarray(init_qpos, dtype), (T, 76))

    base_quat = q0[:, 3:7]
    params = (q0[:, :3], jnp.zeros((T, 3), dtype), q0[:, 7:])
    lo = jnp.asarray(spec.jnt_range[:, 0], dtype)
    hi = jnp.asarray(spec.jnt_range[:, 1], dtype)
    sel = (np.arange(target_jpos.shape[1]) if joint_subset is None
           else np.asarray(joint_subset))

    def loss_fn(p):
        q = _assemble(p, base_quat)
        res = fklib.fk(spec, q)
        jp = res.xpos[:, sel]
        fit = jnp.mean(jnp.sum((jp - target_jpos) ** 2, axis=-1))
        smooth = jnp.mean(jnp.sum((q[1:] - q[:-1]) ** 2, axis=-1)) if T > 1 else 0.0
        h = p[2]
        viol = jnp.maximum(h - hi, 0.0) + jnp.maximum(lo - h, 0.0)
        limit = jnp.mean(jnp.sum(viol ** 2, axis=-1))
        return fit + w_smooth * smooth + w_limit * limit

    opt = optax.adam(lr)

    @jax.jit
    def run(params):
        state = opt.init(params)

        def step(carry, _):
            p, s = carry
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return (optax.apply_updates(p, u), s), l

        (p, _), losses = jax.lax.scan(step, (params, state), None, length=iters)
        q = _assemble(p, base_quat)
        res = fklib.fk(spec, q)
        err = jnp.linalg.norm(res.xpos[:, sel] - target_jpos, axis=-1).mean(-1)
        return q, losses[-1], err

    q, loss, err = run(params)
    return FitResult(qpos=q, loss=loss, jpos_err=err)
