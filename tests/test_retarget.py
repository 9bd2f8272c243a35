"""Gradient rig conversion (anim/retarget.py): fitting qpos to FK joint
targets recovers the joint positions (reference grad_rig_conversion.py)."""

import jax
import jax.numpy as jnp
import joblib
import numpy as np

from kinpoly_tpu.anim import retarget
from kinpoly_tpu.physics import fk as fklib
from tests.mj_oracle import get_spec

STANDING = "/root/reference/sample_data/standing_neutral.pkl"


def test_fit_recovers_fk_targets():
    spec = get_spec()
    standing = joblib.load(STANDING)
    rng = np.random.RandomState(0)
    T = 4
    q_true = np.repeat(np.asarray(standing["qpos"])[None], T, 0)
    q_true[:, 7:] += rng.uniform(-0.2, 0.2, (T, 69))
    q_true[:, :2] += rng.uniform(-0.2, 0.2, (T, 2))
    target = fklib.fk(spec, jnp.asarray(q_true)).xpos     # (T, 24, 3)

    res = retarget.fit_qpos(
        spec, target, init_qpos=jnp.asarray(standing["qpos"]),
        iters=400, lr=0.03, w_smooth=0.01)
    err = float(np.asarray(res.jpos_err).mean())
    assert err < 0.03, err                 # 3 cm mean joint error
    assert np.isfinite(np.asarray(res.qpos)).all()
    # hinge values within joint limits (+ tolerance)
    h = np.asarray(res.qpos[:, 7:])
    assert (h > spec.jnt_range[:, 0] - 0.1).all()
    assert (h < spec.jnt_range[:, 1] + 0.1).all()
