"""Meta-PD gain modulation path + misc engine options."""

import jax
import jax.numpy as jnp
import joblib
import numpy as np

from kinpoly_tpu.config.defaults import BASE_ROT, uhc_control_params
from kinpoly_tpu.physics import engine as eng
from tests.mj_oracle import get_spec

STANDING = "/root/reference/sample_data/standing_neutral.pkl"


def test_meta_pd_control_step():
    """meta_pd scales jkp/jkd per substep by clip(meta+1, 0, 10)
    (humanoid_im.py:453-456); action grows by 2*15 dims."""
    spec = get_spec()
    model = eng.build_model(spec, uhc_control_params(spec, meta_pd=True))
    standing = joblib.load(STANDING)
    q0 = jnp.asarray(standing["qpos"])
    v0 = jnp.asarray(standing["qvel"])
    action = jnp.zeros(69 + 6 + 2 * 15)
    base_rot = jnp.asarray(BASE_ROT)

    @jax.jit
    def step(qp, qv, a):
        s = eng.control_step(model, eng.SimState(qp, qv), a, qp[7:], base_rot)
        return s.qpos, s.qvel

    qp1, _ = step(q0, v0, action)
    assert np.isfinite(np.asarray(qp1)).all()

    # meta = -1 -> gains 0 -> pure gravity: should sink faster than meta = 0
    a_off = action.at[75:].set(-1.0)
    qp0_off, _ = step(q0, v0, a_off)
    # with zero gains the humanoid gets no joint torque; pose decays more
    d_on = float(jnp.abs(qp1[7:] - q0[7:]).sum())
    d_off = float(jnp.abs(qp0_off[7:] - q0[7:]).sum())
    assert d_off > d_on


def test_qvel_clip_guard():
    spec = get_spec()
    model = eng.build_model(spec, uhc_control_params(spec))
    standing = joblib.load(STANDING)
    q0 = jnp.asarray(standing["qpos"])
    v0 = jnp.full(75, 500.0)  # absurd velocity
    action = jnp.zeros(75)

    @jax.jit
    def step(qp, qv):
        s = eng.control_step(model, eng.SimState(qp, qv), action, qp[7:],
                             jnp.asarray(BASE_ROT))
        return s.qvel

    qv1 = step(q0, v0)
    assert np.isfinite(np.asarray(qv1)).all()
    assert float(jnp.abs(qv1).max()) <= model.qvel_clip + 1e-5
