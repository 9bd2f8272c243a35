"""RFC-explicit parity vs MuJoCo's mj_applyFT (reference
uhc/envs/humanoid_im.py:483-495): per-body residual wrenches specified as
body-frame (contact point, force, torque), scaled and rotated to world, must
produce the same generalized force vector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import mj_oracle

from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.physics import dynamics as dyn, engine as eng


@pytest.fixture(scope="module")
def setup():
    spec = mj_oracle.get_spec()
    ctrl = uhc_control_params(spec)
    import dataclasses
    ctrl = dataclasses.replace(
        ctrl, rfc_mode="explicit",
        vf_bodies=tuple(range(len(spec.body_names))),
        residual_force_torque=True, rfc_scale=200.0)
    model = eng.build_model(spec, ctrl)
    return spec, model


def test_rfc_explicit_matches_mj_applyFT(setup):
    import mujoco

    spec, model = setup
    mj = mj_oracle.get_model(explicit_inertia=True)
    data = mujoco.MjData(mj)
    rng = np.random.RandomState(11)

    for trial in range(3):
        qpos = mj_oracle.random_qpos(rng)
        vf = rng.uniform(-0.5, 0.5, model.ctrl.vf_dim)

        data.qpos[:] = qpos
        data.qvel[:] = 0
        mujoco.mj_forward(mj, data)
        qfrc = np.zeros(mj.nv)
        d = model.ctrl.body_vf_dim
        for i, b in enumerate(model.ctrl.vf_bodies):
            # body id in the oracle model (worldbody is 0)
            bid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY,
                                    spec.body_names[b])
            cp_local = vf[i * d: i * d + 3]
            force_l = vf[i * d + 3: i * d + 6] * model.ctrl.rfc_scale
            torque_l = vf[i * d + 6: i * d + 9] * model.ctrl.rfc_scale
            R = data.xmat[bid].reshape(3, 3)
            point = data.xpos[bid] + R @ cp_local
            force = R @ force_l
            torque = R @ torque_l
            mujoco.mj_applyFT(mj, data, force, torque, point, bid, qfrc)

        ks = dyn.kin_state(spec, model.tables, jnp.asarray(qpos))
        Q = np.asarray(eng.rfc_explicit(model, ks, jnp.asarray(vf)))
        assert np.abs(Q - qfrc).max() < 1e-8, np.abs(Q - qfrc).max()


def test_rfc_explicit_substep_runs(setup):
    """The explicit action layout flows through control_step."""
    import joblib

    spec, model = setup
    standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
    st = eng.SimState(jnp.asarray(standing["qpos"], jnp.float64),
                      jnp.asarray(standing["qvel"], jnp.float64))
    a = jnp.zeros(69 + model.ctrl.vf_dim)
    a = a.at[69 + 3].set(0.1)   # small x force on the pelvis
    base_rot = jnp.asarray([0.7071067811865476, 0.7071067811865476, 0.0, 0.0])
    out = jax.jit(lambda s: eng.control_step(
        model, s, a, s.qpos[7:], base_rot))(st)
    assert np.isfinite(np.asarray(out.qpos)).all()
