"""Engine rollout tests: contact-free parity vs MuJoCo driven by the identical
stable-PD controller, and standing stability under contacts."""

import functools

import jax
import jax.numpy as jnp
import joblib
import mujoco
import numpy as np

from kinpoly_tpu.config.defaults import BASE_ROT, uhc_control_params
from kinpoly_tpu.physics import engine as eng
from tests.mj_oracle import get_model, get_spec, random_qpos

STANDING = "/root/reference/sample_data/standing_neutral.pkl"


@functools.lru_cache(maxsize=None)
def get_phys_model():
    spec = get_spec()
    return eng.build_model(spec, uhc_control_params(spec))


@functools.lru_cache(maxsize=None)
def jit_control_step(with_contacts: bool):
    model = get_phys_model()
    base_rot = jnp.asarray(BASE_ROT)

    @jax.jit
    def f(qpos, qvel, action, kin_pose):
        s = eng.control_step(model, eng.SimState(qpos, qvel), action, kin_pose,
                             base_rot, with_contacts=with_contacts)
        return s.qpos, s.qvel

    return f


def mujoco_pd_rollout(q0, v0, action, kin_pose, n_control, model):
    """Drive the MuJoCo oracle with the reference stable-PD controller
    implemented in numpy against MuJoCo's own M / qfrc_bias (the exact
    reference computation, humanoid_im.py:418-480)."""
    m = get_model(explicit_inertia=True)
    d = mujoco.MjData(m)
    d.qpos[:] = q0
    d.qvel[:] = v0
    ctrl = get_phys_model().ctrl
    dt = m.opt.timestep

    traj = []
    for _ in range(n_control):
        for _ in range(15):
            mujoco.mj_forward(m, d)
            M = np.zeros((m.nv, m.nv))
            mujoco.mj_fullM(m, d, M)
            C = d.qfrc_bias.copy()
            base = kin_pose.copy()
            delta = base - d.qpos[7:]
            base -= 2 * np.pi * np.round(delta / (2 * np.pi) - delta / (2 * np.pi) % 1 * 0)  # no-op guard
            while np.any(base - d.qpos[7:] > np.pi):
                base[base - d.qpos[7:] > np.pi] -= 2 * np.pi
            while np.any(base - d.qpos[7:] < -np.pi):
                base[base - d.qpos[7:] < -np.pi] += 2 * np.pi
            target = base + action[:69] * ctrl.a_scale
            k_p = np.zeros(75)
            k_d = np.zeros(75)
            k_p[6:] = ctrl.jkp
            k_d[6:] = ctrl.jkd
            qpos_err = np.concatenate([np.zeros(6), d.qpos[7:] + d.qvel[6:] * dt - target])
            qvel_err = d.qvel.copy()
            A = M + np.diag(k_d * dt)
            qacc = np.linalg.solve(A, -C - k_p * qpos_err - k_d * qvel_err)
            qvel_err = qvel_err + qacc * dt
            torque = -ctrl.jkp * qpos_err[6:] - ctrl.jkd * qvel_err[6:]
            torque = np.clip(torque, -ctrl.torque_lim, ctrl.torque_lim)
            d.ctrl[:] = torque
            mujoco.mj_step(m, d)
        traj.append((d.qpos.copy(), d.qvel.copy()))
    return traj


def test_rollout_no_contact_matches_mujoco(rng):
    """2 control steps (30 substeps) of PD toward a perturbed pose while
    floating high above the floor: trajectories should agree closely."""
    standing = joblib.load(STANDING)
    q0 = standing["qpos"].copy()
    q0[2] += 5.0
    v0 = np.zeros(75)
    kin_pose = q0[7:] + rng.uniform(-0.2, 0.2, 69)
    action = np.zeros(75)
    action[:69] = rng.uniform(-0.1, 0.1, 69)

    ref = mujoco_pd_rollout(q0, v0, action, kin_pose, 2, get_phys_model())

    step = jit_control_step(False)
    qp, qv = q0, v0
    for i in range(2):
        qp, qv = step(qp, qv, action, kin_pose)
        np.testing.assert_allclose(np.asarray(qp), ref[i][0], atol=2e-5)
        np.testing.assert_allclose(np.asarray(qv), ref[i][1], atol=2e-3)


def test_contact_collapse_matches_mujoco():
    """Pure PD toward the standing pose cannot balance (no trained policy /
    RFC in the loop) — MuJoCo's humanoid sags at the knees and collapses to
    z~0.13 in ~1.2 s. Our contact solver must reproduce that *behavioral*
    trajectory: same sag rate, same collapse window, same settled height."""
    standing = joblib.load(STANDING)
    q0 = standing["qpos"].copy()
    v0 = standing["qvel"].copy()
    kin_pose = q0[7:].copy()
    action = np.zeros(75)

    ref = mujoco_pd_rollout(q0, v0, action, kin_pose, 56, get_phys_model())
    ref_z = np.asarray([q[2] for q, _ in ref])

    step = jit_control_step(True)
    qp, qv = q0, v0
    zs = []
    for i in range(56):
        qp, qv = step(qp, qv, action, kin_pose)
        zs.append(float(qp[2]))
    zs = np.asarray(zs)

    assert np.isfinite(np.asarray(qp)).all()
    # early sag phase: cm-level parity
    np.testing.assert_allclose(zs[:16], ref_z[:16], atol=0.04)
    # settled height after collapse: same resting configuration regime
    assert abs(zs[-1] - ref_z[-1]) < 0.06, (zs[-1], ref_z[-1])
    # both should be at rest at the end
    assert abs(float(qv[2])) < 0.2
