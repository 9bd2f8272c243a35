"""Dynamics parity: CRBA mass matrix and RNEA bias vs MuJoCo CPU."""

import functools

import jax
import mujoco
import numpy as np

from kinpoly_tpu.physics import dynamics as dyn
from tests.mj_oracle import get_model, get_spec, random_qpos


@functools.lru_cache(maxsize=None)
def jit_dyn():
    spec = get_spec()
    tables = dyn.build_tables(spec)

    @jax.jit
    def f(qpos, qvel):
        ks = dyn.kin_state(spec, tables, qpos)
        M = dyn.mass_matrix(spec, tables, ks)
        C = dyn.bias_force(spec, tables, ks, qvel)
        return M, C

    return f


def test_mass_matrix_matches_mujoco(rng):
    spec = get_spec()
    tables = dyn.build_tables(spec)
    m = get_model(explicit_inertia=True)
    d = mujoco.MjData(m)

    for _ in range(4):
        q = random_qpos(rng)
        M = np.asarray(jit_dyn()(q, np.zeros(75))[0])

        d.qpos[:] = q
        mujoco.mj_forward(m, d)
        Mref = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, Mref)
        scale = np.abs(Mref).max()
        np.testing.assert_allclose(M, Mref, atol=1e-8 * scale)


def test_bias_force_matches_mujoco(rng):
    spec = get_spec()
    tables = dyn.build_tables(spec)
    m = get_model(explicit_inertia=True)
    d = mujoco.MjData(m)

    for _ in range(4):
        q = random_qpos(rng)
        v = rng.randn(75) * 1.0
        C = np.asarray(jit_dyn()(q, v)[1])

        d.qpos[:] = q
        d.qvel[:] = v
        mujoco.mj_forward(m, d)
        scale = max(np.abs(d.qfrc_bias).max(), 1.0)
        np.testing.assert_allclose(C, d.qfrc_bias, atol=1e-8 * scale)


def test_forward_accel_matches_mujoco_no_contact(rng):
    """qacc = M^-1 (tau - bias) vs mj_forward with contacts disabled
    (humanoid floated high above the floor, no joint limits hit)."""
    spec = get_spec()
    tables = dyn.build_tables(spec)
    m = get_model(explicit_inertia=True)
    d = mujoco.MjData(m)

    for _ in range(4):
        q = random_qpos(rng, scale=0.4)
        q[2] += 5.0  # well above floor
        v = rng.randn(75) * 0.5
        tau = rng.randn(69) * 5.0

        M, C = jit_dyn()(q, v)
        full_tau = np.concatenate([np.zeros(6), tau])
        qacc = np.asarray(dyn.chol_solve(M, full_tau - np.asarray(C)))

        d.qpos[:] = q
        d.qvel[:] = v
        d.ctrl[:] = tau
        mujoco.mj_forward(m, d)
        assert d.ncon == 0, "test setup should be contact-free"
        scale = max(np.abs(d.qacc).max(), 1.0)
        np.testing.assert_allclose(qacc, d.qacc, atol=1e-6 * scale)
