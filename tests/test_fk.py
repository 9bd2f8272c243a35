"""FK parity: kinpoly_tpu.physics.fk vs MuJoCo CPU on random configurations."""

import functools

import jax
import mujoco
import numpy as np

from kinpoly_tpu.physics import fk as fklib
from tests.mj_oracle import get_model, get_spec, random_qpos


@functools.lru_cache(maxsize=None)
def jit_fk():
    spec = get_spec()
    return jax.jit(lambda q: fklib.fk(spec, q))


@functools.lru_cache(maxsize=None)
def jit_dof_frames():
    spec = get_spec()
    return jax.jit(lambda q: fklib.dof_frames(spec, q, fklib.fk(spec, q)))


def test_fk_matches_mujoco(rng):
    spec = get_spec()
    m = get_model()
    d = mujoco.MjData(m)

    qs = np.stack([random_qpos(rng) for _ in range(32)])
    res = jit_fk()(qs)
    xpos = np.asarray(res.xpos)
    xquat = np.asarray(res.xquat)
    xipos = np.asarray(res.xipos)

    for i in range(32):
        d.qpos[:] = qs[i]
        mujoco.mj_forward(m, d)
        np.testing.assert_allclose(xpos[i], d.xpos[1:25], atol=1e-10)
        dots = np.abs(np.sum(xquat[i] * d.xquat[1:25], axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-10)
        # xipos involves mesh-derived CoMs; the oracle STLs are float32 on
        # disk, so parity is limited to ~1e-8
        np.testing.assert_allclose(xipos[i], d.xipos[1:25], atol=1e-7)


def test_dof_frames_match_mujoco(rng):
    spec = get_spec()
    m = get_model()
    d = mujoco.MjData(m)

    for _ in range(8):
        q = random_qpos(rng)
        df = jit_dof_frames()(q)
        d.qpos[:] = q
        mujoco.mj_forward(m, d)
        # hinge joints (jnt 1..69 map to dofs 6..74)
        ax = np.asarray(df.axis)[6:]
        an = np.asarray(df.anchor)[6:]
        np.testing.assert_allclose(ax, d.xaxis[1:], atol=1e-12)
        np.testing.assert_allclose(an, d.xanchor[1:], atol=1e-12)


def test_com_matches_subtree_com(rng):
    spec = get_spec()
    m = get_model()
    d = mujoco.MjData(m)
    q = random_qpos(rng)
    res = jit_fk()(q)
    d.qpos[:] = q
    mujoco.mj_forward(m, d)
    np.testing.assert_allclose(np.asarray(fklib.com(spec, res)), d.subtree_com[1], atol=1e-7)


def test_free_joint_qvel_convention():
    """Document + verify MuJoCo's free-joint qvel convention: linear velocity
    in world frame, angular velocity in body-local frame (the reference math
    library relies on this, uhc/khrylib/utils/math.py:36)."""
    m = get_model()
    d = mujoco.MjData(m)
    rng = np.random.RandomState(3)
    q = random_qpos(rng)
    d.qpos[:] = q
    d.qvel[:] = 0
    d.qvel[3:6] = [0.0, 0.0, 1.0]  # spin about +z (local?)
    mujoco.mj_forward(m, d)
    # body angular velocity in world frame from cvel (rotational part)
    bid = 1  # Pelvis
    mujoco.mj_objectVelocity(m, d, mujoco.mjtObj.mjOBJ_BODY, bid, np.zeros(6), 0)
    vel = np.zeros(6)
    mujoco.mj_objectVelocity(m, d, mujoco.mjtObj.mjOBJ_BODY, bid, vel, 0)  # flg_local=0 -> world
    R = np.zeros(9)
    mujoco.mju_quat2Mat(R, d.xquat[bid])
    R = R.reshape(3, 3)
    w_world = vel[:3]
    np.testing.assert_allclose(w_world, R @ np.array([0, 0, 1.0]), atol=1e-12)
