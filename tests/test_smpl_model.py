"""SMPL body-model layer (anim/smpl_model.py) — LBS math on a synthetic
model (no licensed SMPL archive ships with either repo; reference
counterpart: uhc/smpllib/smpl_parser.py SMPL_Parser via smplx)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kinpoly_tpu.anim import smpl_model as sm


@pytest.fixture(scope="module")
def model():
    return sm.synthetic_model(np.random.RandomState(0))


def test_identity_pose_returns_shaped_template(model):
    betas = jnp.zeros(10)
    pose = jnp.zeros(72)
    verts, joints = sm.lbs(model, betas, pose, with_pose_blend=False)
    np.testing.assert_allclose(np.asarray(verts), model.v_template, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(joints), model.J_regressor @ model.v_template, atol=1e-5)


def test_betas_move_vertices_linearly(model):
    b1 = jnp.zeros(10).at[0].set(1.0)
    b2 = jnp.zeros(10).at[0].set(2.0)
    v1, _ = sm.lbs(model, b1, jnp.zeros(72), with_pose_blend=False)
    v2, _ = sm.lbs(model, b2, jnp.zeros(72), with_pose_blend=False)
    d1 = np.asarray(v1) - model.v_template
    d2 = np.asarray(v2) - model.v_template
    np.testing.assert_allclose(d2, 2 * d1, atol=1e-5)
    np.testing.assert_allclose(d1, model.shapedirs[..., 0], atol=1e-5)


def test_global_rotation_is_rigid(model):
    """Rotating only the root rotates every vertex/joint rigidly about the
    root joint."""
    betas = jnp.zeros(10)
    aa = jnp.zeros(72).at[2].set(np.pi / 2)   # root z-rotation
    v0, j0 = sm.lbs(model, betas, jnp.zeros(72), with_pose_blend=False)
    v1, j1 = sm.lbs(model, betas, aa, with_pose_blend=False)
    c = np.asarray(j0)[0]
    Rz = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    np.testing.assert_allclose(
        np.asarray(v1), (np.asarray(v0) - c) @ Rz.T + c, atol=1e-5)
    # rigid: pairwise distances preserved
    d0 = np.linalg.norm(np.asarray(j0)[1:] - np.asarray(j0)[:-1], axis=-1)
    d1 = np.linalg.norm(np.asarray(j1)[1:] - np.asarray(j1)[:-1], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-5)


def test_translation_and_batching(model):
    betas = jnp.zeros((3, 10))
    pose = jnp.zeros((3, 72))
    trans = jnp.asarray(np.random.RandomState(1).randn(3, 3))
    v, j = sm.lbs(model, betas, pose, trans, with_pose_blend=False)
    assert v.shape == (3, model.v_template.shape[0], 3)
    v0, j0 = sm.lbs(model, betas[0], pose[0], with_pose_blend=False)
    np.testing.assert_allclose(
        np.asarray(j[1]), np.asarray(j0) + np.asarray(trans[1]), atol=1e-5)


def test_pose_blendshapes_applied(model):
    betas = jnp.zeros(10)
    aa = jnp.zeros(72).at[5].set(0.5)   # bend a joint
    v_with, _ = sm.lbs(model, betas, aa, with_pose_blend=True)
    v_without, _ = sm.lbs(model, betas, aa, with_pose_blend=False)
    assert float(jnp.abs(v_with - v_without).max()) > 1e-6
