"""Metric suite: identity sanity + golden formulas vs numpy reimplementation."""

import jax
import numpy as np

from kinpoly_tpu.anim import smpl as smpllib
from kinpoly_tpu.metrics import pose_metrics as pm
from tests.mj_oracle import get_spec
from tests.test_traj_ar import make_dataset


def test_identical_trajectories_zero_error():
    spec = get_spec()
    ds = make_dataset()
    q = ds.takes[0]["qpos"][:30]
    m = jax.jit(lambda a, b: pm.evaluate_pair(spec, a, b))(q, q)
    assert float(m["mpjpe"]) < 1e-6
    assert float(m["accel_dist"]) < 1e-6
    assert float(m["root_dist"]) < 1e-9
    assert float(m["head_dist"]) < 1e-9
    assert float(m["vel_dist"]) < 1e-9


def test_mpjpe_known_offset():
    spec = get_spec()
    ds = make_dataset()
    q = ds.takes[0]["qpos"][:10].copy()
    q2 = q.copy()
    q2[:, 0] += 0.5  # pure root translation: root-zeroed mpjpe must stay 0
    m = pm.evaluate_pair(spec, q2, q)
    assert float(m["mpjpe"]) < 1e-6
    assert float(m["root_dist"]) > 0.4


def test_frobenius_matches_numpy():
    rng = np.random.RandomState(0)
    from kinpoly_tpu.core import tmath

    poses = []
    for _ in range(8):
        p = np.zeros(7)
        p[:3] = rng.randn(3)
        quat = rng.randn(4)
        p[3:] = quat / np.linalg.norm(quat)
        poses.append(p)
    poses = np.stack(poses)
    x = np.asarray(pm.root_matrices(poses))
    y = np.asarray(pm.root_matrices(poses[::-1].copy()))
    ours = float(pm.frobenius_norm_dist(x, y))
    ref = np.mean([np.linalg.norm(np.eye(4) - x[i] @ np.linalg.inv(y[i]), "fro")
                   for i in range(8)])
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_smpl_qpos_roundtrip():
    spec = get_spec()
    rng = np.random.RandomState(0)
    pose_aa = rng.uniform(-0.6, 0.6, (8, 72))
    trans = rng.randn(8, 3)
    qpos = smpllib.smpl_to_qpose(spec, pose_aa, trans)
    aa_rt, trans_rt = smpllib.qpose_to_smpl(spec, qpos)
    np.testing.assert_allclose(np.asarray(trans_rt), trans, atol=1e-12)
    # compare as rotations (axis-angle is multi-valued)
    from kinpoly_tpu.core import tmath

    q1 = np.asarray(tmath.quat_from_expmap(pose_aa.reshape(8, 24, 3)))
    q2 = np.asarray(tmath.quat_from_expmap(np.asarray(aa_rt).reshape(8, 24, 3)))
    dots = np.abs(np.sum(q1 * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)


def test_smpl_to_qpose_matches_fk_consistency():
    """The root quat from smpl_to_qpose must equal the SMPL root rotation."""
    spec = get_spec()
    rng = np.random.RandomState(1)
    pose_aa = rng.uniform(-0.5, 0.5, (4, 72))
    qpos = np.asarray(smpllib.smpl_to_qpose(spec, pose_aa))
    from kinpoly_tpu.core import tmath

    root_q = np.asarray(tmath.quat_from_expmap(pose_aa[:, :3]))
    dots = np.abs(np.sum(root_q * qpos[:, 3:7], axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-10)
