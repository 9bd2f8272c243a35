"""Golden tests: kinpoly_tpu.core.tmath vs the reference's vendored
transformations.py + uhc/khrylib/utils/math.py formulas on random inputs."""

import math

import numpy as np
import pytest

from kinpoly_tpu.core import tmath
from tests.ref_oracle import transformations

T = transformations()


def rand_quats(rng, n, unit=True):
    q = rng.randn(n, 4)
    if unit:
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def test_quat_mul(rng):
    a, b = rand_quats(rng, 64, unit=False), rand_quats(rng, 64, unit=False)
    ours = np.asarray(tmath.quat_mul(a, b))
    ref = np.stack([T.quaternion_multiply(a[i], b[i]) for i in range(64)])
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_quat_inv(rng):
    q = rand_quats(rng, 64, unit=False) * 2.0
    ours = np.asarray(tmath.quat_inv(q))
    ref = np.stack([T.quaternion_inverse(q[i]) for i in range(64)])
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_quat_to_mat(rng):
    q = rand_quats(rng, 64)
    ours = np.asarray(tmath.quat_to_mat(q))
    ref = np.stack([T.quaternion_matrix(q[i])[:3, :3] for i in range(64)])
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_mat_quat_roundtrip(rng):
    q = rand_quats(rng, 256)
    q_rt = np.asarray(tmath.mat_to_quat(tmath.quat_to_mat(q)))
    # same rotation up to sign
    dots = np.abs(np.sum(q_rt * q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)


def test_quat_rot_vec(rng):
    q = rand_quats(rng, 64)
    v = rng.randn(64, 3)
    ours = np.asarray(tmath.quat_rot_vec(q, v))
    ref = np.stack([T.quaternion_matrix(q[i])[:3, :3] @ v[i] for i in range(64)])
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_quat_about_axis(rng):
    for _ in range(16):
        angle = rng.uniform(-2 * np.pi, 2 * np.pi)
        axis = rng.randn(3)
        ours = np.asarray(tmath.quat_about_axis(np.asarray(angle), axis))
        ref = T.quaternion_about_axis(angle, axis)
        np.testing.assert_allclose(ours, ref, atol=1e-12)


@pytest.mark.parametrize("axes", ["sxyz", "rzyx", "szyx", "rxyz"])
def test_quat_from_euler(rng, axes):
    e = rng.uniform(-np.pi, np.pi, size=(64, 3))
    ours = np.asarray(tmath.quat_from_euler(e[:, 0], e[:, 1], e[:, 2], axes))
    ref = np.stack([T.quaternion_from_euler(*e[i].copy(), axes=axes) for i in range(64)])
    np.testing.assert_allclose(ours, ref, atol=1e-12)


@pytest.mark.parametrize("axes", ["sxyz", "rzyx"])
def test_euler_from_mat_roundtrip(rng, axes):
    e = rng.uniform(-1.4, 1.4, size=(64, 3))  # avoid gimbal lock region
    q = tmath.quat_from_euler(e[:, 0], e[:, 1], e[:, 2], axes)
    e_rt = np.asarray(tmath.euler_from_mat(tmath.quat_to_mat(q), axes))
    q_rt = np.asarray(tmath.quat_from_euler(e_rt[:, 0], e_rt[:, 1], e_rt[:, 2], axes))
    dots = np.abs(np.sum(q_rt * np.asarray(q), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)


def test_rotation_from_quat(rng):
    q = rand_quats(rng, 64)
    ours = np.asarray(tmath.rotation_from_quat(q))
    ref = np.stack([T.rotation_from_quaternion(q[i]) for i in range(64)])
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_heading_matches_reference_formulas(rng):
    q = rand_quats(rng, 64)
    # replicate uhc/khrylib/utils/math.py get_heading_q / get_heading / de_heading
    for i in range(16):
        hq = q[i].copy()
        hq[1] = 0
        hq[2] = 0
        hq_ref = hq / np.linalg.norm(hq)
        np.testing.assert_allclose(np.asarray(tmath.heading_q(q[i])), hq_ref, atol=1e-12)

        hq2 = q[i].copy()
        hq2[1] = 0
        hq2[2] = 0
        if hq2[3] < 0:
            hq2 *= -1
        hq2 /= np.linalg.norm(hq2)
        h_ref = 2 * math.acos(np.clip(hq2[0], -1, 1))
        np.testing.assert_allclose(float(tmath.heading(q[i])), h_ref, atol=1e-9)

        dh_ref = T.quaternion_multiply(T.quaternion_inverse(hq_ref), q[i])
        np.testing.assert_allclose(np.asarray(tmath.de_heading(q[i])), dh_ref, atol=1e-9)


def test_transform_vec(rng):
    q = rand_quats(rng, 16)
    v = rng.randn(16, 3)
    for i in range(16):
        rot = T.quaternion_matrix(q[i])[:3, :3]
        np.testing.assert_allclose(
            np.asarray(tmath.transform_vec(v[i], q[i], "root")), rot.T @ v[i], atol=1e-12
        )
        hq = q[i].copy()
        hq[1] = 0
        hq[2] = 0
        hq /= np.linalg.norm(hq)
        roth = T.quaternion_matrix(hq)[:3, :3]
        np.testing.assert_allclose(
            np.asarray(tmath.transform_vec(v[i], q[i], "heading")), roth.T @ v[i], atol=1e-12
        )


def test_qvel_fd_matches_reference(rng):
    # replicate get_qvel_fd_new inline (reference math.py:45-65)
    dt = 1.0 / 30
    for _ in range(16):
        cur = np.concatenate([rng.randn(3), rand_quats(rng, 1)[0], rng.uniform(-np.pi, np.pi, 69)])
        nxt = np.concatenate([rng.randn(3), rand_quats(rng, 1)[0], cur[7:] + rng.uniform(-0.2, 0.2, 69)])
        v = (nxt[:3] - cur[:3]) / dt
        qrel = T.quaternion_multiply(nxt[3:7], T.quaternion_inverse(cur[3:7]))
        axis, angle = T.rotation_from_quaternion(qrel, True)
        while angle > np.pi:
            angle -= 2 * np.pi
        while angle < -np.pi:
            angle += 2 * np.pi
        rv = (axis * angle) / dt
        rv = T.quaternion_matrix(cur[3:7])[:3, :3].T @ rv
        diff = nxt[7:] - cur[7:]
        ref = np.concatenate([v, rv, diff / dt])
        ours = np.asarray(tmath.qvel_fd(cur, nxt, dt))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_multi_quat_diff_norm(rng):
    nq1 = rand_quats(rng, 24).reshape(-1)
    nq0 = rand_quats(rng, 24).reshape(-1)
    diff_ref = np.zeros_like(nq0)
    for i in range(24):
        s = slice(4 * i, 4 * i + 4)
        diff_ref[s] = T.quaternion_multiply(nq1[s], T.quaternion_inverse(nq0[s]))
    ours = np.asarray(tmath.multi_quat_diff(nq1, nq0))
    np.testing.assert_allclose(ours, diff_ref, atol=1e-12)
    norm_ref = np.arccos(np.clip(np.abs(diff_ref[::4]), -1, 1))
    np.testing.assert_allclose(np.asarray(tmath.multi_quat_norm(ours)), norm_ref, atol=1e-12)


def test_rot6d_roundtrip(rng):
    q = rand_quats(rng, 64)
    r6 = tmath.quat_to_rot6d(q)
    q_rt = np.asarray(tmath.rot6d_to_quat(r6))
    dots = np.abs(np.sum(q_rt * q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)


def test_expmap_roundtrip(rng):
    e = rng.randn(64, 3) * 0.8
    q = tmath.quat_from_expmap(e)
    e_rt = np.asarray(tmath.rotation_from_quat_shortest(q))
    np.testing.assert_allclose(e_rt, e, atol=1e-9)
