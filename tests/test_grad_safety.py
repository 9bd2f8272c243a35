"""Gradient finiteness of rotation math at its singular points.

The full-rollout supervised loss backprops through ~100 chained rotation ops
(traj_ar scan); the singular points below are not edge cases there — they are
the TRAINING FIXED POINTS (frame-to-frame relative rotations approach
identity as the net learns to track). acos-based angle extraction has an
infinite derivative at identity, and ``jnp.linalg.norm`` has a NaN VJP at 0;
either one poisons the whole update through a masked where-branch
(0 * inf = NaN). Round-4 regression: the use_of warm start was flat for 600
steps because optax.zero_nans silently ate every update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinpoly_tpu.core import tmath

pytestmark = pytest.mark.fast

IDEN = jnp.array([1.0, 0.0, 0.0, 0.0])
PRONE = jnp.array([0.0, 1.0, 0.0, 0.0])       # 180 deg about x: w = z = 0
NEAR_IDEN = jnp.array([1.0 - 1e-8, 1e-5, 0.0, 0.0])


def _grad_finite(f, x):
    g = jax.grad(lambda v: jnp.sum(f(v)))(x)
    return bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("q", [IDEN, NEAR_IDEN, PRONE])
def test_rotation_from_quat_grad(q):
    assert _grad_finite(tmath.rotation_from_quat, q)
    assert _grad_finite(tmath.rotation_from_quat_shortest, q)


@pytest.mark.parametrize("q", [IDEN, NEAR_IDEN, PRONE])
def test_heading_grads(q):
    assert _grad_finite(tmath.heading, q)
    assert _grad_finite(tmath.heading_q, q)
    assert _grad_finite(tmath.de_heading, q)


def test_heading_q_prone_returns_identity():
    hq = tmath.heading_q(PRONE)
    np.testing.assert_allclose(np.asarray(hq), [1, 0, 0, 0], atol=1e-6)


def test_multi_quat_norm_grad_at_identity():
    nq = jnp.tile(IDEN, (3,))
    assert _grad_finite(tmath.multi_quat_norm, nq)
    # value parity with acos(|w|) away from the singular point
    q = tmath.quat_norm(jnp.array([0.9, 0.1, -0.3, 0.2]))
    got = tmath.multi_quat_norm(q)
    want = np.arccos(abs(float(q[0])))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_quat_from_expmap_grad_at_zero():
    assert _grad_finite(tmath.quat_from_expmap, jnp.zeros(3))


def test_quat_norm_grad_at_zero():
    assert _grad_finite(tmath.quat_norm, jnp.zeros(4))


def test_rot6d_grad_at_degenerate():
    assert _grad_finite(lambda x: tmath.rot6d_to_mat(x), jnp.zeros(6))
    # parallel a1/a2 (Gram-Schmidt residual is 0)
    x = jnp.array([1.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    assert _grad_finite(lambda v: tmath.rot6d_to_mat(v), x)


def test_qvel_fd_grad_at_identical_frames():
    """The per-scan-step hit: qrel == identity whenever consecutive predicted
    frames match, i.e. whenever the net is doing well."""
    q = jnp.concatenate([jnp.array([0.1, 0.2, 0.9]), IDEN, jnp.zeros(69)])

    def f(qn):
        return jnp.sum(tmath.qvel_fd(q, qn, 1 / 30.0))

    g = jax.grad(f)(q)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_rotation_from_quat_value_parity():
    """atan2 form equals the acos form away from the singularity."""
    rng = np.random.RandomState(0)
    q = rng.randn(64, 4).astype(np.float64)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    got = np.asarray(tmath.rotation_from_quat(jnp.asarray(q)))
    w = np.clip(q[..., :1], -1, 1)
    ref = q[..., 1:] / np.sqrt(1 - w**2) * (2 * np.arccos(w))
    np.testing.assert_allclose(got, ref, atol=1e-6)
