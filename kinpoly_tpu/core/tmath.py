"""Quaternion / rotation / heading math — the single source of truth.

Every function is written in jnp, fully batched over arbitrary leading
dimensions, and dtype-preserving (no silent float64 promotion), so the same
code runs inside jitted TPU env steps and in float64 CPU parity tests.

Conventions (matching the reference semantics, see
``/root/reference/uhc/khrylib/utils/math.py`` and the vendored
``transformation.py``):

- quaternions are ``(w, x, y, z)`` (Hamilton, scalar first)
- ``quat_mul(a, b)`` applies ``b`` first, then ``a`` (standard Hamilton
  product, equal to reference ``quaternion_multiply(a, b)``)
- the "heading" of a root quaternion is obtained by zeroing the x/y imaginary
  components and renormalising (reference ``get_heading_q``,
  ``uhc/khrylib/utils/math.py:132``)
- Euler-angle sequences follow the classic transformations.py encoding
  ('sxyz' = static/extrinsic x-y-z, 'rzyx' = rotating/intrinsic z-y-x, ...)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# basic quaternion algebra
# ---------------------------------------------------------------------------


def safe_norm(x: jax.Array, axis: int = -1, keepdims: bool = True,
              eps: float = 1e-12) -> jax.Array:
    """L2 norm with finite gradients everywhere.

    ``jnp.linalg.norm(x)`` has a NaN vector-Jacobian product at ``x == 0``
    (x/||x|| = 0/0) even when the caller clips the *result* before dividing;
    the max-before-sqrt form makes the gradient exactly zero below ``eps``
    instead. Every normalisation on the AR training path must use this: the
    full-rollout supervised loss backprops through ~100 chained rotation ops
    and a single NaN cotangent poisons the whole update (optax.zero_nans then
    silently zeroes it — the round-4 use_of warm start was flat for 600 steps
    because of exactly this)."""
    n2 = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(n2, eps * eps))


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b; shapes broadcast over leading dims, (..., 4)."""
    aw, ax, ay, az = jnp.split(a, 4, axis=-1)
    bw, bx, by, bz = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jax.Array) -> jax.Array:
    """Full inverse (conjugate / squared norm), matching reference
    ``quaternion_inverse`` which does not assume unit quaternions."""
    return quat_conj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_norm(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / safe_norm(q, eps=eps)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.split(q, 4, axis=-1)
    n = jnp.sum(q * q, axis=-1, keepdims=True)
    s = jnp.where(n > 1e-12, 2.0 / jnp.maximum(n, 1e-12), jnp.zeros_like(n))
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    one = jnp.ones_like(xx)
    m = jnp.stack(
        [
            one - (yy + zz), xy - wz, xz + wy,
            xy + wz, one - (xx + zz), yz - wx,
            xz - wy, yz + wx, one - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-2] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> unit quaternion (w >= 0 branchless).

    Uses the numerically-stable 4-branch construction selected by the largest
    diagonal combination.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def build(w2, a, b, c, perm):
        # w2 = 4*q[perm0]^2; (a, b, c) fill the remaining slots
        s = jnp.sqrt(jnp.maximum(w2, 1e-18))
        q0 = 0.5 * s
        qa, qb, qc = a / (2.0 * s), b / (2.0 * s), c / (2.0 * s)
        comps = [q0, qa, qb, qc]
        out = [None] * 4
        for dst, src in enumerate(perm):
            out[src] = comps[dst]
        return jnp.stack(out, axis=-1)

    q_w = build(1.0 + tr, m21 - m12, m02 - m20, m10 - m01, (0, 1, 2, 3))
    q_x = build(1.0 + m00 - m11 - m22, m21 - m12, m01 + m10, m02 + m20, (1, 0, 2, 3))
    q_y = build(1.0 + m11 - m00 - m22, m02 - m20, m01 + m10, m12 + m21, (2, 0, 1, 3))
    q_z = build(1.0 + m22 - m00 - m11, m10 - m01, m02 + m20, m12 + m21, (3, 0, 1, 2))

    cond_w = tr > 0.0
    cond_x = (m00 >= m11) & (m00 >= m22)
    cond_y = m11 >= m22
    q = jnp.where(
        cond_w[..., None],
        q_w,
        jnp.where(cond_x[..., None], q_x, jnp.where(cond_y[..., None], q_y, q_z)),
    )
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -jnp.ones_like(q[..., :1]), jnp.ones_like(q[..., :1]))


def quat_rot_vec(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q: R(q) v.  (..., 4), (..., 3)."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_rot_vec_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by the inverse of unit quaternion q: R(q)^T v."""
    return quat_rot_vec(quat_conj(q), v)


def quat_about_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """Quaternion for rotation of `angle` about (not necessarily unit) axis."""
    axis = axis / safe_norm(axis)
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quat_from_expmap(e: jax.Array) -> jax.Array:
    """Exponential map (axis*angle 3-vector) -> quaternion; safe at 0
    (value AND gradient — see safe_norm)."""
    angle = safe_norm(e)
    half = 0.5 * angle
    # sinc-based form: sin(a/2)/a, finite at a->0 (=1/2)
    k = jnp.where(angle < 1e-9, 0.5 * jnp.ones_like(angle), jnp.sin(half) / jnp.maximum(angle, 1e-9))
    return jnp.concatenate([jnp.cos(half), e * k], axis=-1)


def rotation_from_quat(q: jax.Array) -> jax.Array:
    """Quaternion -> axis*angle with angle = 2*acos(w) in [0, 2pi).

    Matches reference ``rotation_from_quaternion``
    (``uhc/khrylib/utils/transformation.py:348``): near-identity quaternions
    return the zero vector.

    The angle comes from atan2(||xyz||, w) rather than 2*acos(w): acos has an
    infinite derivative at w = +-1, which is exactly where every frame-to-frame
    relative rotation lives once the AR net starts tracking, and the inf
    partial turns the masked where-branch cotangent into NaN.
    """
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    s = safe_norm(q[..., 1:], eps=1e-9)
    angle = 2.0 * jnp.arctan2(s, w)   # == 2*acos(w) for unit q, grad-safe
    small = (1.0 - jnp.abs(w)) < 1e-8
    axis = jnp.where(small, jnp.zeros_like(q[..., 1:]).at[..., 0].set(1.0), q[..., 1:] / s)
    return jnp.where(small, jnp.zeros_like(axis), axis * angle)


def rotation_from_quat_shortest(q: jax.Array) -> jax.Array:
    """Axis*angle with the angle wrapped to (-pi, pi] (shortest rotation)."""
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    s = safe_norm(q[..., 1:], eps=1e-9)
    angle = 2.0 * jnp.arctan2(s, w)
    angle = jnp.where(angle > math.pi, angle - 2.0 * math.pi, angle)
    small = (1.0 - jnp.abs(w)) < 1e-8
    axis = jnp.where(small, jnp.zeros_like(q[..., 1:]), q[..., 1:] / s)
    return axis * angle


# ---------------------------------------------------------------------------
# heading helpers (z-axis yaw decomposition of the root quaternion)
# ---------------------------------------------------------------------------


def heading_q(q: jax.Array) -> jax.Array:
    """Zero out x/y imaginary parts and renormalise (no sign canonicalisation),
    matching reference ``get_heading_q``. Degenerate quaternions (w = z = 0,
    e.g. a prone pose, 180 deg about x) have no defined heading; they return
    identity instead of 0/0 — the reference f64 code NaNs there too, this is
    strictly more robust."""
    hq = q * jnp.asarray([1.0, 0.0, 0.0, 1.0], dtype=q.dtype)
    n2 = jnp.sum(hq * hq, axis=-1, keepdims=True)
    iden = jnp.zeros_like(hq).at[..., 0].set(1.0)
    hq = jnp.where(n2 > 1e-12, hq, iden)
    return hq / safe_norm(hq, eps=1e-6)


def heading(q: jax.Array) -> jax.Array:
    """Heading (yaw) angle of the sign-canonicalised (z>=0) heading
    quaternion, in [0, 2pi); matches reference ``get_heading``. Computed as
    2*atan2(z, w), which equals 2*acos(w/||hq||) but has finite gradients at
    zero heading (acos'(1) is infinite) and needs no normalisation."""
    w, z = q[..., 0], q[..., 3]
    sgn = jnp.where(z < 0, -1.0, 1.0)
    w, z = sgn * w, sgn * z
    deg = (w * w + z * z) <= 1e-12      # prone-like: heading undefined -> 0
    w = jnp.where(deg, jnp.ones_like(w), w)
    z = jnp.where(deg, jnp.zeros_like(z), z)
    return 2.0 * jnp.arctan2(z, w)


def de_heading(q: jax.Array) -> jax.Array:
    """Remove the heading component: heading_q(q)^-1 ⊗ q."""
    return quat_mul(quat_conj(heading_q(q)), q)


def transform_vec(v: jax.Array, q: jax.Array, trans: str = "root") -> jax.Array:
    """Express world vector v in the root ('root') or heading ('heading')
    frame of quaternion q: R^T v. Matches reference ``transform_vec``."""
    if trans == "root":
        return quat_rot_vec_inv(quat_norm(q), v)
    elif trans == "heading":
        return quat_rot_vec_inv(heading_q(q), v)
    raise ValueError(f"unknown transform {trans!r}")


def wrap_to_pi(x: jax.Array) -> jax.Array:
    """Wrap angle(s) to (-pi, pi]."""
    return x - 2.0 * math.pi * jnp.floor((x + math.pi) / (2.0 * math.pi))


# ---------------------------------------------------------------------------
# Euler angles (transformations.py 24-sequence encoding)
# ---------------------------------------------------------------------------

_AXES2TUPLE = {
    "sxyz": (0, 0, 0, 0), "sxyx": (0, 0, 1, 0), "sxzy": (0, 1, 0, 0),
    "sxzx": (0, 1, 1, 0), "syzx": (1, 0, 0, 0), "syzy": (1, 0, 1, 0),
    "syxz": (1, 1, 0, 0), "syxy": (1, 1, 1, 0), "szxy": (2, 0, 0, 0),
    "szxz": (2, 0, 1, 0), "szyx": (2, 1, 0, 0), "szyz": (2, 1, 1, 0),
    "rzyx": (0, 0, 0, 1), "rxyx": (0, 0, 1, 1), "ryzx": (0, 1, 0, 1),
    "rxzx": (0, 1, 1, 1), "rxzy": (1, 0, 0, 1), "ryzy": (1, 0, 1, 1),
    "rzxy": (1, 1, 0, 1), "ryxy": (1, 1, 1, 1), "ryxz": (2, 0, 0, 1),
    "rzxz": (2, 0, 1, 1), "rxyz": (2, 1, 0, 1), "rzyz": (2, 1, 1, 1),
}
_NEXT_AXIS = [1, 2, 0, 1]


def quat_from_euler(ai: jax.Array, aj: jax.Array, ak: jax.Array, axes: str = "sxyz") -> jax.Array:
    """Euler angles -> quaternion; exact port of the classic public-domain
    transformations.py algorithm (the reference vendors three copies of it).
    `axes` must be a static string. Batched over leading dims of ai/aj/ak."""
    firstaxis, parity, repetition, frame = _AXES2TUPLE[axes.lower()]
    i = firstaxis + 1
    j = _NEXT_AXIS[i + parity - 1] + 1
    k = _NEXT_AXIS[i - parity] + 1

    if frame:
        ai, ak = ak, ai
    if parity:
        aj = -aj

    ai, aj, ak = ai * 0.5, aj * 0.5, ak * 0.5
    ci, si = jnp.cos(ai), jnp.sin(ai)
    cj, sj = jnp.cos(aj), jnp.sin(aj)
    ck, sk = jnp.cos(ak), jnp.sin(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk

    out = [None] * 4
    if repetition:
        out[0] = cj * (cc - ss)
        out[i] = cj * (cs + sc)
        out[j] = sj * (cc + ss)
        out[k] = sj * (cs - sc)
    else:
        out[0] = cj * cc + sj * ss
        out[i] = cj * sc - sj * cs
        out[j] = cj * ss + sj * cc
        out[k] = cj * cs - sj * sc
    if parity:
        out[j] = -out[j]
    return jnp.stack(out, axis=-1)


def euler_from_mat(m: jax.Array, axes: str = "sxyz") -> jax.Array:
    """Rotation matrix -> Euler angles (..., 3); same sequence encoding."""
    firstaxis, parity, repetition, frame = _AXES2TUPLE[axes.lower()]
    i = firstaxis
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]
    eps = 1e-8

    if repetition:
        sy = jnp.sqrt(m[..., i, j] ** 2 + m[..., i, k] ** 2)
        ok = sy > eps
        ax = jnp.where(ok, jnp.arctan2(m[..., i, j], m[..., i, k]),
                       jnp.arctan2(-m[..., j, k], m[..., j, j]))
        ay = jnp.arctan2(sy, m[..., i, i])
        az = jnp.where(ok, jnp.arctan2(m[..., j, i], -m[..., k, i]), jnp.zeros_like(ax))
    else:
        cy = jnp.sqrt(m[..., i, i] ** 2 + m[..., j, i] ** 2)
        ok = cy > eps
        ax = jnp.where(ok, jnp.arctan2(m[..., k, j], m[..., k, k]),
                       jnp.arctan2(-m[..., j, k], m[..., j, j]))
        ay = jnp.arctan2(-m[..., k, i], cy)
        az = jnp.where(ok, jnp.arctan2(m[..., j, i], m[..., i, i]), jnp.zeros_like(ax))

    if parity:
        ax, ay, az = -ax, -ay, -az
    if frame:
        ax, az = az, ax
    return jnp.stack([ax, ay, az], axis=-1)


def euler_from_quat(q: jax.Array, axes: str = "sxyz") -> jax.Array:
    return euler_from_mat(quat_to_mat(q), axes)


# ---------------------------------------------------------------------------
# multi-joint quaternion helpers (reference multi_quat_diff / multi_quat_norm)
# ---------------------------------------------------------------------------


def multi_quat_diff(nq1: jax.Array, nq0: jax.Array) -> jax.Array:
    """Relative quaternions q1 ⊗ q0^-1 of N stacked joints, flat (..., 4N)."""
    shape = nq1.shape
    q1 = nq1.reshape(shape[:-1] + (-1, 4))
    q0 = nq0.reshape(shape[:-1] + (-1, 4))
    return quat_mul(q1, quat_inv(q0)).reshape(shape)


def multi_quat_norm(nq: jax.Array) -> jax.Array:
    """Rotation magnitude acos(|w|) per joint from flat (..., 4N) -> (..., N).
    atan2 form: equal for unit quaternions, finite gradient at identity
    (acos'(1) is infinite and identity is the training fixed point)."""
    q = nq.reshape(nq.shape[:-1] + (-1, 4))
    s = safe_norm(q[..., 1:], keepdims=False, eps=1e-12)
    return jnp.arctan2(s, jnp.abs(q[..., 0]))


# ---------------------------------------------------------------------------
# finite-difference velocities (reference get_qvel_fd_new / get_angvel_fd)
# ---------------------------------------------------------------------------


def qvel_fd(cur_qpos: jax.Array, next_qpos: jax.Array, dt: float) -> jax.Array:
    """Finite-difference generalized velocity between two qpos frames.

    Linear velocity in world, angular velocity of the root in *root* frame
    (matching MuJoCo's free-joint qvel layout), hinge rates wrapped to
    (-pi, pi]. Port of reference ``get_qvel_fd_new``
    (``uhc/khrylib/utils/math.py:45``), batched.
    """
    v = (next_qpos[..., :3] - cur_qpos[..., :3]) / dt
    qrel = quat_mul(next_qpos[..., 3:7], quat_inv(cur_qpos[..., 3:7]))
    axis_angle = rotation_from_quat(qrel)
    angle = safe_norm(axis_angle)
    wrapped = wrap_to_pi(angle)
    rv = jnp.where(angle > 1e-12, axis_angle * (wrapped / jnp.maximum(angle, 1e-12)), axis_angle) / dt
    rv = transform_vec(rv, cur_qpos[..., 3:7], "root")
    diff = wrap_to_pi(next_qpos[..., 7:] - cur_qpos[..., 7:])
    return jnp.concatenate([v, rv, diff / dt], axis=-1)


def angvel_fd(prev_bquat: jax.Array, cur_bquat: jax.Array, dt: float) -> jax.Array:
    """Per-joint finite-difference angular velocity from stacked quaternions
    (..., 4N) -> (..., 3N); port of reference ``get_angvel_fd``."""
    qd = multi_quat_diff(cur_bquat, prev_bquat)
    q = qd.reshape(qd.shape[:-1] + (-1, 4))
    aa = rotation_from_quat(q) / dt
    return aa.reshape(qd.shape[:-1] + (-1,))


# ---------------------------------------------------------------------------
# 6D rotation representation (reference kin_poly/utils/transform_utils.py)
# ---------------------------------------------------------------------------


def rot6d_to_mat(x: jax.Array) -> jax.Array:
    """Ortho-6D -> rotation matrix. x is (..., 6) = two 3-vectors a1, a2;
    Gram-Schmidt as in Zhou et al. (reference ``transform_utils.py``):
    columns of the matrix are (b1, b2, b3)."""
    a1, a2 = x[..., 0:3], x[..., 3:6]
    b1 = a1 / safe_norm(a1, eps=1e-8)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / safe_norm(b2, eps=1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def mat_to_rot6d(m: jax.Array) -> jax.Array:
    """Rotation matrix -> 6D (first two columns, flattened)."""
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


def quat_to_rot6d(q: jax.Array) -> jax.Array:
    return mat_to_rot6d(quat_to_mat(q))


def rot6d_to_quat(x: jax.Array) -> jax.Array:
    return mat_to_quat(rot6d_to_mat(x))


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def normalize_angle_diff(base: jax.Array, ref: jax.Array) -> jax.Array:
    """Shift `base` by multiples of 2pi so that (base - ref) lies in
    (-pi, pi]; used by the stable-PD target computation
    (reference ``humanoid_im.py:441-445``)."""
    return ref + wrap_to_pi(base - ref)
