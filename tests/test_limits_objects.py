"""Joint-limit constraints and object (box/cylinder SDF) contacts."""

import functools

import jax
import jax.numpy as jnp
import joblib
import numpy as np

from kinpoly_tpu.config.defaults import BASE_ROT, uhc_control_params
from kinpoly_tpu.physics import contact as ct
from kinpoly_tpu.physics import engine as eng
from tests.mj_oracle import get_spec

STANDING = "/root/reference/sample_data/standing_neutral.pkl"


@functools.lru_cache(maxsize=None)
def get_model_obj():
    spec = get_spec()
    return eng.build_model(spec, uhc_control_params(spec), with_objects=True)


def test_scene_geoms_parsed():
    model = get_model_obj()
    assert model.scene is not None
    # chair(2 boxes) + box(1) + table(1 box + 4 cyl) + Can(1 cyl) + step(1 box)
    assert model.scene.gtype.shape[0] == 10
    assert (model.scene.gtype == 1).sum() == 5  # 4 table legs + 1 can


def test_box_sdf():
    half = jnp.asarray([1.0, 2.0, 3.0])
    d, n = ct._sdf_box(jnp.asarray([0.0, 0.0, 4.0]), half)
    assert abs(float(d) - 1.0) < 1e-9
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-9)
    d, n = ct._sdf_box(jnp.asarray([0.9, 0.0, 0.0]), half)
    assert abs(float(d) + 0.1) < 1e-9  # inside
    np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-9)


def test_cylinder_sdf():
    size = jnp.asarray([0.5, 1.0, 0.0])
    d, n = ct._sdf_cylinder(jnp.asarray([0.0, 0.0, 1.4]), size)
    assert abs(float(d) - 0.4) < 1e-9
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-9)
    d, n = ct._sdf_cylinder(jnp.asarray([0.7, 0.0, 0.0]), size)
    assert abs(float(d) - 0.2) < 1e-9
    np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-9)


def test_joint_limit_rows():
    spec = get_spec()
    standing = joblib.load(STANDING)
    q = jnp.asarray(standing["qpos"]).at[7].set(3.3)  # beyond +pi on dof 0
    J, depth, active = ct.joint_limit_contacts(q, spec.jnt_range, 4)
    assert bool(active[0])
    assert float(depth[0]) > 0.1
    # the live row should push dof 6+0 in the negative direction
    row = np.asarray(J)[0]
    assert row[6] == -1.0


def test_sit_on_chair_boxes():
    """Drop the standing humanoid straight onto the chair seat: with object
    contacts, the pelvis must come to rest well above the floor."""
    model = get_model_obj()
    spec = model.spec
    standing = joblib.load(STANDING)
    q0 = jnp.asarray(standing["qpos"])
    v0 = jnp.zeros(75)

    # chair placed under the humanoid, seat top at z=0.2+... (geom box
    # size z 0.2 at pos -0.18 within body) -> put the chair body at z=0.6
    n_obj = len(spec.objects)
    obj_qpos = np.zeros((n_obj, 7))
    for i in range(n_obj):
        obj_qpos[i, :3] = [(i + 1) * 100, 100, 0]
        obj_qpos[i, 3] = 1
    obj_qpos[0] = [float(q0[0]), float(q0[1]), 0.6, 1, 0, 0, 0]
    obj_qpos = jnp.asarray(obj_qpos)

    kin_pose = q0[7:]
    action = jnp.zeros(75)
    base_rot = jnp.asarray(BASE_ROT)

    @jax.jit
    def step(qp, qv):
        s = eng.control_step(model, eng.SimState(qp, qv), action, kin_pose,
                             base_rot, obj_qpos=obj_qpos)
        return s.qpos, s.qvel

    qp, qv = q0, v0
    for _ in range(45):
        qp, qv = step(qp, qv)
    assert np.isfinite(np.asarray(qp)).all()
    # without the chair the pure-PD humanoid collapses to z~0.13
    # (test_engine.test_contact_collapse_matches_mujoco); the seat at z~0.62
    # must catch it
    assert float(qp[2]) > 0.35, float(qp[2])
