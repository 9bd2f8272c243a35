"""MuJoCo 3.x CPU oracle: the reference global-coordinate model converted to
local coordinates by kinpoly_tpu.anim.mjcf. Built once per test session."""

import functools
import os
import tempfile

import numpy as np

REF_XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml"


@functools.lru_cache(maxsize=None)
def get_spec():
    from kinpoly_tpu.anim.mjcf import parse_humanoid

    return parse_humanoid(REF_XML)


@functools.lru_cache(maxsize=None)
def get_model(with_objects: bool = False, explicit_inertia: bool = False):
    import mujoco

    from kinpoly_tpu.anim.mjcf import export_local_mjcf

    out = os.path.join(tempfile.gettempdir(), f"kp_oracle_{int(with_objects)}_{int(explicit_inertia)}")
    xml = export_local_mjcf(get_spec(), out, with_objects=with_objects, explicit_inertia=explicit_inertia)
    return mujoco.MjModel.from_xml_path(xml)


def random_qpos(rng, scale=0.6):
    q = np.zeros(76)
    q[:3] = rng.randn(3) * 0.5
    q[2] += 1.0
    quat = rng.randn(4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] = rng.uniform(-scale, scale, 69)
    return q
