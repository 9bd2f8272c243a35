"""Per-action success rules on golden trajectories (reference
``scripts/eval_pose_all.py:337-467``; fail-safe counts as failure :459-460).

Positive cases come from the committed action-take bank
(tools/gen_action_clips.py); negatives are standing-still takes that must
not satisfy any contact/displacement rule.
"""

import joblib
import numpy as np
import pytest

import jax.numpy as jnp

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.metrics import pose_metrics as pm
from kinpoly_tpu.physics import contact as ct, fk as fklib

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml"
BANK = "/root/repo/data_bank/action_takes.pkl"
STANDING = "/root/reference/sample_data/standing_neutral.pkl"


@pytest.fixture(scope="module")
def setup():
    spec = parse_humanoid(XML)
    scene = ct.scene_from_spec(spec)
    takes = joblib.load(BANK)
    return spec, scene, takes


def full_obj_seq(spec, take):
    """(T, n_obj, 7): the active object at its context pose, others parked
    far away (the AR env's convert_obj_qpos semantics)."""
    T = take["qpos"].shape[0]
    n_obj = len(spec.objects)
    obj = np.zeros((T, n_obj, 7), np.float32)
    obj[:, :, 0] = np.arange(n_obj)[None] * 100 + 100
    obj[:, :, 3] = 1.0
    idx = pm.action_object_indices(spec)
    obj[:, int(idx[pm.ACTIONS.index(take["action"])])] = take["obj_pose"]
    if "table_pose" in take:
        obj[:, 2] = take["table_pose"]
    return obj


def head_pose_of(spec, qpos):
    res = fklib.fk(spec, qpos)
    h = spec.body_index("Head")
    return jnp.concatenate([res.xpos[:, h], res.xquat[:, h]], axis=-1)


@pytest.mark.parametrize("action", pm.ACTIONS)
def test_gt_take_succeeds(setup, action):
    spec, scene, takes = setup
    take = takes[f"{action}-00"]
    q = jnp.asarray(take["qpos"])
    hp = head_pose_of(spec, q)
    assert pm.action_success(spec, scene, q, jnp.asarray(full_obj_seq(spec, take)),
                             action, head_pose_pred=hp, head_pose_gt=hp)


@pytest.mark.parametrize("action", ["sit", "push", "step"])
def test_standing_fails(setup, action):
    """A humanoid that just stands never contacts the chair/step, never
    displaces the box."""
    spec, scene, takes = setup
    take = takes[f"{action}-00"]
    T = take["qpos"].shape[0]
    standing = joblib.load(STANDING)
    q = jnp.asarray(np.repeat(
        np.asarray(standing["qpos"], np.float32)[None], T, 0))
    obj = full_obj_seq(spec, take)
    # freeze the object at its first pose (no kinematic push either)
    obj = np.repeat(obj[:1], T, 0)
    hp = head_pose_of(spec, q)
    assert not pm.action_success(spec, scene, q, jnp.asarray(obj), action,
                                 head_pose_pred=hp, head_pose_gt=hp)


def test_avoid_fails_on_contact(setup):
    """Walking straight through the Can position must fail avoid."""
    spec, scene, takes = setup
    take = takes["avoid-00"]
    q = np.asarray(take["qpos"]).copy()
    # remove the lateral detour: force x back to the straight path
    q[:, 0] = q[0, 0]
    q = jnp.asarray(q)
    hp = head_pose_of(spec, q)
    assert not pm.action_success(spec, scene, q,
                                 jnp.asarray(full_obj_seq(spec, take)),
                                 "avoid", head_pose_pred=hp, head_pose_gt=hp)


def test_avoid_fails_on_head_drift(setup):
    spec, scene, takes = setup
    take = takes["avoid-00"]
    q = jnp.asarray(take["qpos"])
    hp = head_pose_of(spec, q)
    drifted = hp.at[-1, :3].add(jnp.asarray([1.0, 0.0, 0.0]))
    assert not pm.action_success(spec, scene, q,
                                 jnp.asarray(full_obj_seq(spec, take)),
                                 "avoid", head_pose_pred=drifted, head_pose_gt=hp)


def test_fail_safe_counts_as_failure(setup):
    """eval_pose_all.py:459-460: any fail-safe teleport voids the success."""
    spec, scene, takes = setup
    take = takes["sit-00"]
    q = jnp.asarray(take["qpos"])
    hp = head_pose_of(spec, q)
    obj = jnp.asarray(full_obj_seq(spec, take))
    assert pm.action_success(spec, scene, q, obj, "sit",
                             head_pose_pred=hp, head_pose_gt=hp,
                             fail_safe_used=False)
    assert not pm.action_success(spec, scene, q, obj, "sit",
                                 head_pose_pred=hp, head_pose_gt=hp,
                                 fail_safe_used=True)


def test_push_requires_displacement(setup):
    spec, scene, takes = setup
    take = takes["push-00"]
    q = jnp.asarray(take["qpos"])
    obj = full_obj_seq(spec, take)
    moved = pm.action_success(spec, scene, q, jnp.asarray(obj), "push")
    frozen = np.repeat(obj[:1], obj.shape[0], 0)
    unmoved = pm.action_success(spec, scene, q, jnp.asarray(frozen), "push")
    assert moved and not unmoved


def test_action_object_indices_resolve(setup):
    spec, _, _ = setup
    idx = pm.action_object_indices(spec)
    names = [o.name for o in spec.objects]
    assert [names[i] for i in idx] == ["chair", "box", "Can", "step"]
