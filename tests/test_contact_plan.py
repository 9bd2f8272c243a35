"""Contact-plan hoisting (round-5 perf lever): candidate selection once per
control step (`engine.build_contact_plan`) with per-substep refresh of only
the planned candidates. With `plan_oversample` headroom the per-substep
top-K selection matches the full per-substep build unless a candidate from
outside the plan penetrates mid-step, so trajectories must agree to solver
tolerance on the interaction scenarios (reference hot loop:
`uhc/envs/humanoid_im.py:506-533`; contact scene `_all_step.xml:190-213`)."""

import dataclasses

import jax
import jax.numpy as jnp
import joblib
import numpy as np
import pytest

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.physics import engine as eng

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml"
XML_PLAIN = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml"
STANDING = "/root/reference/sample_data/standing_neutral.pkl"
BOX = 1


@pytest.fixture(scope="module")
def setup():
    spec = parse_humanoid(XML)
    model = eng.build_model(spec, uhc_control_params(spec),
                            with_objects=True, movable_objects=True,
                            compact_k=(16, 8))
    standing = joblib.load(STANDING)
    qpos = np.asarray(standing["qpos"], np.float64)
    qvel = np.asarray(standing["qvel"], np.float64)
    return spec, model, qpos, qvel


def parked(n_obj, dtype=np.float64):
    out = np.zeros((n_obj, 7), dtype)
    for i in range(n_obj):
        out[i, :3] = [(i + 1) * 100.0, 100.0, 1.0]
    out[:, 3] = 1.0
    return out


def run_ctrl(model, state, n_ctrl, ctrl=None):
    """n_ctrl control steps (15 substeps each) holding the standing pose."""
    act = jnp.zeros(69 + model.ctrl.vf_dim, jnp.float64) if ctrl is None else ctrl
    base_pos = state.qpos[7:]
    base_rot = jnp.asarray([0.7071067811865476, 0.7071067811865476, 0.0, 0.0])

    def body(s, _):
        return eng.control_step(model, s, act, base_pos, base_rot), None

    out, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n_ctrl))(state)
    return out


def _push_state(spec, qpos, qvel):
    obj = parked(len(spec.objects))
    obj[BOX] = [qpos[0] + 0.32, qpos[1], 0.9, 1.0, 0, 0, 0]
    v = qvel.copy()
    v[0] = 1.5
    return eng.SimState(jnp.asarray(qpos), jnp.asarray(v), jnp.asarray(obj),
                        jnp.zeros((len(spec.objects), 6))), obj


def test_plan_matches_full_build_push(setup):
    """Push scenario (humanoid into the box): planned vs full candidate
    build over 4 control steps (60 substeps)."""
    spec, model, qpos, qvel = setup
    m_plan = dataclasses.replace(model, plan_contacts=True, contact_iters=60)
    m_full = dataclasses.replace(model, plan_contacts=False, contact_iters=60)
    st, obj = _push_state(spec, qpos, qvel)
    a = run_ctrl(m_full, st, 4)
    b = run_ctrl(m_plan, st, 4)
    assert float(b.obj_qpos[BOX, 0]) - obj[BOX, 0] > 0.01  # box pushed
    assert np.allclose(np.asarray(a.qpos), np.asarray(b.qpos),
                       atol=5e-3), np.abs(np.asarray(a.qpos - b.qpos)).max()
    assert np.allclose(np.asarray(a.obj_qpos[BOX]), np.asarray(b.obj_qpos[BOX]),
                       atol=2e-3), np.abs(
        np.asarray(a.obj_qpos[BOX] - b.obj_qpos[BOX])).max()


def test_plan_matches_full_build_drop(setup):
    """Box dropped 5 cm above rest settles identically: object-floor rows
    come from the plan's of_idx, impact develops mid-control-step."""
    spec, model, qpos, qvel = setup
    m_plan = dataclasses.replace(model, plan_contacts=True)
    m_full = dataclasses.replace(model, plan_contacts=False)
    obj = parked(len(spec.objects))
    obj[BOX] = [3.0, 0.0, 0.271, 1.0, 0, 0, 0]
    st = eng.SimState(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(obj),
                      jnp.zeros((len(spec.objects), 6)))
    a = run_ctrl(m_full, st, 20)      # 0.67 s: fall + settle
    b = run_ctrl(m_plan, st, 20)
    assert abs(float(b.obj_qpos[BOX, 2]) - 0.221) < 0.02
    assert np.allclose(np.asarray(a.obj_qpos[BOX, :3]),
                       np.asarray(b.obj_qpos[BOX, :3]), atol=5e-3)
    assert np.allclose(np.asarray(a.qpos), np.asarray(b.qpos), atol=5e-3)


def test_plan_uhc_no_objects():
    """UHC model (no scene objects): plan carries floor + joint-limit
    candidates only; standing stays standing and matches the full build."""
    spec = parse_humanoid(XML_PLAIN)
    model = eng.build_model(spec, uhc_control_params(spec),
                            plan_contacts=False)
    m_plan = dataclasses.replace(model, plan_contacts=True)
    standing = joblib.load(STANDING)
    st = eng.SimState(jnp.asarray(np.asarray(standing["qpos"], np.float64)),
                      jnp.asarray(np.asarray(standing["qvel"], np.float64)))
    a = run_ctrl(model, st, 6)
    b = run_ctrl(m_plan, st, 6)
    assert np.allclose(np.asarray(a.qpos), np.asarray(b.qpos),
                       atol=2e-3), np.abs(np.asarray(a.qpos - b.qpos)).max()
    assert abs(float(b.qpos[2]) - float(st.qpos[2])) < 0.05   # still standing


def test_plan_batched_vmap(setup):
    """Planned path under vmap (production shape): per-env plan indices,
    static shapes, finite results, push monotone in approach speed."""
    spec, model, qpos, qvel = setup
    m_plan = dataclasses.replace(model, plan_contacts=True)
    obj = parked(len(spec.objects))
    obj[BOX] = [qpos[0] + 0.32, qpos[1], 0.9, 1.0, 0, 0, 0]
    B = 4
    v = np.tile(qvel, (B, 1))
    v[:, 0] = np.linspace(0.5, 2.0, B)
    st = eng.SimState(jnp.asarray(np.tile(qpos, (B, 1))), jnp.asarray(v),
                      jnp.asarray(np.tile(obj, (B, 1, 1))),
                      jnp.zeros((B, len(spec.objects), 6)))
    act = jnp.zeros((B, 69 + model.ctrl.vf_dim), jnp.float64)
    base_pos = st.qpos[:, 7:]
    base_rot = jnp.tile(
        jnp.asarray([0.7071067811865476, 0.7071067811865476, 0.0, 0.0]), (B, 1))

    def one(s, a, bp, br):
        def body(ss, _):
            return eng.control_step(m_plan, ss, a, bp, br), None
        return jax.lax.scan(body, s, None, length=2)[0]

    out = jax.jit(jax.vmap(one))(st, act, base_pos, base_rot)
    assert np.isfinite(np.asarray(out.qpos)).all()
    assert np.isfinite(np.asarray(out.obj_qpos)).all()
    dx = np.asarray(out.obj_qpos[:, BOX, 0]) - obj[BOX, 0]
    assert dx[-1] > dx[0]
