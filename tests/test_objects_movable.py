"""Movable scene-object dynamics (VERDICT r1 item 4): free-body objects with
two-way contact coupling. Reference behavior: the MJCF objects are free
bodies (`_all_step.xml:190-213`); push success = box displaced > 0.1 m
(`scripts/eval_pose_all.py:400-420`)."""

import jax
import jax.numpy as jnp
import joblib
import numpy as np
import pytest

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.physics import engine as eng

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml"
STANDING = "/root/reference/sample_data/standing_neutral.pkl"

BOX = 1          # object order in the XML: chair, box, table, Can, step
BOX_REST_Z = 0.221  # geom pos z -0.1, half-size z 0.12 -> bottom at -0.22


@pytest.fixture(scope="module")
def setup():
    spec = parse_humanoid(XML)
    model = eng.build_model(spec, uhc_control_params(spec),
                            with_objects=True, movable_objects=True)
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


def run(model, state, n, ctrl=None):
    ctrl_j = jnp.zeros(69, jnp.float64) if ctrl is None else ctrl
    vf = jnp.zeros(6, jnp.float64)
    base_pos = state.qpos[7:]
    base_rot = jnp.asarray([0.7071067811865476, 0.7071067811865476, 0.0, 0.0])

    def body(s, _):
        return eng.substep(model, s, ctrl_j, vf, base_pos, base_rot), None

    out, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n))(state)
    return out


def test_box_at_rest_stays(setup):
    spec, model, qpos, qvel = setup
    obj = parked(len(spec.objects))
    obj[BOX] = [3.0, 0.0, BOX_REST_Z, 1.0, 0, 0, 0]   # far from the humanoid
    st = eng.SimState(jnp.asarray(qpos), jnp.asarray(qvel),
                      jnp.asarray(obj), jnp.zeros((len(spec.objects), 6)))
    out = run(model, st, 90)      # 0.2 s
    drift = np.asarray(out.obj_qpos[BOX, :3]) - obj[BOX, :3]
    assert np.abs(drift[:2]).max() < 5e-3, drift
    assert abs(drift[2]) < 5e-3, drift
    assert np.abs(np.asarray(out.obj_qvel[BOX])).max() < 0.2


def test_box_drops_and_settles(setup):
    spec, model, qpos, qvel = setup
    obj = parked(len(spec.objects))
    obj[BOX] = [3.0, 0.0, BOX_REST_Z + 0.05, 1.0, 0, 0, 0]
    st = eng.SimState(jnp.asarray(qpos), jnp.asarray(qvel),
                      jnp.asarray(obj), jnp.zeros((len(spec.objects), 6)))
    out = run(model, st, 300)     # 0.67 s: fall 5 cm (~0.1 s) + settle
    z = float(out.obj_qpos[BOX, 2])
    assert abs(z - BOX_REST_Z) < 0.02, z
    assert np.abs(np.asarray(out.obj_qvel[BOX])).max() < 0.5


def test_humanoid_pushes_box(setup):
    """Two-way coupling: a moving humanoid overlapping the box transfers
    momentum; the box translates away (the 'push' task physics)."""
    spec, model, qpos, qvel = setup
    obj = parked(len(spec.objects))
    # box in front of the humanoid at thigh height, slightly overlapping
    obj[BOX] = [qpos[0] + 0.32, qpos[1], 0.9, 1.0, 0, 0, 0]
    q = qpos.copy()
    v = qvel.copy()
    v[0] = 1.5                      # humanoid moving +x into the box
    st = eng.SimState(jnp.asarray(q), jnp.asarray(v),
                      jnp.asarray(obj), jnp.zeros((len(spec.objects), 6)))
    out = run(model, st, 60)
    dx = float(out.obj_qpos[BOX, 0]) - obj[BOX, 0]
    assert dx > 0.01, dx            # box pushed away
    assert float(out.obj_qvel[BOX, 0]) > 0.05


def test_heavy_chair_barely_moves(setup):
    """Same push against the 1e5 kg chair base: essentially static."""
    spec, model, qpos, qvel = setup
    CHAIR = 0
    obj = parked(len(spec.objects))
    obj[CHAIR] = [qpos[0] + 0.35, qpos[1], 0.6, 1.0, 0, 0, 0]
    q = qpos.copy()
    v = qvel.copy()
    v[0] = 1.5
    st = eng.SimState(jnp.asarray(q), jnp.asarray(v),
                      jnp.asarray(obj), jnp.zeros((len(spec.objects), 6)))
    out = run(model, st, 60)
    dx = float(out.obj_qpos[CHAIR, 0]) - obj[CHAIR, 0]
    assert abs(dx) < 2e-3, dx


def test_static_mode_unchanged(setup):
    """movable_objects=False keeps the round-1 static-scenery semantics."""
    spec, _, qpos, qvel = setup
    model_s = eng.build_model(parse_humanoid(XML), uhc_control_params(parse_humanoid(XML)),
                              with_objects=True, movable_objects=False)
    st = eng.SimState(jnp.asarray(qpos), jnp.asarray(qvel))
    out = run(model_s, st, 15)
    assert out.obj_qpos is None and out.obj_qvel is None
    assert np.isfinite(np.asarray(out.qpos)).all()


def test_split_of_equivalence(setup):
    """Round-4 split-OF path (object-floor rows kept out of the humanoid
    Jacobian / fused mass solve) solves the same contact QP as the round-3
    merged path: identical fixed point, only the Gauss-Seidel sweep order
    differs. Run the push scenario down both paths at high iteration count
    and require trajectory agreement."""
    spec, model, qpos, qvel = setup
    import dataclasses
    m_split = dataclasses.replace(model, split_of=True, contact_iters=60)
    m_merged = dataclasses.replace(model, split_of=False, contact_iters=60)
    obj = parked(len(spec.objects))
    obj[BOX] = [qpos[0] + 0.32, qpos[1], 0.9, 1.0, 0, 0, 0]
    v = qvel.copy()
    v[0] = 1.5
    st = eng.SimState(jnp.asarray(qpos), jnp.asarray(v),
                      jnp.asarray(obj), jnp.zeros((len(spec.objects), 6)))
    a = run(m_split, st, 60)
    b = run(m_merged, st, 60)
    assert np.allclose(np.asarray(a.qpos), np.asarray(b.qpos),
                       atol=1e-4), np.abs(np.asarray(a.qpos - b.qpos)).max()
    assert np.allclose(np.asarray(a.obj_qpos[BOX]), np.asarray(b.obj_qpos[BOX]),
                       atol=1e-4), np.abs(np.asarray(a.obj_qpos - b.obj_qpos)).max()
    assert np.allclose(np.asarray(a.qvel), np.asarray(b.qvel), atol=5e-3)

def test_compact_full_k_equivalence(setup):
    """Active-set compaction at full K (gather every block) solves the same
    contact QP as the uncompacted path — the gather only reorders the
    Gauss-Seidel sweep (by activity/depth instead of candidate order), so at
    high iteration count the trajectories must agree."""
    spec, model, qpos, qvel = setup
    import dataclasses
    n_hb = model.contact_top_k + model.object_top_k + model.limit_top_k
    m_full = dataclasses.replace(model, contact_iters=60)
    m_comp = dataclasses.replace(model, contact_iters=60,
                                 compact_k=(n_hb, model.obj_floor_top_k))
    obj = parked(len(spec.objects))
    obj[BOX] = [qpos[0] + 0.32, qpos[1], 0.9, 1.0, 0, 0, 0]
    v = qvel.copy()
    v[0] = 1.5
    st = eng.SimState(jnp.asarray(qpos), jnp.asarray(v),
                      jnp.asarray(obj), jnp.zeros((len(spec.objects), 6)))
    a = run(m_full, st, 60)
    b = run(m_comp, st, 60)
    assert np.allclose(np.asarray(a.qpos), np.asarray(b.qpos),
                       atol=1e-4), np.abs(np.asarray(a.qpos - b.qpos)).max()
    assert np.allclose(np.asarray(a.obj_qpos[BOX]), np.asarray(b.obj_qpos[BOX]),
                       atol=1e-4)
    assert np.allclose(np.asarray(a.qvel), np.asarray(b.qvel), atol=5e-3)


def test_compact_production_k_behaviour(setup):
    """Production compaction (16, 8): with fewer slots than candidate blocks
    the solve keeps every ACTIVE contact (typical active count < 16) and the
    physics stays equivalent on the interaction scenarios."""
    spec, model, qpos, qvel = setup
    import dataclasses
    m_full = dataclasses.replace(model, contact_iters=60)
    m_comp = dataclasses.replace(model, contact_iters=60, compact_k=(16, 8))
    obj = parked(len(spec.objects))
    obj[BOX] = [qpos[0] + 0.32, qpos[1], 0.9, 1.0, 0, 0, 0]
    v = qvel.copy()
    v[0] = 1.5
    st = eng.SimState(jnp.asarray(qpos), jnp.asarray(v),
                      jnp.asarray(obj), jnp.zeros((len(spec.objects), 6)))
    a = run(m_full, st, 60)
    b = run(m_comp, st, 60)
    # box pushed away in both, same displacement to contact-solve tolerance
    assert float(b.obj_qpos[BOX, 0]) - obj[BOX, 0] > 0.01
    assert np.allclose(np.asarray(a.obj_qpos[BOX]), np.asarray(b.obj_qpos[BOX]),
                       atol=2e-3), np.abs(np.asarray(a.obj_qpos[BOX] - b.obj_qpos[BOX])).max()
    # this scenario deliberately saturates the active set (deep thigh-box
    # interpenetration: ~12 floor + 8 object actives vs 16 slots), so the
    # compacted solve drops the shallowest actives and the QP differs
    # slightly — measured 3.0e-3 max qpos drift over 60 substeps, with the
    # box displacement unchanged; typical AR rollouts stay far below 16
    assert np.allclose(np.asarray(a.qpos), np.asarray(b.qpos),
                       atol=5e-3), np.abs(np.asarray(a.qpos - b.qpos)).max()


def test_compact_batched_vmap(setup):
    """Compaction under vmap (the env-batched production shape): per-env
    gather indices, static shapes, finite results."""
    spec, model, qpos, qvel = setup
    import dataclasses
    m_comp = dataclasses.replace(model, compact_k=(16, 8))
    obj = parked(len(spec.objects))
    obj[BOX] = [qpos[0] + 0.32, qpos[1], 0.9, 1.0, 0, 0, 0]
    B = 4
    v = np.tile(qvel, (B, 1))
    v[:, 0] = np.linspace(0.5, 2.0, B)
    st = eng.SimState(jnp.asarray(np.tile(qpos, (B, 1))), jnp.asarray(v),
                      jnp.asarray(np.tile(obj, (B, 1, 1))),
                      jnp.zeros((B, len(spec.objects), 6)))
    ctrl_j = jnp.zeros((B, 69), jnp.float64)
    vf = jnp.zeros((B, 6), jnp.float64)
    base_pos = st.qpos[:, 7:]
    base_rot = jnp.tile(
        jnp.asarray([0.7071067811865476, 0.7071067811865476, 0.0, 0.0]), (B, 1))

    def one(s, c, f, bp, br):
        def body(ss, _):
            return eng.substep(m_comp, ss, c, f, bp, br), None
        return jax.lax.scan(body, s, None, length=30)[0]

    out = jax.jit(jax.vmap(one))(st, ctrl_j, vf, base_pos, base_rot)
    assert np.isfinite(np.asarray(out.qpos)).all()
    assert np.isfinite(np.asarray(out.obj_qpos)).all()
    # faster humanoid pushes the box further (monotone in approach speed)
    dx = np.asarray(out.obj_qpos[:, BOX, 0]) - obj[BOX, 0]
    assert dx[-1] > dx[0]
