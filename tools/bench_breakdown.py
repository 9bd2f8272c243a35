"""Per-component timing of the substep at production batch on TPU.

Each stage is timed as an incremental pipeline (stage N includes stages
< N's computation but XLA may fuse/DCE differently; the deltas are still
the best available attribution), reps chained in one jitted scan."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import joblib

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.physics import contact as ct
from kinpoly_tpu.physics import dynamics as dyn, engine as eng, ltdl

BATCH = int(os.environ.get("B", "2048"))
REPS = int(os.environ.get("REPS", "20"))

spec = parse_humanoid(
    "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
# SOLVER_PALLAS=1 profiles the production kernel path (pallas LTDL + PSOR) —
# the configuration whose 8192-env dip (scaling_r3.json) needs attribution
_kw = (dict(solver="pallas_ltdl", use_pallas_pgs=True)
       if os.environ.get("SOLVER_PALLAS") else {})
model = eng.build_model(spec, uhc_control_params(spec), **_kw)
tables, topo = model.tables, model.topo

if model.solver == "pallas_ltdl":
    from kinpoly_tpu.physics import pallas_ltdl as pltdl
    _factor = pltdl.make_vmappable_factor(topo)
    _solve1 = lambda Rf, b: pltdl.make_vmappable_solve(topo)(Rf, b[..., None])[..., 0]
else:
    _factor = lambda R: ltdl.factor(topo, R)
    _solve1 = lambda Rf, b: ltdl.solve(topo, Rf, b)

rng = np.random.RandomState(0)
standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
qpos = np.asarray(standing["qpos"], np.float64)[None].repeat(BATCH, 0)
qpos[:, 7:] += rng.uniform(-0.1, 0.1, (BATCH, 69))
qpos = qpos.astype(np.float32)
qvel = (rng.randn(BATCH, 75) * 0.1).astype(np.float32)
ctrl = (rng.randn(BATCH, 69) * 0.01).astype(np.float32)
vf = (rng.randn(BATCH, 6) * 0.01).astype(np.float32)
base_pos = qpos[:, 7:].copy()
base_rot = np.tile(np.asarray([0.7071, 0.7071, 0, 0], np.float32), (BATCH, 1))


def timed(name, fn):
    def run(q, v):
        def step(c, _):
            out = fn(q + c * 1e-7, v)
            return c + jnp.asarray(out).ravel()[0] * 1e-20, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return c
    f = jax.jit(run)
    args = (jnp.asarray(qpos), jnp.asarray(qvel))
    _ = float(f(*args))
    t0 = time.time()
    _ = float(f(*args))
    dt = (time.time() - t0) / REPS
    print(f"{name:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def hp(f):
    def g(*a, **k):
        with jax.default_matmul_precision("highest"):
            return f(*a, **k)
    return g


@hp
def s_kin(q, v):
    return dyn.kin_state(spec, tables, q).phi


@hp
def s_kin_crba(q, v):
    ks = dyn.kin_state(spec, tables, q)
    return ltdl.crba_packed(spec, tables, topo, ks, via_dense=False)


@hp
def s_kin_crba_bias(q, v):
    ks = dyn.kin_state(spec, tables, q)
    R = ltdl.crba_packed(spec, tables, topo, ks, via_dense=False)
    return dyn.bias_force(spec, tables, ks, v) + R[..., 0]


@hp
def s_factors(q, v):
    ks = dyn.kin_state(spec, tables, q)
    R = ltdl.crba_packed(spec, tables, topo, ks, via_dense=False)
    C = dyn.bias_force(spec, tables, ks, v)
    kd = jnp.concatenate([jnp.zeros((BATCH, 6), q.dtype),
                          jnp.broadcast_to(jnp.asarray(model.ctrl.jkd, q.dtype),
                                           (BATCH, 69))], -1)
    Rf_A = _factor(ltdl.add_diag(topo, R, kd * model.dt))
    Rf_M = _factor(R)
    x = _solve1(Rf_A, C)
    return Rf_M[..., 0] + x


@hp
def s_contact_build(q, v):
    ks = dyn.kin_state(spec, tables, q)
    cand = jnp.asarray(model.cand_verts, q.dtype)
    cs = ct.floor_contacts(spec, cand, model.cand_body, ks.fk_res.xpos,
                           ks.fk_res.xquat, model.contact_top_k,
                           margin=spec.geom_margin, friction=model.friction)
    J = ct.contact_jacobian(cs, ks.phi, tables.anc_dof_body)
    Jl, dl, al = ct.joint_limit_contacts(q, spec.jnt_range, model.limit_top_k, nv=75)
    return J.sum() + Jl.sum() + cs.depth.sum() + dl.sum()


@hp
def s_full_nosolver(q, v):
    """Everything except the PSOR iterations (f forced to 0)."""
    m2 = eng.PhysicsModel(**{**model.__dict__, "contact_iters": 0})
    st = eng.substep(m2, eng.SimState(q, v), jnp.asarray(ctrl),
                     jnp.asarray(vf), jnp.asarray(base_pos), jnp.asarray(base_rot))
    return st.qpos


@hp
def s_full(q, v):
    st = eng.substep(model, eng.SimState(q, v), jnp.asarray(ctrl),
                     jnp.asarray(vf), jnp.asarray(base_pos), jnp.asarray(base_rot))
    return st.qpos


@hp
def s_ctrl_step(q, v):
    st = eng.control_step(model, eng.SimState(q, v),
                          jnp.concatenate([jnp.asarray(ctrl), jnp.asarray(vf)], -1),
                          jnp.asarray(base_pos), jnp.asarray(base_rot))
    return st.qpos


if __name__ == "__main__":
    print(f"batch={BATCH} reps={REPS} dev={jax.devices()[0]}", flush=True)
    timed("kin_state", s_kin)
    timed("kin+crba_packed", s_kin_crba)
    timed("kin+crba+bias", s_kin_crba_bias)
    timed("kin+crba+bias+2factors+1solve", s_factors)
    timed("contacts build (floor+limits+J)", s_contact_build)
    timed("substep minus PSOR iters", s_full_nosolver)
    timed("substep full", s_full)
    timed("control_step (15 substeps)", s_ctrl_step)
