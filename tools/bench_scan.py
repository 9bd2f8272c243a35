"""Amortized per-substep cost: scan K repetitions inside one call."""
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
import joblib

cpu = jax.local_devices(backend='cpu')[0]
with jax.default_device(cpu):
    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.defaults import BASE_ROT, uhc_control_params
    from kinpoly_tpu.physics import dynamics as dyn, engine as eng, fk as fklib
    spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
    model = eng.build_model(spec, uhc_control_params(spec))
    standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
    q0 = np.asarray(standing['qpos'], np.float32)

B = int(os.environ.get('B', '512'))
K = 60
rng = np.random.RandomState(0)
qpos = jnp.asarray(np.repeat(q0[None], B, 0) + rng.uniform(-0.02, 0.02, (B, 76)).astype(np.float32))
qvel = jnp.asarray(rng.uniform(-0.2, 0.2, (B, 75)).astype(np.float32))
base_rot = jnp.asarray(BASE_ROT, jnp.float32)
ctrl = jnp.zeros((B, 69), jnp.float32)
vf = jnp.zeros((B, 6), jnp.float32)
tables = model.tables


def timed(tag, fn, *args):
    s = fn(*args); _ = float(s)
    t0 = time.time()
    s = fn(*args); _ = float(s)
    dt = time.time() - t0
    print(f'{tag}: {dt/K*1e3:.3f} ms/step  ({dt*1e3:.0f} ms total)', flush=True)


def scanner(body):
    @jax.jit
    def f(q, v):
        def step(c, _):
            return body(c), None
        (q2, v2), _ = jax.lax.scan(step, (q, v), None, length=K)
        return q2.sum() + v2.sum()
    return f

P = jax.default_matmul_precision

def sub_full(c):
    q, v = c
    s = eng.substep(model, eng.SimState(q, v), ctrl, vf, q[:, 7:], base_rot)
    return s.qpos, s.qvel

def sub_nc(c):
    q, v = c
    s = eng.substep(model, eng.SimState(q, v), ctrl, vf, q[:, 7:], base_rot,
                    with_contacts=False)
    return s.qpos, s.qvel

def sub_justsolves(c):
    q, v = c
    with P('highest'):
        ks = dyn.kin_state(spec, tables, q)
        M = dyn.mass_matrix(spec, tables, ks)
        C = dyn.bias_force(spec, tables, ks, v)
        x = dyn.chol_solve(M, v - C)
    return q, v + 1e-9 * x

def sub_fkonly(c):
    q, v = c
    with P('highest'):
        r = fklib.fk(spec, q)
        d = fklib.dof_frames(spec, q, r)
    return q + 1e-9 * d.axis[:, :76, 0] * 0 + q * 0 + q if False else (q + 1e-9 * jnp.pad(d.axis[:, :75, 0], ((0, 0), (0, 1))), v)

timed('fk+dof only    ', scanner(sub_fkonly), qpos, qvel)
timed('kin+M+C+1solve ', scanner(sub_justsolves), qpos, qvel)
timed('substep no-con ', scanner(sub_nc), qpos, qvel)
timed('substep full   ', scanner(sub_full), qpos, qvel)
