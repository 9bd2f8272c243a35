"""Per-component substep timing on TPU with honest (scalar-fetch) sync."""
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
    from kinpoly_tpu.physics import contact as ct, dynamics as dyn, engine as eng, fk as fklib
    spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
    model = eng.build_model(spec, uhc_control_params(spec))
    standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
    q0 = np.asarray(standing['qpos'], np.float32)

B = int(os.environ.get('B', '512'))
rng = np.random.RandomState(0)
qpos = jnp.asarray(np.repeat(q0[None], B, 0) + rng.uniform(-0.05, 0.05, (B, 76)).astype(np.float32))
qvel = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 75)).astype(np.float32))
tables = model.tables

def timeit(tag, fn, *args, reps=10):
    s = fn(*args); _ = float(s)
    t0 = time.time()
    for _ in range(reps):
        s = fn(*args)
        _ = float(s)
    print(f'{tag}: {(time.time()-t0)/reps*1e3:.2f} ms', flush=True)

P = jax.default_matmul_precision

@jax.jit
def f_fk(q):
    with P('highest'):
        r = fklib.fk(spec, q)
        d = fklib.dof_frames(spec, q, r)
    return d.axis.sum()

@jax.jit
def f_kin(q):
    with P('highest'):
        ks = dyn.kin_state(spec, tables, q)
    return ks.ic_world.sum()

@jax.jit
def f_mass(q):
    with P('highest'):
        ks = dyn.kin_state(spec, tables, q)
        M = dyn.mass_matrix(spec, tables, ks)
    return M.sum()

@jax.jit
def f_bias(q, v):
    with P('highest'):
        ks = dyn.kin_state(spec, tables, q)
        C = dyn.bias_force(spec, tables, ks, v)
    return C.sum()

@jax.jit
def f_chol(q, v):
    with P('highest'):
        ks = dyn.kin_state(spec, tables, q)
        M = dyn.mass_matrix(spec, tables, ks)
        x = dyn.chol_solve(M, v)
        y = dyn.chol_solve(M + 0.002 * jnp.eye(75, dtype=M.dtype), v)
    return x.sum() + y.sum()

base_rot = jnp.asarray(BASE_ROT, jnp.float32)

@jax.jit
def f_substep_nc(q, v):
    s = eng.substep(model, eng.SimState(q, v), jnp.zeros((B, 69), jnp.float32),
                    jnp.zeros((B, 6), jnp.float32), q[:, 7:], base_rot,
                    with_contacts=False)
    return s.qpos.sum()

@jax.jit
def f_substep(q, v):
    s = eng.substep(model, eng.SimState(q, v), jnp.zeros((B, 69), jnp.float32),
                    jnp.zeros((B, 6), jnp.float32), q[:, 7:], base_rot)
    return s.qpos.sum()

timeit('fk+dof      ', f_fk, qpos)
timeit('kin_state   ', f_kin, qpos)
timeit('mass matrix ', f_mass, qpos)
timeit('bias force  ', f_bias, qpos, qvel)
timeit('2x cho_solve', f_chol, qpos, qvel)
timeit('substep(nc) ', f_substep_nc, qpos, qvel)
timeit('substep     ', f_substep, qpos, qvel)
