"""Measure TPU f32 cholesky+triangular-solve accuracy on the actual mass
matrix vs CPU f64 ground truth."""
import os, sys
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
import joblib

cpu = jax.local_devices(backend='cpu')[0]

with jax.default_device(cpu):
    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.physics import dynamics as dyn
    spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
    tables = dyn.build_tables(spec)
    standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
    q = np.asarray(standing['qpos'], np.float64)
    ks = dyn.kin_state(spec, tables, jnp.asarray(q))
    M = np.asarray(dyn.mass_matrix(spec, tables, ks))

print('cond(M):', np.linalg.cond(M))
rhs = np.random.RandomState(0).randn(75)
x_ref = np.linalg.solve(M, rhs)

M32 = jnp.asarray(M, jnp.float32)
r32 = jnp.asarray(rhs, jnp.float32)

def solve(Mx, rx):
    L = jnp.linalg.cholesky(Mx)
    y = jax.scipy.linalg.solve_triangular(L, rx, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

for dev, name in [(jax.devices()[0], 'tpu_default'), (cpu, 'cpu_f32')]:
    with jax.default_device(dev):
        x = np.asarray(jax.jit(solve)(jax.device_put(M32, dev), jax.device_put(r32, dev)))
        rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        print(f'{name}: rel err {rel:.3e}  finite {np.isfinite(x).all()}')

# and with precision context
def solve_hp(Mx, rx):
    with jax.default_matmul_precision('highest'):
        L = jnp.linalg.cholesky(Mx)
        y = jax.scipy.linalg.solve_triangular(L, rx, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

with jax.default_device(jax.devices()[0]):
    x = np.asarray(jax.jit(solve_hp)(M32, r32))
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    print(f'tpu_highest: rel err {rel:.3e}  finite {np.isfinite(x).all()}')
