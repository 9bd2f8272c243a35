"""Debug harness: standing stability rollout trace (CPU, float64)."""
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import time
import joblib
import numpy as np
import jax.numpy as jnp
from tests.test_engine import get_phys_model, jit_control_step, STANDING

standing = joblib.load(STANDING)
q0 = jnp.asarray(standing['qpos']); v0 = jnp.asarray(standing['qvel'])
kin_pose = q0[7:]; action = jnp.zeros(75)
t0 = time.time()
step = jit_control_step(True)
qp, qv = step(q0, v0, action, kin_pose)
jax.block_until_ready(qp)
print('compile+first step', time.time() - t0, flush=True)
print('q0 z:', float(q0[2]), flush=True)
qp, qv = q0, v0
t0 = time.time()
for i in range(60):
    qp, qv = step(qp, qv, action, kin_pose)
    if i % 4 == 0:
        print(i, 'z=%.4f' % float(qp[2]), 'vz=%.3f' % float(qv[2]),
              'maxv=%.2f' % float(jnp.abs(qv).max()),
              'pose_err=%.3f' % float(jnp.abs(qp[7:] - kin_pose).max()), flush=True)
print('60 steps wall:', time.time() - t0, flush=True)
