"""Micro-benchmark: Pallas PSOR kernel vs lax fori-loop reference on TPU."""
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo/tests')
from tests.test_pallas_pgs import _random_system, _reference_pgs
from kinpoly_tpu.physics.pallas_pgs import pgs_solve_pallas

N = int(os.environ.get('N', '4096'))
K = 18   # contact_top_k 12 + limit 6 (the engine's combined block count)
ITERS = 20
rng = np.random.RandomState(0)
A, rhs, Dinv, R, mu, active = _random_system(rng, N, K)

ref_fn = jax.jit(lambda *a: _reference_pgs(*a, ITERS))
pal_fn = jax.jit(lambda *a: pgs_solve_pallas(*a, iters=ITERS))

args = (A, rhs, Dinv, R, mu, active)
r1 = ref_fn(*args); jax.block_until_ready(r1)
r2 = pal_fn(*args); jax.block_until_ready(r2)
err = float(jnp.abs(r1 - r2).max())
print('max abs diff:', err, flush=True)

for name, fn in [('lax  ', ref_fn), ('pallas', pal_fn)]:
    t0 = time.time()
    for _ in range(20):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 20
    print(f'{name}: {dt*1e3:.2f} ms/solve  ({N/dt/1e6:.2f} M solves/s)', flush=True)
