"""Ground-truth timing on the axon tunnel: block_until_ready does not wait,
so measure by fetching a scalar computed from the result."""
import os, sys, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault('BENCH_N_ENVS', '512')
os.environ.setdefault('BENCH_N_STEPS', '8')
import jax
import jax.numpy as jnp
import numpy as np

import bench

fn, carry, params, norm, model = bench.build()

# scalar-returning variant: true execute time + 4-byte fetch
import kinpoly_tpu.rl.rollout as ro
rollout = None
@jax.jit
def step_scalar(c, p, n):
    c2 = fn.__wrapped__(c, p, n) if hasattr(fn, '__wrapped__') else None
    return c2

# simpler: wrap fn output
fns = jax.jit(lambda c, p, n: (lambda cc: (cc, cc.obs.sum()))(fn(c, p, n)))

c, s = fns(carry, params, norm)
_ = float(s)
t0 = time.time()
for _ in range(5):
    c, s = fns(c, params, norm)
    _ = float(s)          # forces completion of each iteration
dt = (time.time() - t0) / 5
sub = 512 * 8 * 15
print('true per-iter: %.1f ms  -> %.0f substeps/s' % (dt * 1e3, sub / dt), flush=True)

# tunnel transfer bandwidth
big = jnp.ones((512, 784), jnp.float32) * 2  # on device
_ = float(big.sum())
t0 = time.time()
x = np.asarray(big)
print('fetch 1.6MB: %.2f s' % (time.time() - t0), flush=True)
