"""Bisect bench.py-fast vs bench_diff-slow: reuse bench.build() verbatim."""
import os, sys, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault('BENCH_N_ENVS', '512')
os.environ.setdefault('BENCH_N_STEPS', '8')
import jax
import jax.numpy as jnp
import numpy as np

import bench

fn, carry, params, norm, model = bench.build()
c = fn(carry, params, norm)
jax.block_until_ready(c)
print('warm devices:', c.obs.devices(), flush=True)

t0 = time.time()
for _ in range(5):
    c = fn(c, params, norm)
jax.block_until_ready(c)
print('bench-build chained: %.1f ms/iter' % ((time.time() - t0) / 5 * 1e3), flush=True)

# identical but NOT chaining the carry (bench.py style: carry = fn(carry...))
t0 = time.time()
cc = carry
for _ in range(5):
    cc = fn(cc, params, norm)
jax.block_until_ready(cc)
print('bench-style loop   : %.1f ms/iter' % ((time.time() - t0) / 5 * 1e3), flush=True)

# force data materialization
t0 = time.time()
cc = carry
for _ in range(5):
    cc = fn(cc, params, norm)
s = float(np.asarray(cc.obs).sum())
print('with host fetch    : %.1f ms/iter (sum=%.3f)' % ((time.time() - t0) / 5 * 1e3, s), flush=True)
