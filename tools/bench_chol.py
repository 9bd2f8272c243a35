"""Pallas Cholesky vs XLA cholesky on TPU, scan-amortized timing."""
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.physics.pallas_chol import chol_factor_solve

B = int(os.environ.get('B', '512'))
n, R, K = 75, 8, 40
rng = np.random.RandomState(0)
J = rng.randn(B, n, n + 8).astype(np.float32)
A = jnp.asarray(J @ np.swapaxes(J, -1, -2) + np.eye(n, dtype=np.float32) * 10)
Bm = jnp.asarray(rng.randn(B, n, R).astype(np.float32))

def timed(tag, fn):
    s = fn(A, Bm); _ = float(s)
    t0 = time.time()
    s = fn(A, Bm); _ = float(s)
    print(f'{tag}: {(time.time()-t0)/K*1e3:.3f} ms/solve', flush=True)

@jax.jit
def xla_version(A, Bm):
    def step(c, _):
        with jax.default_matmul_precision('highest'):
            L = jnp.linalg.cholesky(A + c * 1e-9)
            y = jax.scipy.linalg.solve_triangular(L, Bm, lower=True)
            x = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(L, -1, -2), y, lower=False)
        return c + x.sum() * 1e-20, None
    c, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=K)
    return c

@jax.jit
def pallas_version(A, Bm):
    def step(c, _):
        L, x = chol_factor_solve(A + c * 1e-9, Bm)
        return c + x.sum() * 1e-20, None
    c, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=K)
    return c

# accuracy check on TPU
L, X = chol_factor_solve(A, Bm)
ref = np.linalg.solve(np.asarray(A, np.float64), np.asarray(Bm))
err = np.abs(np.asarray(X) - ref).max() / np.abs(ref).max()
print('pallas rel err vs f64:', err, flush=True)

timed('xla   ', xla_version)
timed('pallas', pallas_version)
