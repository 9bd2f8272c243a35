"""Isolate the in-rollout Pallas slowdown: time chol_solve_only at the
rollout's real shapes (R=1 PD solve, R=56 fused contact solve) vs R=8,
vs the XLA path, scan-amortized with honest host fetch."""
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.physics.pallas_chol import chol_solve_only

B = int(os.environ.get('B', '512'))
n, K = 75, 40
rng = np.random.RandomState(0)
J = rng.randn(B, n, n + 8).astype(np.float32)
A = jnp.asarray(J @ np.swapaxes(J, -1, -2) + np.eye(n, dtype=np.float32) * 10)


def run(R, use_pallas):
    Bm = jnp.asarray(rng.randn(B, n, R).astype(np.float32))

    @jax.jit
    def prog(A, Bm):
        def step(c, _):
            if use_pallas:
                x = chol_solve_only(A + c * 1e-9, Bm)
            else:
                with jax.default_matmul_precision('highest'):
                    L = jnp.linalg.cholesky(A + c * 1e-9)
                    y = jax.scipy.linalg.solve_triangular(L, Bm, lower=True)
                    x = jax.scipy.linalg.solve_triangular(
                        jnp.swapaxes(L, -1, -2), y, lower=False)
            return c + x.sum() * 1e-20, None
        c, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=K)
        return c

    _ = float(prog(A, Bm))
    t0 = time.time()
    _ = float(prog(A, Bm))
    tag = 'pallas' if use_pallas else 'xla   '
    print(f'{tag} R={R:3d}: {(time.time()-t0)/K*1e3:8.3f} ms/solve', flush=True)


for R in (1, 8, 56):
    run(R, False)
    run(R, True)
