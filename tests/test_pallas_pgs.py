"""Pallas PSOR kernel parity vs the lax reference solver (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.physics import contact as ct
from kinpoly_tpu.physics.pallas_pgs import pgs_solve_pallas


def _random_system(rng, N, K):
    C = 3 * K
    # SPD A via J M^-1 J^T structure
    J = rng.randn(N, C, 40)
    A = J @ np.swapaxes(J, -1, -2) + np.eye(C) * 0.5
    rhs = rng.randn(N, C)
    d = rng.uniform(0.85, 0.95, (N, K))
    active = rng.rand(N, K) > 0.3
    diagA = np.diagonal(A, axis1=-2, axis2=-1)
    R = (1 - np.repeat(d, 3, -1)) / np.repeat(d, 3, -1) * diagA
    R = np.where(np.repeat(active, 3, -1), R, 1e8)
    A3 = A.reshape(N, K, 3, K, 3)
    D = np.stack([A3[:, k, :, k, :] for k in range(K)], axis=1)
    D = D + R.reshape(N, K, 3)[..., None] * np.eye(3) + 1e-9 * np.eye(3)
    Dinv = np.linalg.inv(D)
    mu = np.full((N, K), 1.0)
    return (jnp.asarray(A, jnp.float32), jnp.asarray(rhs, jnp.float32),
            jnp.asarray(Dinv, jnp.float32), jnp.asarray(R, jnp.float32),
            jnp.asarray(mu, jnp.float32), jnp.asarray(active))


def _reference_pgs(A, rhs, Dinv, R, mu, active, iters):
    """The lax fori-loop path from contact.solve_contacts, batched via vmap."""
    nK = mu.shape[-1]

    def one(A, rhs, Dinv, R, mu, active):
        def project(f3, mu_k):
            fn = jnp.maximum(f3[0], 0.0)
            tn = jnp.linalg.norm(f3[1:]).clip(1e-12)
            s = jnp.minimum(1.0, mu_k * fn / tn)
            return jnp.concatenate([fn[None], f3[1:] * s])

        def gs_block(k, f):
            Ak = jax.lax.dynamic_slice_in_dim(A, 3 * k, 3, axis=0)
            fk = jax.lax.dynamic_slice_in_dim(f, 3 * k, 3)
            rk = jax.lax.dynamic_slice_in_dim(rhs, 3 * k, 3)
            Rk = jax.lax.dynamic_slice_in_dim(R, 3 * k, 3)
            res = rk - Ak @ f - Rk * fk
            Dk = jax.lax.dynamic_index_in_dim(Dinv, k, keepdims=False)
            mu_k = jax.lax.dynamic_index_in_dim(mu, k, keepdims=False)
            a_k = jax.lax.dynamic_index_in_dim(active, k, keepdims=False)
            fk_new = project(fk + Dk @ res, mu_k) * a_k
            return jax.lax.dynamic_update_slice_in_dim(f, fk_new, 3 * k, axis=0)

        def sweep(_, f):
            return jax.lax.fori_loop(0, nK, gs_block, f)

        return jax.lax.fori_loop(0, iters, sweep, jnp.zeros_like(rhs))

    return jax.vmap(one)(A, rhs, Dinv, R, mu, active.astype(rhs.dtype))


def test_pallas_pgs_matches_reference(rng):
    N, K, iters = 5, 6, 12
    A, rhs, Dinv, R, mu, active = _random_system(rng, N, K)
    ref = np.asarray(_reference_pgs(A, rhs, Dinv, R, mu, active, iters))
    out = np.asarray(pgs_solve_pallas(A, rhs, Dinv, R, mu, active,
                                      iters=iters, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
