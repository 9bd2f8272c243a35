"""Pallas batched Cholesky factor/solve parity (interpret mode, CPU)."""

import numpy as np

from kinpoly_tpu.physics.pallas_chol import chol_apply, chol_factor_solve


def _spd(rng, batch, n):
    J = rng.randn(batch, n, n + 8)
    return (J @ np.swapaxes(J, -1, -2) + np.eye(n) * (n * 0.1)).astype(np.float32)


def test_factor_solve_matches_numpy(rng):
    batch, n, R = 3, 75, 5
    A = _spd(rng, batch, n)
    B = rng.randn(batch, n, R).astype(np.float32)
    L, X = chol_factor_solve(A, B, interpret=True)
    L, X = np.asarray(L), np.asarray(X)

    for i in range(batch):
        L_ref = np.linalg.cholesky(A[i].astype(np.float64))
        np.testing.assert_allclose(np.tril(L[i]), L_ref, rtol=5e-3, atol=5e-3)
        X_ref = np.linalg.solve(A[i].astype(np.float64), B[i])
        np.testing.assert_allclose(X[i], X_ref, rtol=5e-3, atol=5e-3)


def test_apply_matches_numpy(rng):
    batch, n, R = 2, 75, 3
    A = _spd(rng, batch, n)
    B = rng.randn(batch, n, R).astype(np.float32)
    L, _ = chol_factor_solve(A, B, interpret=True)
    X = np.asarray(chol_apply(np.asarray(L), B, interpret=True))
    for i in range(batch):
        X_ref = np.linalg.solve(A[i].astype(np.float64), B[i])
        np.testing.assert_allclose(X[i], X_ref, rtol=5e-3, atol=5e-3)


def test_solve_only_matches_numpy(rng):
    from kinpoly_tpu.physics.pallas_chol import chol_solve_only

    batch, n, R = 2, 75, 55
    A = _spd(rng, batch, n)
    B = rng.randn(batch, n, R).astype(np.float32)
    X = np.asarray(chol_solve_only(A, B, interpret=True))
    for i in range(batch):
        X_ref = np.linalg.solve(A[i].astype(np.float64), B[i])
        np.testing.assert_allclose(X[i], X_ref, rtol=5e-3, atol=5e-3)
