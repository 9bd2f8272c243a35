"""Tree-sparse LTDL (physics/ltdl.py) vs dense Cholesky on the real humanoid
mass matrix. Reference semantics: scipy cho_solve on mj_fullM
(uhc/envs/humanoid_im.py:429-430) and MuJoCo's internal mj_factorM."""

import jax
import jax.numpy as jnp
import joblib
import numpy as np
import pytest

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.physics import dynamics as dyn, ltdl

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml"
STANDING = "/root/reference/sample_data/standing_neutral.pkl"


@pytest.fixture(scope="module")
def setup():
    spec = parse_humanoid(XML)
    tables = dyn.build_tables(spec)
    topo = ltdl.build_topo(tables.dof_parent)
    rng = np.random.RandomState(3)
    standing = joblib.load(STANDING)
    qpos = np.asarray(standing["qpos"], np.float64)[None].repeat(8, 0)
    qpos[:, :3] += rng.uniform(-1, 1, (8, 3))
    qpos[:, 7:] += rng.uniform(-0.4, 0.4, (8, 69))
    qpos[:, 3:7] += rng.uniform(-0.2, 0.2, (8, 4))
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=-1, keepdims=True)
    ks = dyn.kin_state(spec, tables, jnp.asarray(qpos))
    M = dyn.mass_matrix(spec, tables, ks)
    return spec, tables, topo, ks, M, rng


def test_pack_unpack_roundtrip(setup):
    _, _, topo, _, M, _ = setup
    assert float(jnp.abs(ltdl.unpack(topo, ltdl.pack(topo, M)) - M).max()) < 1e-12


def test_crba_packed_matches_dense(setup):
    spec, tables, topo, ks, M, _ = setup
    Rp = ltdl.pack(topo, M)
    for via_dense in (True, False):
        R = ltdl.crba_packed(spec, tables, topo, ks, via_dense=via_dense)
        assert float(jnp.abs(R - Rp).max()) < 1e-10


def test_factor_reconstructs(setup):
    _, _, topo, _, M, _ = setup
    Rf = ltdl.factor(topo, ltdl.pack(topo, M))
    Lp = jnp.where(jnp.asarray(topo.diag_onehot, bool), 1.0, Rf)
    Lp = Lp * jnp.asarray(topo.valid, Rf.dtype)
    L = jnp.tril(ltdl.unpack(topo, Lp), -1) + jnp.eye(topo.nv)
    D = jax.vmap(jnp.diag)(ltdl.diag_of(topo, Rf))
    rec = jnp.swapaxes(L, -1, -2) @ D @ L
    assert float(jnp.abs(rec - M).max()) < 1e-10


def test_solve_matches_dense_chol(setup):
    _, _, topo, _, M, rng = setup
    Rf = ltdl.factor(topo, ltdl.pack(topo, M))
    b = jnp.asarray(rng.randn(8, 75))
    B = jnp.asarray(rng.randn(8, 75, 13))
    assert float(jnp.abs(ltdl.solve(topo, Rf, b) - dyn.chol_solve(M, b)).max()) < 1e-9
    assert float(jnp.abs(ltdl.solve(topo, Rf, B) - dyn.chol_solve(M, B)).max()) < 1e-9


def test_spd_diag_system(setup):
    """The stable-PD system (M + K_d dt) x = rhs via add_diag."""
    _, _, topo, _, M, rng = setup
    kd = np.concatenate([np.zeros(6), rng.uniform(10, 500, 69)]) * 0.00222222
    A = M + jnp.eye(75) * jnp.asarray(kd)
    b = jnp.asarray(rng.randn(8, 75))
    x = ltdl.solve(topo, ltdl.factor(
        topo, ltdl.add_diag(topo, ltdl.pack(topo, M), jnp.asarray(kd))), b)
    assert float(jnp.abs(x - dyn.chol_solve(A, b)).max()) < 1e-10


def test_f32_accuracy(setup):
    """f32 (the TPU production dtype): LTDL should be no worse than dense
    Cholesky in f32 relative error."""
    _, _, topo, _, M, rng = setup
    M32 = M.astype(jnp.float32)
    b32 = jnp.asarray(rng.randn(8, 75), jnp.float32)
    x64 = dyn.chol_solve(M, b32.astype(jnp.float64))
    x32 = ltdl.solve(topo, ltdl.factor(topo, ltdl.pack(topo, M32)), b32)
    xd32 = dyn.chol_solve(M32, b32)
    rel = float((jnp.abs(x32 - x64) / (jnp.abs(x64) + 1e-3)).max())
    rel_dense = float((jnp.abs(xd32 - x64) / (jnp.abs(x64) + 1e-3)).max())
    assert rel < max(2.0 * rel_dense, 1e-2)


def test_vmap_and_jit(setup):
    """Engine usage pattern: jitted, vmapped over envs."""
    spec, tables, topo, ks, M, rng = setup
    b = jnp.asarray(rng.randn(8, 75))

    @jax.jit
    def f(R, b):
        return ltdl.solve(topo, ltdl.factor(topo, R), b)

    one = jax.vmap(lambda R1, b1: f(R1[None], b1[None])[0])(ltdl.pack(topo, M), b)
    assert float(jnp.abs(one - dyn.chol_solve(M, b)).max()) < 1e-9


def test_f32_extreme_poses_regularized(setup):
    """Round-2 STATUS: ~13/2048 random +-0.3 rad poses made the f32
    elimination cancel to an indefinite packed factor (D <= 0 -> NaN solve).
    The DIAG_REG pivot floor must keep every factor/solve finite and the
    solve accurate vs the f64 dense oracle, with no downstream NaN guard."""
    spec, tables, topo, _, _, _ = setup
    rng = np.random.RandomState(7)
    standing = joblib.load(STANDING)
    N = 2048
    qpos = np.asarray(standing["qpos"], np.float64)[None].repeat(N, 0)
    qpos[:, 7:] += rng.uniform(-0.3, 0.3, (N, 69))
    qpos[:, 3:7] += rng.uniform(-0.3, 0.3, (N, 4))
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=-1, keepdims=True)

    ks64 = dyn.kin_state(spec, tables, jnp.asarray(qpos))
    M64 = dyn.mass_matrix(spec, tables, ks64)
    ks32 = dyn.kin_state(spec, tables, jnp.asarray(qpos, jnp.float32))
    R32 = ltdl.crba_packed(spec, tables, topo, ks32)
    assert R32.dtype == jnp.float32

    Rf = ltdl.factor(topo, R32)
    assert bool(jnp.isfinite(Rf).all()), "factor produced non-finite slots"
    d = ltdl.diag_of(topo, Rf)
    assert float(d.min()) > 0.0, "regularized pivots must stay positive"

    b = jnp.asarray(rng.randn(N, 75), jnp.float32)
    x = ltdl.solve(topo, Rf, b)
    assert bool(jnp.isfinite(x).all()), "solve produced non-finite entries"
    x64 = dyn.chol_solve(M64, b.astype(jnp.float64))
    rel = jnp.linalg.norm(x - x64, axis=-1) / (jnp.linalg.norm(x64, axis=-1) + 1e-3)
    # every pose solves to f32-reasonable accuracy (no blow-ups at all)
    assert float(jnp.max(rel)) < 5e-2, float(jnp.max(rel))
    assert float(jnp.median(rel)) < 1e-3
