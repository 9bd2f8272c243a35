"""Microbench: XLA dense Cholesky vs tree-sparse LTDL on TPU.

Times factor+solve for the two per-substep systems (SPD control: 1 rhs;
contact prep: 1+nc rhs) at the production batch size, with reps chained in
one jitted scan (tunneled block_until_ready returns at dispatch)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import joblib

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.physics import dynamics as dyn, ltdl

BATCH = int(os.environ.get("B", "4096"))
NRHS = int(os.environ.get("NRHS", "55"))
REPS = int(os.environ.get("REPS", "30"))
DT = jnp.float32

spec = parse_humanoid(
    "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
tables = dyn.build_tables(spec)
topo = ltdl.build_topo(tables.dof_parent)

rng = np.random.RandomState(0)
standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
qpos = np.asarray(standing["qpos"], np.float64)[None].repeat(BATCH, 0)
qpos[:, 7:] += rng.uniform(-0.3, 0.3, (BATCH, 69))
qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=-1, keepdims=True)
qpos = qpos.astype(np.float32)
b1 = rng.randn(BATCH, 75).astype(np.float32)
bn = rng.randn(BATCH, 75, NRHS).astype(np.float32)


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))  # compile
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    # fetch a scalar to force real completion over the tunnel
    s = float(jnp.asarray(out).ravel()[0]) if hasattr(out, "ravel") else float(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:42s} {dt*1e3:9.3f} ms/call   ({s:.4g})")
    return dt


def chain(body):
    def run(qpos, b1, bn):
        def step(c, _):
            out = body(qpos + c * 1e-6, b1, bn)
            return c + out.ravel()[0] * 1e-20, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return c
    return run


def kin(qpos):
    with jax.default_matmul_precision("highest"):
        ks = dyn.kin_state(spec, tables, qpos)
    return ks


def dense_1(qpos, b1, bn):
    ks = kin(qpos)
    with jax.default_matmul_precision("highest"):
        M = dyn.mass_matrix(spec, tables, ks)
    return dyn.chol_solve(M, b1)


def dense_n(qpos, b1, bn):
    ks = kin(qpos)
    with jax.default_matmul_precision("highest"):
        M = dyn.mass_matrix(spec, tables, ks)
    return dyn.chol_solve(M, bn)


def make_sparse(via_dense):
    def sparse_1(qpos, b1, bn):
        ks = kin(qpos)
        with jax.default_matmul_precision("highest"):
            R = ltdl.crba_packed(spec, tables, topo, ks, via_dense=via_dense)
        return ltdl.solve(topo, ltdl.factor(topo, R), b1)

    def sparse_n(qpos, b1, bn):
        ks = kin(qpos)
        with jax.default_matmul_precision("highest"):
            R = ltdl.crba_packed(spec, tables, topo, ks, via_dense=via_dense)
        return ltdl.solve(topo, ltdl.factor(topo, R), bn)
    return sparse_1, sparse_n


def crba_only_dense(qpos, b1, bn):
    ks = kin(qpos)
    with jax.default_matmul_precision("highest"):
        return dyn.mass_matrix(spec, tables, ks)


def kin_only(qpos, b1, bn):
    return kin(qpos).phi


if __name__ == "__main__":
    print(f"batch={BATCH} nrhs={NRHS} reps={REPS} dev={jax.devices()[0]}")
    args = (jnp.asarray(qpos), jnp.asarray(b1), jnp.asarray(bn))
    timed("kin_state only", chain(kin_only), *args)
    timed("kin+CRBA dense (no solve)", chain(crba_only_dense), *args)
    timed("dense chol 1 rhs", chain(dense_1), *args)
    timed(f"dense chol {NRHS} rhs", chain(dense_n), *args)
    s1, sn = make_sparse(True)
    timed("ltdl (crba via dense gather) 1 rhs", chain(s1), *args)
    timed(f"ltdl (crba via dense gather) {NRHS} rhs", chain(sn), *args)
    s1g, sng = make_sparse(False)
    timed("ltdl (crba gather-einsum) 1 rhs", chain(s1g), *args)
    timed(f"ltdl (crba gather-einsum) {NRHS} rhs", chain(sng), *args)
