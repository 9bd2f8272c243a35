"""Bisect the train_ar_policy warm-start TPU compile hang (VERDICT r3 #1).

Round-2 finding (memory/ar-init-tpu-compile-hang): the first _jit_init_sup
call deterministically wedges the remote TPU AOT compiler. This script
compiles ONE candidate subgraph per invocation (run it under `timeout` in a
subprocess; a hang must be killable without touching the main session):

  python tools/dbg_ar_hang.py <stage>

stages, roughly safest-first:
  ctx_fwd    context GRU forward only
  init_fwd   init_states forward (ctx GRU + MLP + quat layout)
  fk_fwd     compute_loss_lite forward (FK chain) on a (B, 76) qpos
  fk_grad    grad of compute_loss_lite
  init_loss  init_states + loss forward
  init_grad  value_and_grad of the init loss (no optimizer)
  init_opt   the full _init_sup_step (grad + zero_nans/clip/adam)
  full_fwd   full-AR rollout scan forward
  full_grad  full _full_sup_step
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

STAGE = sys.argv[1] if len(sys.argv) > 1 else "ctx_fwd"
B, T = 32, 100


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import joblib

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.config import KinPolyConfig
    from kinpoly_tpu.data import statear
    from kinpoly_tpu.models import traj_ar as ta

    log(f"stage={STAGE} backend={jax.default_backend()}")
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        spec = parse_humanoid(
            "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
        cfg = KinPolyConfig("kin_poly", "/tmp/dbg_ar").traj_ar_config()
        standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
        q = np.asarray(standing["qpos"], np.float32)
        rng = np.random.RandomState(0)
        seq = np.repeat(q[None], T + 20, 0)
        seq[:, 7:] += np.cumsum(rng.uniform(-0.004, 0.004, (T + 20, 69)), 0).astype(np.float32)
        obj = np.zeros((T + 20, 7), np.float32)
        obj[:, :3] = [1.0, 0.5, 0.4]
        obj[:, 3] = 1
        take = statear.derive_features(spec, seq, obj)
        ds = statear.StateARDataset([take], fr_num=T)
        batch = ds.get_batch(rng, B)
        net = ta.TrajARNet(spec, cfg)
        p_init = net.init(jax.random.PRNGKey(0), batch,
                          method=ta.TrajARNet.init_states)
        p_full = net.init(jax.random.PRNGKey(0), batch, 0.0,
                          jax.random.PRNGKey(1), False)
        params = jax.tree.map(lambda a: a, p_full)
        params = {"params": {**p_init["params"], **p_full["params"]}}
        log(f"params built; batch qpos {batch.qpos.shape}")

    def compile_and_run(fn, *args):
        t0 = time.time()
        jitted = jax.jit(fn)
        lowered = jitted.lower(*args)
        log(f"lowered in {time.time()-t0:.1f}s; compiling...")
        t0 = time.time()
        compiled = lowered.compile()
        log(f"COMPILED in {time.time()-t0:.1f}s; running...")
        t0 = time.time()
        out = compiled(*args)
        s = jax.tree.leaves(out)[0]
        jax.block_until_ready(s)
        log(f"RAN in {time.time()-t0:.1f}s; ok")

    if STAGE == "ctx_fwd":
        fn = lambda p, b: net.apply(p, b, method=ta.TrajARNet.context_features)
        compile_and_run(fn, params, batch)
    elif STAGE == "init_fwd":
        fn = lambda p, b: net.apply(p, b, method=ta.TrajARNet.init_states)[:2]
        compile_and_run(fn, params, batch)
    elif STAGE == "fk_fwd":
        fn = lambda q0, q1: ta.compute_loss_lite(spec, cfg, q0, q1)[0]
        compile_and_run(fn, batch.qpos[:, 0], batch.qpos[:, 1])
    elif STAGE == "fk_grad":
        fn = jax.grad(lambda q0, q1: ta.compute_loss_lite(spec, cfg, q0, q1)[0])
        compile_and_run(fn, batch.qpos[:, 0], batch.qpos[:, 1])
    elif STAGE == "init_loss":
        def fn(p, b):
            qpos0, qvel0, _ = net.apply(p, b, method=ta.TrajARNet.init_states)
            return ta.compute_loss_init(spec, cfg, qpos0, b.qpos[:, 0],
                                        qvel0, b.qvel[:, 0])[0]
        compile_and_run(fn, params, batch)
    elif STAGE == "init_grad":
        def loss(p, b):
            qpos0, qvel0, _ = net.apply(p, b, method=ta.TrajARNet.init_states)
            return ta.compute_loss_init(spec, cfg, qpos0, b.qpos[:, 0],
                                        qvel0, b.qvel[:, 0])[0]
        compile_and_run(jax.value_and_grad(loss), params, batch)
    elif STAGE == "init_opt":
        import optax
        opt = optax.chain(optax.zero_nans(), optax.clip_by_global_norm(40.0),
                          optax.adam(5e-4))
        opt_state = opt.init(params)

        def step(p, s, b):
            def loss(p):
                qpos0, qvel0, _ = net.apply(p, b, method=ta.TrajARNet.init_states)
                return ta.compute_loss_init(spec, cfg, qpos0, b.qpos[:, 0],
                                            qvel0, b.qvel[:, 0])[0]
            l, g = jax.value_and_grad(loss)(p)
            up, s = opt.update(g, s)
            return optax.apply_updates(p, up), s, l
        compile_and_run(step, params, opt_state, batch)
    elif STAGE == "full_fwd":
        def fn(p, b, k):
            return net.apply(p, b, 0.3, k, True)["qpos"]
        compile_and_run(fn, params, batch, jax.random.PRNGKey(0))
    elif STAGE == "full_grad":
        def loss(p, b, k):
            feats = net.apply(p, b, 0.3, k, True)
            return ta.compute_loss(cfg, feats, b)[0]
        compile_and_run(jax.value_and_grad(loss), params, batch,
                        jax.random.PRNGKey(0))
    else:
        raise SystemExit(f"unknown stage {STAGE}")


if __name__ == "__main__":
    main()
