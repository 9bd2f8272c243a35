"""Bisect the in-rollout Pallas chol slowdown.

Stage A: batch-explicit substep (no vmap) with use_pallas_chol on/off.
Stage B: vmapped single-env substep (rollout-style dispatch via custom_vmap)
         with the flag on/off.
Honest scalar-fetch timing, 10 reps each.
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
import joblib

cpu = jax.local_devices(backend='cpu')[0]
with jax.default_device(cpu):
    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.defaults import BASE_ROT, uhc_control_params
    from kinpoly_tpu.physics import engine as eng
    spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
    model_x = eng.build_model(spec, uhc_control_params(spec))
    model_p = eng.build_model(spec, uhc_control_params(spec), use_pallas_chol=True)
    standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
    q0 = np.asarray(standing['qpos'], np.float32)

B = int(os.environ.get('B', '512'))
rng = np.random.RandomState(0)
qpos = jnp.asarray(np.repeat(q0[None], B, 0) + rng.uniform(-0.05, 0.05, (B, 76)).astype(np.float32))
qvel = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 75)).astype(np.float32))
base_rot = jnp.asarray(BASE_ROT, jnp.float32)
ctrl = jnp.zeros((B, 69), jnp.float32)
vf = jnp.zeros((B, 6), jnp.float32)


def timeit(tag, fn, *args, reps=10):
    s = fn(*args); _ = float(s)
    t0 = time.time()
    for _ in range(reps):
        s = fn(*args); _ = float(s)
    print(f'{tag}: {(time.time()-t0)/reps*1e3:.2f} ms', flush=True)


def batch_explicit(model):
    @jax.jit
    def f(q, v):
        s = eng.substep(model, eng.SimState(q, v), ctrl, vf, q[:, 7:], base_rot)
        return s.qpos.sum()
    return f


def vmapped(model):
    def one(q, v, c, w):
        s = eng.substep(model, eng.SimState(q, v), c, w, q[7:], base_rot)
        return s.qpos
    @jax.jit
    def f(q, v):
        out = jax.vmap(one)(q, v, ctrl, vf)
        return out.sum()
    return f


timeit('batch xla   ', batch_explicit(model_x), qpos, qvel)
timeit('batch pallas', batch_explicit(model_p), qpos, qvel)
timeit('vmap  xla   ', vmapped(model_x), qpos, qvel)
timeit('vmap  pallas', vmapped(model_p), qpos, qvel)


def scanned(model, length=15):
    def one(q, v, c, w):
        s = eng.substep(model, eng.SimState(q, v), c, w, q[7:], base_rot)
        return s.qpos, s.qvel
    @jax.jit
    def f(q, v):
        def body(carry, _):
            qq, vv = carry
            qq, vv = jax.vmap(one)(qq, vv, ctrl, vf)
            return (qq, vv), None
        (qq, vv), _ = jax.lax.scan(body, (q, v), None, length=length)
        return qq.sum()
    return f


timeit('scan15 xla   ', scanned(model_x), qpos, qvel)
timeit('scan15 pallas', scanned(model_p), qpos, qvel)
