"""Minimal repro hunt for the TPU reset corruption."""
import os, sys
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
import joblib

cpu = jax.local_devices(backend='cpu')[0]
with jax.default_device(cpu):
    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.config import UHCConfig
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.data import expert as exlib
    from kinpoly_tpu.envs.humanoid_im import HumanoidImEnv
    from kinpoly_tpu.physics import engine as eng

    cfg = UHCConfig('uhc')
    spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
    model = eng.build_model(spec, uhc_control_params(spec))
    standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
    q = np.asarray(standing['qpos'], np.float32)
    takes = {'standing': {'qpos': np.repeat(q[None], 120, 0)}}
    clips = [exlib.from_qpos(spec, t['qpos'], dt=model.control_dt, pad_to=120)
             for t in takes.values()]
    bank = exlib.stack_bank(clips)
    env = HumanoidImEnv(model, cfg.env_config(), bank, q,
                        np.asarray(standing['qvel'], np.float32), mode='test')

rng = jax.random.PRNGKey(3)
Z = jnp.zeros(64, jnp.int32)

def report(tag, qp):
    qp = np.asarray(qp)
    print(tag, 'quat[0]:', np.round(qp[0, 3:7], 4), 'xy:', np.round(qp[0, :2], 4), flush=True)

# 1. bank gather only, keys inside
@jax.jit
def t1(rng):
    keys = jax.random.split(rng, 64)
    return jax.vmap(lambda k, i: bank.qpos[i, 0])(keys, Z)
report('gather-only ', t1(rng))

# 2. frame/index_clip path
@jax.jit
def t2(rng):
    keys = jax.random.split(rng, 64)
    def one(k, i):
        c = exlib.index_clip(bank, i)
        f = exlib.frame(c, jnp.asarray(0, jnp.int32))
        return f.qpos
    return jax.vmap(one)(keys, Z)
report('index+frame ', t2(rng))

# 3. full reset, keys inside
@jax.jit
def t3(rng):
    keys = jax.random.split(rng, 64)
    st, obs = jax.vmap(env.reset)(keys, Z)
    return st.sim.qpos
report('full reset  ', t3(rng))

# 4. full reset, keys outside
keys_out = jax.random.split(rng, 64)
@jax.jit
def t4(keys):
    st, obs = jax.vmap(env.reset)(keys, Z)
    return st.sim.qpos
report('reset keyout', t4(keys_out))
