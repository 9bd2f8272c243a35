"""Which reset ingredient corrupts qpos on TPU?"""
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
    env_tr = HumanoidImEnv(model, cfg.env_config(), bank, q,
                           np.asarray(standing['qvel'], np.float32), mode='train')
    env_te = HumanoidImEnv(model, cfg.env_config(), bank, q,
                           np.asarray(standing['qvel'], np.float32), mode='test')

rng = jax.random.PRNGKey(3)

for name, env in [('train(reactive)', env_tr), ('test(no reactive)', env_te)]:
    @jax.jit
    def init(rng, env=env):
        rng, k = jax.random.split(rng)
        keys = jax.random.split(k, 64)
        st, obs = jax.vmap(env.reset)(keys, jnp.zeros(64, jnp.int32))
        return st.sim.qpos, obs
    qp, obs = init(rng)
    print(name, 'quat[0]:', np.asarray(qp)[0, 3:7],
          'obs finite:', bool(jnp.isfinite(obs).all()), flush=True)

# match_heading_and_pos standalone on TPU
@jax.jit
def mh(q1, q2):
    return env_tr.match_heading_and_pos(q1, q2)

q1 = jnp.asarray(np.asarray(bank.qpos)[0, 0])
q2 = jnp.asarray(q)
print('match_heading out quat:', np.asarray(mh(q1, q2))[3:7], flush=True)

# neutral branch through where, vmapped
@jax.jit
def wherepick(keys):
    def one(k):
        use = jax.random.bernoulli(k, 0.3)
        neutral = env_tr.match_heading_and_pos(q1, q2)
        return jnp.where(use, neutral, q1)
    return jax.vmap(one)(keys)

out = wherepick(jax.random.split(jax.random.PRNGKey(5), 8))
print('where+vmap quats:', np.round(np.asarray(out)[:, 3:7], 3), flush=True)
