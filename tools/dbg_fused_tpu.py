"""Bisect: does the fused init+scan program corrupt the reset obs on TPU?"""
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
    from kinpoly_tpu.models import nets
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.rl import rollout as ro, running_norm as rn

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
                        np.asarray(standing['qvel'], np.float32))
    policy = nets.PolicyMCP(action_dim=env.action_dim)
    params = jax.jit(policy.init, backend='cpu')(
        jax.random.PRNGKey(0), jnp.zeros((1, 784), jnp.float32))
    norm = rn.init(784)

probs = jnp.ones(1)

@jax.jit
def init_only(rng):
    c = ro.init_rollout_state(env, rng, 64, probs)
    return c.obs, c.env_state.sim.qpos

obs0, qp0 = init_only(jax.random.PRNGKey(3))
print('init-only: obs finite', bool(jnp.isfinite(obs0).all()),
      'qpos finite', bool(jnp.isfinite(qp0).all()), flush=True)

rollout1 = ro.make_rollout(env, policy.apply, 1, noise_rate=1.0)

@jax.jit
def one_step(rng):
    c = ro.init_rollout_state(env, rng, 64, probs)
    c2, traj = rollout1(c, params, norm, probs)
    return traj

traj = one_step(jax.random.PRNGKey(3))
ro_ok = {f: bool(jnp.isfinite(getattr(traj, f)).all())
         for f in traj._fields if np.asarray(getattr(traj, f)).dtype.kind == 'f'}
print('1-step fused:', ro_ok, flush=True)
obs = np.asarray(traj.raw_obs)
bad = ~np.isfinite(obs)
if bad.any():
    envs = np.nonzero(bad[0].any(axis=1))[0]
    print('bad envs:', envs[:12])
    e = int(envs[0])
    print('dims:', np.nonzero(bad[0, e])[0][:16])

# extra: same init on CPU with identical rng
with jax.default_device(cpu):
    obs0c, qp0c = jax.jit(lambda r: (
        ro.init_rollout_state(env, r, 64, probs).obs,
        ro.init_rollout_state(env, r, 64, probs).env_state.sim.qpos), backend='cpu')(jax.random.PRNGKey(3))
print('cpu init-only: obs finite', bool(jnp.isfinite(obs0c).all()), flush=True)
obs0 = np.asarray(obs0)
bad = ~np.isfinite(obs0)
envs = np.nonzero(bad.any(axis=1))[0]
print('tpu bad envs:', envs[:16], 'count', len(envs))
e = int(envs[0])
print('dims:', np.nonzero(bad[e])[0][:12])
print('tpu qpos[e,3:7]:', np.asarray(qp0)[e, 3:7], ' cpu qpos[e,3:7]:', np.asarray(qp0c)[e, 3:7])
print('tpu qpos[e,:3]:', np.asarray(qp0)[e, :3])
