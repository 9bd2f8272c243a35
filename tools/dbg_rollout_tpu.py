"""Rollout-only on TPU: find the first NaN field/step in the trajectory."""
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
rollout = ro.make_rollout(env, policy.apply, 32, noise_rate=1.0)

@jax.jit
def run(rng):
    carry = ro.init_rollout_state(env, rng, 64, probs)
    carry, traj = rollout(carry, params, norm, probs)
    return traj

traj = run(jax.random.PRNGKey(3))
for f in traj._fields:
    x = np.asarray(getattr(traj, f))
    if x.dtype.kind == 'f':
        bad = ~np.isfinite(x)
        if bad.any():
            axes = tuple(range(1, x.ndim))
            per_step = bad.reshape(x.shape[0], -1).any(axis=1)
            first = int(np.argmax(per_step))
            print(f, 'NaN/inf! first step', first, 'frac', bad.mean(), flush=True)
        else:
            print(f, 'ok', 'absmax %.3e' % np.abs(x).max(), flush=True)
print('fail frac', np.asarray(traj.fails).mean())
print('reward[0:8,0]', np.asarray(traj.rewards[:8, 0]))
obs = np.asarray(traj.raw_obs)
bad = ~np.isfinite(obs)
if bad.any():
    t0 = int(np.argmax(bad.reshape(obs.shape[0], -1).any(1)))
    e0 = int(np.argmax(bad[t0].reshape(obs.shape[1], -1).any(1)))
    cols = np.nonzero(bad[t0, e0])[0]
    print('first bad obs at step', t0, 'env', e0, 'dims', cols[:20])
