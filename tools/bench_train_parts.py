"""Decompose the train iteration wall time at 512x32 on TPU."""
import os, sys, time
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
    from kinpoly_tpu.rl.agent_uhc import UHCAgent, UHCTrainConfig
    from kinpoly_tpu.rl import rollout as ro, running_norm as rn, gae, ppo

    cfg = UHCConfig('uhc')
    tc = cfg.train_config()
    tc = tc.__class__(**{**tc.__dict__, 'n_envs': 512, 'rollout_steps': 32})
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

agent = UHCAgent(env, tc)
probs = jnp.ones(1)
rollout = ro.make_rollout(env, agent.policy.apply, 32, 1.0)

@jax.jit
def init_fn(rng):
    return ro.init_rollout_state(env, rng, 512, probs)

carry = init_fn(jax.random.PRNGKey(0))
ts, norm = agent.train_state, agent.norm

@jax.jit
def f_rollout(carry, params, norm):
    c, traj = rollout(carry, params, norm, probs)
    return c, traj.rewards.sum()

@jax.jit
def f_full(carry, ts, norm, rng):
    return agent._make_train_iter()(carry, ts, norm, probs, rng)[3]['reward_mean']

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f'{name}: {(time.time()-t0)/5*1e3:.1f} ms', flush=True)

timeit('rollout 512x32    ', f_rollout, carry, ts.policy_params, norm)
timeit('full train iter   ', f_full, carry, ts, norm, jax.random.PRNGKey(1))
