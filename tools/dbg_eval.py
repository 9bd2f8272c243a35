"""Instrument the coverage rollout: where/why does the trained policy fail?"""
import os, sys
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_test_cache')
import jax.numpy as jnp
import numpy as np
import joblib

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.config.config import UHCConfig
from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.data import expert as exlib
from kinpoly_tpu.envs.humanoid_im import HumanoidImEnv
from kinpoly_tpu.physics import engine as eng
from kinpoly_tpu.rl import running_norm as rn
from kinpoly_tpu.rl.agent_uhc import UHCAgent

cfg = UHCConfig('uhc')
spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
model = eng.build_model(spec, uhc_control_params(spec, rfc_scale=cfg.residual_force_scale))
standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
q = np.asarray(standing['qpos'], np.float32)
takes = {'standing': {'qpos': np.repeat(q[None], 120, 0)}}
clips = [exlib.from_qpos(spec, t['qpos'], dt=model.control_dt, pad_to=120)
         for t in takes.values()]
bank = exlib.stack_bank(clips)
env = HumanoidImEnv(model, cfg.env_config(), bank, q,
                    np.asarray(standing['qvel'], np.float32), mode='test')
agent = UHCAgent(env, cfg.train_config())
agent.load_checkpoint('results/motion_im/uhc/models/iter_0200.p')

ts, norm = agent.train_state, agent.norm

@jax.jit
def run(params, norm):
    state, obs = env.reset(jax.random.PRNGKey(0), jnp.asarray(0, jnp.int32),
                           deterministic=True)
    def step(carry, _):
        state, obs = carry
        mean, _ = agent.policy.apply(params, rn.apply(norm, obs))
        state2, obs2, reward, done, info = env.step(state, mean)
        bd = env.calc_body_diff(state2, __import__('kinpoly_tpu.physics.fk', fromlist=['fk']).fk(env.model.spec, state2.sim.qpos))
        return (state2, obs2), (reward, done, info['fail'], info['end'], bd, state2.sim.qpos[2])
    (_, _), (rewards, dones, fails, ends, bds, zs) = jax.lax.scan(step, (state, obs), None, length=125)
    return rewards, dones, fails, ends, bds, zs

rewards, dones, fails, ends, bds, zs = run(ts.policy_params, norm)
dones = np.asarray(dones); fails = np.asarray(fails)
first_done = int(np.argmax(dones)) if dones.any() else -1
print('first done step:', first_done, 'fail there:', bool(fails[first_done]) if first_done >= 0 else None)
print('body_diff[:12]:', np.round(np.asarray(bds[:12]), 3))
print('body_diff around done:', np.round(np.asarray(bds[max(0,first_done-3):first_done+2]), 3))
print('z around done:', np.round(np.asarray(zs[max(0,first_done-3):first_done+2]), 3))
print('reward[:10]:', np.round(np.asarray(rewards[:10]), 3))
