"""Reproduce the training NaN on CPU f32 with the exact train_uhc setup."""
import os, sys
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_test_cache')
import jax.numpy as jnp
import joblib
import numpy as np

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.config.config import UHCConfig
from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.data import expert as exlib
from kinpoly_tpu.envs.humanoid_im import HumanoidImEnv
from kinpoly_tpu.physics import engine as eng
from kinpoly_tpu.rl.agent_uhc import UHCAgent

cfg = UHCConfig('uhc')
tc = cfg.train_config()
tc = tc.__class__(**{**tc.__dict__, 'n_envs': 64, 'rollout_steps': 16})

spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
model = eng.build_model(spec, uhc_control_params(spec, rfc_scale=cfg.residual_force_scale))
standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
q = np.asarray(standing['qpos'], np.float32)
takes = {'standing': {'qpos': np.repeat(q[None], 120, 0)}}
clips = [exlib.from_qpos(spec, np.asarray(t['qpos'], np.float32), dt=model.control_dt, pad_to=120)
         for t in takes.values()]
bank = exlib.stack_bank(clips)
env = HumanoidImEnv(model, cfg.env_config(), bank,
                    np.asarray(standing['qpos'], np.float32),
                    np.asarray(standing['qvel'], np.float32))
agent = UHCAgent(env, tc)

def tree_finite(t):
    return all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(t) if jnp.issubdtype(x.dtype, jnp.floating))

for i in range(4):
    m = agent.train_epoch()
    print(i, {k: (round(v, 4) if isinstance(v, float) else v) for k, v in m.items()},
          'params finite:', tree_finite(agent.train_state.policy_params),
          'value finite:', tree_finite(agent.train_state.value_params),
          'norm finite:', tree_finite(agent.norm), flush=True)
