"""Find the f32 NaN in the UHC env (CPU, float32 — same dtype as TPU)."""
import os, sys
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_test_cache')
import jax.numpy as jnp
import joblib
import numpy as np

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.data import expert as exlib
from kinpoly_tpu.envs.humanoid_im import EnvConfig, HumanoidImEnv
from kinpoly_tpu.physics import engine as eng

spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
model = eng.build_model(spec, uhc_control_params(spec))
standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
qpos = np.asarray(standing['qpos'], np.float32)
rngn = np.random.RandomState(0)
T = 120
seq = np.repeat(qpos[None], T, axis=0)
seq[:, 7:] += np.cumsum(rngn.uniform(-0.005, 0.005, (T, 69)), axis=0).astype(np.float32)
clip = exlib.from_qpos(spec, seq, dt=model.control_dt, pad_to=128)
print('clip finite:', {f: bool(np.isfinite(np.asarray(getattr(clip, f))).all()) for f in clip._fields})
bank = exlib.stack_bank([clip, clip])
env = HumanoidImEnv(model, EnvConfig(env_episode_len=100000), bank,
                    standing['qpos'].astype(np.float32), standing['qvel'].astype(np.float32))
state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0), 0)
print('reset obs finite:', bool(np.isfinite(np.asarray(obs)).all()), obs.dtype)
step = jax.jit(env.step)
action = jnp.zeros(75, jnp.float32)
for i in range(10):
    state, obs, reward, done, info = step(state, action)
    print(i, 'obs finite', bool(np.isfinite(np.asarray(obs)).all()),
          'qpos finite', bool(np.isfinite(np.asarray(state.sim.qpos)).all()),
          'reward', float(reward), 'rinfo', np.asarray(info['reward_info']))
    if not np.isfinite(float(reward)):
        break
