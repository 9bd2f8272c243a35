"""Inspect the TPU reset state + obs pieces."""
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
                        np.asarray(standing['qvel'], np.float32))

keys = jax.random.split(jax.random.PRNGKey(7), 64)
clips_idx = jnp.zeros(64, jnp.int32)

@jax.jit
def do_reset(keys, clips_idx):
    return jax.vmap(env.reset)(keys, clips_idx)

state, obs = do_reset(keys, clips_idx)
qp = np.asarray(state.sim.qpos)
ob = np.asarray(obs)
print('qpos finite:', np.isfinite(qp).all(), 'quat norms:', np.round(np.linalg.norm(qp[:, 3:7], axis=1)[:8], 4))
bad_envs = np.nonzero(~np.isfinite(ob).any(axis=1) | (~np.isfinite(ob)).any(axis=1))[0]
print('bad envs:', bad_envs[:10], 'of', len(bad_envs))
if len(bad_envs):
    e = int(bad_envs[0])
    print('env', e, 'root quat:', qp[e, 3:7], 'pos:', qp[e, :3])
    # same qpos, obs computed on CPU
    with jax.default_device(cpu):
        st_cpu, obs_cpu = jax.jit(env.reset, backend='cpu')(keys[e], jnp.asarray(0))
    print('cpu same-key reset obs finite:', np.isfinite(np.asarray(obs_cpu)).all())
    print('cpu root quat:', np.asarray(st_cpu.sim.qpos[3:7]))
