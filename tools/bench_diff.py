"""Why is the train-script rollout 100x slower than the bench rollout?"""
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
    from kinpoly_tpu.envs.humanoid_im import EnvConfig, HumanoidImEnv
    from kinpoly_tpu.models import nets
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.rl import rollout as ro, running_norm as rn

    cfg = UHCConfig('uhc')
    spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
    model = eng.build_model(spec, uhc_control_params(spec))
    standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
    q = np.asarray(standing['qpos'], np.float32)

    # bench-style bank (noisy walk, pad 128)
    rngn = np.random.RandomState(0)
    seq = np.repeat(q[None], 120, axis=0)
    seq[:, 7:] += np.cumsum(rngn.uniform(-0.005, 0.005, (120, 69)), axis=0).astype(np.float32)
    clip_b = exlib.from_qpos(spec, seq, dt=model.control_dt, pad_to=128)
    bank_b = exlib.stack_bank([clip_b, clip_b])
    env_bench = HumanoidImEnv(model, EnvConfig(env_episode_len=100000), bank_b,
                              q, np.asarray(standing['qvel'], np.float32))

    # train-style bank (pure standing, pad 120, 1 clip) + yaml env cfg
    clip_t = exlib.from_qpos(spec, np.repeat(q[None], 120, 0), dt=model.control_dt, pad_to=120)
    bank_t = exlib.stack_bank([clip_t])
    env_train = HumanoidImEnv(model, cfg.env_config(), bank_t,
                              q, np.asarray(standing['qvel'], np.float32))

    policy = nets.PolicyMCP(action_dim=75)
    params = jax.jit(policy.init, backend='cpu')(jax.random.PRNGKey(0),
                                                 jnp.zeros((1, 784), jnp.float32))
norm = rn.init(784)
params = jax.device_put(params, jax.devices()[0])

def run(env, n_clips, steps, tag):
    probs = jnp.ones(n_clips) / n_clips
    rollout = ro.make_rollout(env, policy.apply, steps, 1.0)
    init = jax.jit(lambda r: ro.init_rollout_state(env, r, 512, probs))
    carry = init(jax.random.PRNGKey(1))
    fn = jax.jit(lambda c, p, n: rollout(c, p, n, probs)[0])
    c = fn(carry, params, norm); jax.block_until_ready(c)
    print(f'{tag} out devices:', c.obs.devices(), ' carry-in:', carry.obs.devices(), flush=True)
    t0 = time.time()
    for _ in range(5):
        c = fn(c, params, norm)
    jax.block_until_ready(c)
    print(f'{tag}: {(time.time()-t0)/5*1e3:.1f} ms', flush=True)

run(env_bench, 2, 8, 'bench env  512x8 ')
run(env_bench, 2, 32, 'bench env  512x32')
run(env_train, 1, 32, 'train env  512x32')
