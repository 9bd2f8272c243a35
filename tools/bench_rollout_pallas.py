"""Full-rollout XLA vs Pallas chol in ONE process, interleaved (controls for
tunnel/device drift), plus a physics-only rollout (policy/obs/reward removed)
to isolate which part interacts badly with the Pallas kernel."""
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
import joblib

cpu = jax.local_devices(backend='cpu')[0]
N_ENVS = int(os.environ.get('B', '512'))
N_STEPS = int(os.environ.get('T', '8'))

with jax.default_device(cpu):
    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.data import expert as exlib
    from kinpoly_tpu.envs.humanoid_im import EnvConfig, HumanoidImEnv
    from kinpoly_tpu.models import nets
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.rl import rollout as ro, running_norm as rn

    spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
    standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
    qpos = np.asarray(standing['qpos'], np.float32)
    rngn = np.random.RandomState(0)
    T = 120
    seq = np.repeat(qpos[None], T, axis=0)
    seq[:, 7:] += np.cumsum(rngn.uniform(-0.005, 0.005, (T, 69)), axis=0).astype(np.float32)

    models = {
        'xla   ': eng.build_model(spec, uhc_control_params(spec)),
        'pallas': eng.build_model(spec, uhc_control_params(spec), use_pallas_chol=True),
    }
    envs, fns = {}, {}
    for tag, model in models.items():
        clip = exlib.from_qpos(spec, seq, dt=model.control_dt, pad_to=128)
        bank = exlib.stack_bank([clip, clip])
        envs[tag] = HumanoidImEnv(
            model, EnvConfig(env_episode_len=100000), bank,
            standing['qpos'].astype(np.float32), standing['qvel'].astype(np.float32))

    policy = nets.PolicyMCP(action_dim=envs['xla   '].action_dim)
    params = jax.jit(policy.init, backend='cpu')(
        jax.random.PRNGKey(0), jnp.zeros((1, 784), jnp.float32))
    params = jax.tree.map(np.asarray, params)
    norm = rn.init(784)
    probs = np.ones(2, np.float32) / 2

for tag, env in envs.items():
    rollout = ro.make_rollout(env, policy.apply, N_STEPS, noise_rate=1.0)

    @jax.jit
    def init_fn(rng, env=env):
        return ro.init_rollout_state(env, rng, N_ENVS, jnp.asarray(probs))

    @jax.jit
    def run(c, p, n, rollout=rollout):
        c2, traj = rollout(c, p, n, jnp.asarray(probs))
        return c2, traj.rewards.sum()

    fns[tag] = (init_fn, run)

# physics-only: scan control_step with zero actions, no policy/obs/reward
phys = {}
q0b = jnp.asarray(np.repeat(qpos[None], N_ENVS, 0))
v0b = jnp.zeros((N_ENVS, 75), jnp.float32)
from kinpoly_tpu.config.defaults import BASE_ROT
base_rot = jnp.asarray(BASE_ROT, jnp.float32)
act = jnp.zeros((N_ENVS, 75), jnp.float32)
for tag, model in models.items():
    # vmapped single-env control_step: the rollout's dispatch shape — the
    # Pallas kernel only engages through the custom_vmap batching rule
    def one(q, v, a, model=model):
        s = eng.control_step(model, eng.SimState(q, v), a, q[7:], base_rot)
        return s.qpos, s.qvel

    @jax.jit
    def pf(q, v, one=one):
        def body(s, _):
            qq, vv = jax.vmap(one)(s[0], s[1], act)
            return (qq, vv), None
        s, _ = jax.lax.scan(body, (q, v), None, length=N_STEPS)
        return s[0].sum()
    phys[tag] = pf
    if 'check' in os.environ.get('STAGES', ''):
        n_pallas = jax.jit(pf).lower(q0b, v0b).compile().as_text().count('tpu_custom_call')
        print(f'physics {tag}: tpu_custom_call sites = {n_pallas}', flush=True)

def t_rollout(tag):
    init_fn, run = fns[tag]
    c = init_fn(jax.random.PRNGKey(1))
    c, s = run(c, params, norm); _ = float(s)   # compile
    t0 = time.time()
    c, s = run(c, params, norm); _ = float(s)
    print(f'rollout {tag}: {time.time()-t0:7.3f} s', flush=True)

def t_phys(tag):
    s = phys[tag](q0b, v0b); _ = float(s)
    t0 = time.time()
    s = phys[tag](q0b, v0b); _ = float(s)
    print(f'physics {tag}: {time.time()-t0:7.3f} s', flush=True)

STAGES = os.environ.get('STAGES', 'phys,rollout').split(',')
if 'phys' in STAGES:
    for _ in range(4):
        t_phys('xla   '); t_phys('pallas')
if 'rollout' in STAGES:
    for _ in range(4):
        t_rollout('xla   '); t_rollout('pallas')


# bench.py-style: 3 reps chained in one jitted scan, vs 3 sequential calls
def t_scanreps(tag, reps=3):
    init_fn, run = fns[tag]
    rollout_fn = None
    env = envs[tag]
    import kinpoly_tpu.rl.rollout as ro2
    rollout_fn = ro2.make_rollout(env, policy.apply, N_STEPS, noise_rate=1.0)

    def iters(c, p, n):
        def body(cc, _):
            cc2, traj = rollout_fn(cc, p, n, jnp.asarray(probs))
            return cc2, traj.rewards.sum()
        c, r = jax.lax.scan(body, c, None, length=reps)
        return c, r.sum()

    f = jax.jit(iters)
    c = init_fn(jax.random.PRNGKey(1))
    c2, s = f(c, params, norm); _ = float(s)
    t0 = time.time()
    c2, s = f(c, params, norm); _ = float(s)
    print(f'scanx3  {tag}: {time.time()-t0:7.3f} s total ({(time.time()-t0)/reps:.3f}/rep)', flush=True)

if 'scanreps' in STAGES:
    for _ in range(2):
        t_scanreps('xla   '); t_scanreps('pallas')
