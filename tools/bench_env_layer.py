"""Attribute the gap between control_step (physics only) and the full
rollout: time env.step alone, policy alone, and one rollout step."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import joblib

BATCH = int(os.environ.get("B", "2048"))
REPS = int(os.environ.get("REPS", "10"))

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.data import expert as exlib
from kinpoly_tpu.envs.humanoid_im import EnvConfig, HumanoidImEnv
from kinpoly_tpu.models import nets
from kinpoly_tpu.physics import engine as eng
from kinpoly_tpu.rl import rollout as ro, running_norm as rn

spec = parse_humanoid(
    "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
model = eng.build_model(spec, uhc_control_params(spec))
standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
qpos = np.asarray(standing["qpos"], np.float32)
rngn = np.random.RandomState(0)
T = 120
seq = np.repeat(qpos[None], T, axis=0)
seq[:, 7:] += np.cumsum(rngn.uniform(-0.005, 0.005, (T, 69)), axis=0).astype(np.float32)
clip = exlib.from_qpos(spec, seq, dt=model.control_dt, pad_to=128)
bank = exlib.stack_bank([clip, clip])
env = HumanoidImEnv(model, EnvConfig(env_episode_len=100000), bank,
                    standing["qpos"].astype(np.float32),
                    standing["qvel"].astype(np.float32))
policy = nets.PolicyMCP(action_dim=env.action_dim)
params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 784), jnp.float32))
norm = rn.init(784)

keys = jax.random.split(jax.random.PRNGKey(1), BATCH)
clips = jnp.zeros(BATCH, jnp.int32)
state, obs = jax.jit(jax.vmap(env.reset))(keys, clips)
act = jnp.zeros((BATCH, env.action_dim), jnp.float32)


def timed(name, fn, per=1):
    """fn(c) must depend on scalar c (defeats loop-invariant hoisting)."""
    def run():
        def step(c, _):
            out = fn(c)
            s = sum(jnp.asarray(o).ravel()[0] for o in jax.tree.leaves(out)
                    if hasattr(o, "ravel") and o.size)
            return c + s * 1e-20, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return c
    f = jax.jit(run)
    _ = float(f())
    t0 = time.time()
    _ = float(f())
    dt = (time.time() - t0) / REPS / per
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)


def perturb(s, c):
    return s._replace(sim=s.sim._replace(qpos=s.sim.qpos + c * 1e-7))


timed("policy apply", lambda c: policy.apply(params, obs + c * 1e-7))
timed("env.step (vmapped)", lambda c: jax.vmap(env.step)(perturb(state, c), act))
timed("env.get_obs only",
      lambda c: jax.vmap(lambda s: env.get_obs(s))(perturb(state, c)))
timed("env.reset (vmapped)",
      lambda c: jax.vmap(env.reset)(
          jax.vmap(lambda k: jax.random.fold_in(k, c.astype(jnp.int32)))(keys),
          clips))

probs = jnp.ones(2) / 2
carry = ro.init_rollout_state(env, jax.random.PRNGKey(2), BATCH, probs)


def roll(n):
    r = ro.make_rollout(env, policy.apply, n, noise_rate=1.0)
    def fn(c):
        cc = carry._replace(env_state=perturb(carry.env_state, c))
        c2, traj = r(cc, params, norm, probs)
        return (traj.rewards.sum(),)
    return fn


timed("rollout 1 step (policy+env+bookkeeping)", roll(1))
timed("rollout 4 steps (per step)", roll(4), per=4)


def roll_threaded(n):
    """Like bench.py: thread the rollout carry across reps."""
    r = ro.make_rollout(env, policy.apply, n, noise_rate=1.0)
    def run():
        def step(cc, _):
            cc2, traj = r(cc, params, norm, probs)
            return cc2, traj.rewards.sum()
        c2, rr = jax.lax.scan(step, carry, None, length=REPS)
        return rr.sum() + c2.obs.sum() * 1e-12
    f = jax.jit(run)
    _ = float(f())
    t0 = time.time()
    _ = float(f())
    dt = (time.time() - t0) / REPS / n
    print(f"{'rollout threaded-carry %d steps (per step)' % n:44s} {dt*1e3:9.2f} ms", flush=True)


if os.environ.get("THREADED"):
    roll_threaded(4)
    roll_threaded(16)
