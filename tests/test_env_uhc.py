"""humanoid_im env: shape/finite checks, vmapped rollout, reward sanity."""

import functools

import jax
import jax.numpy as jnp
import joblib
import numpy as np

from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.data import expert as exlib
from kinpoly_tpu.envs.humanoid_im import EnvConfig, HumanoidImEnv
from kinpoly_tpu.physics import engine as eng
from tests.mj_oracle import get_spec

STANDING = "/root/reference/sample_data/standing_neutral.pkl"


@functools.lru_cache(maxsize=None)
def make_env(episode_len=1000):
    spec = get_spec()
    model = eng.build_model(spec, uhc_control_params(spec))
    standing = joblib.load(STANDING)
    qpos = np.asarray(standing["qpos"], dtype=np.float64)

    # synthesise a short noisy clip around standing as the expert
    rngn = np.random.RandomState(0)
    T = 40
    seq = np.repeat(qpos[None], T, axis=0)
    seq[:, 7:] += np.cumsum(rngn.uniform(-0.01, 0.01, (T, 69)), axis=0)
    clip = exlib.from_qpos(spec, seq, dt=model.control_dt, pad_to=64)
    bank = exlib.stack_bank([clip, clip])

    cfg = EnvConfig(env_episode_len=episode_len)
    env = HumanoidImEnv(model, cfg, bank, standing["qpos"], standing["qvel"])
    return env


def test_reset_and_obs_shape():
    env = make_env()
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0), 0)
    assert np.isfinite(np.asarray(obs)).all()
    # obs v1 layout: 4+74*3+75+1+2+72*2+72*2+96*2 = 784
    assert obs.shape == (784,)


def test_step_runs_and_tracks():
    env = make_env()
    step = jax.jit(env.step)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0), 0)
    action = jnp.zeros(env.action_dim)
    rewards = []
    for _ in range(5):
        state, obs, reward, done, info = step(state, action)
        rewards.append(float(reward))
    assert np.isfinite(np.asarray(obs)).all()
    assert all(np.isfinite(rewards))
    # zero action == pure PD toward the expert next pose: should track well
    assert min(rewards) > 0.3, rewards
    assert not bool(done)


def test_vmapped_step():
    env = make_env()
    n = 4
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    clips = jnp.asarray([0, 1, 0, 1])
    state, obs = jax.jit(jax.vmap(env.reset))(keys, clips)
    action = jnp.zeros((n, env.action_dim))
    state, obs, reward, done, info = jax.jit(jax.vmap(env.step))(state, action)
    assert obs.shape == (n, 784)
    assert reward.shape == (n,)
    assert np.isfinite(np.asarray(obs)).all()


def test_termination_on_fall():
    """Massive adverse action should eventually trip the body-diff guard."""
    env = make_env()
    step = jax.jit(env.step)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(2), 0)
    action = jnp.zeros(env.action_dim).at[:69].set(3.0)  # crazy target offset
    done = False
    for i in range(30):
        state, obs, reward, done, info = step(state, action)
        if bool(done):
            break
    assert bool(done), "env never terminated under adversarial control"
