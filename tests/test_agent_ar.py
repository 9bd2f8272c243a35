"""End-to-end dynamics-regulated stack: AR env step, supervised pretrain,
and one composite PPO+BC epoch — tiny sizes, CPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.data import statear
from kinpoly_tpu.envs.humanoid_ar import ARRewardWeights, HumanoidAREnv
from kinpoly_tpu.envs.humanoid_im import EnvConfig
from kinpoly_tpu.models import nets
from kinpoly_tpu.models.traj_ar import TrajARConfig
from kinpoly_tpu.physics import engine as eng
from kinpoly_tpu.rl import running_norm as rn
from kinpoly_tpu.rl.agent_ar import AgentAR, ARTrainConfig
from tests.mj_oracle import get_spec
from tests.test_traj_ar import make_dataset


@functools.lru_cache(maxsize=None)
def make_setup():
    spec = get_spec()
    model = eng.build_model(spec, uhc_control_params(spec))
    ds = statear.StateARDataset(make_dataset().takes, fr_num=12)

    kin_cfg = TrajARConfig(rnn_hdim=32, mlp_hsize=(32,), add_noise=False)
    cc_cfg = EnvConfig(obs_v=1)

    # a fresh (untrained) UHC controller: enough for smoke-testing the loop
    cc_policy = nets.PolicyMCP(action_dim=75, num_primitive=2,
                               hidden=(32,), composer_hidden=(16,))
    cc_params = cc_policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 784)))
    cc_norm = rn.init(784)

    cfg = ARTrainConfig(batch_size=2, fr_num=12, n_envs=2, rollout_steps=6,
                        num_optim_epoch=2, num_step_update=2)

    # placeholder context from the dataset itself
    from kinpoly_tpu.models.policy_ar import PolicyAR
    policy_stub = PolicyAR(spec, kin_cfg)
    rngn = np.random.RandomState(0)
    batch = ds.get_batch(rngn, cfg.n_envs)
    params0 = policy_stub.init_params(jax.random.PRNGKey(1), batch)

    env = HumanoidAREnv(
        model, kin_cfg, cc_cfg, ARRewardWeights(), context=None,
        cc_policy_apply=cc_policy.apply, cc_policy_params=cc_params,
        cc_norm=cc_norm, mode="train")

    agent = AgentAR(env, ds, cfg)
    return agent


def _make_ctx(agent):
    rngn = np.random.RandomState(3)
    batch = agent.dataset.get_batch(rngn, agent.cfg.n_envs)
    return agent._jit_build_ctx(agent.params, batch)


def test_ar_env_reset_step():
    agent = make_setup()
    env = agent.env
    ctx = _make_ctx(agent)
    state, obs = jax.jit(lambda k, i: env.reset(k, i, ctx))(
        jax.random.PRNGKey(0), jnp.asarray(0, jnp.int32))
    assert np.isfinite(np.asarray(obs)).all()
    assert obs.shape[-1] == 105  # 74 + 3+4 + 7 + 3+3+7 + 4 (as_policy)

    action = jnp.asarray(np.random.RandomState(0).uniform(-0.05, 0.05, 80))
    # make the pose part realistic (target layout): copy from context target
    gt_target = ctx.qpos[0, 0]
    state2, obs2, reward, done, info = jax.jit(
        lambda s, a: env.step(s, a, ctx))(state, action)
    assert np.isfinite(np.asarray(obs2)).all()
    assert np.isfinite(float(reward))
    assert info["cc_action"].shape == (75,)


def test_agent_ar_train_init_reduces_loss():
    agent = make_setup()
    logs = agent.train_init(init_steps=30, full_steps=6, log_every=5)
    init_losses = [l for tag, i, l, _nf in logs if tag == "init"]
    assert init_losses[-1] < init_losses[0], init_losses
    assert all(np.isfinite(init_losses))


def test_agent_ar_optimize_epoch():
    agent = make_setup()
    out = agent.optimize_policy()
    for k, v in out.items():
        assert np.isfinite(v), (k, v)
    assert "reward_mean" in out and 0.0 <= out["reward_mean"] <= 1.0


def test_grad_joint_epoch():
    """grad_joint: combined loss_step*10 + surr in one optimizer step per
    PPO epoch (reference update_policy_joint:794-850), plus the
    grad_alternate parity gating."""
    agent = make_setup()
    cfg = agent.cfg.__class__(**{**agent.cfg.__dict__, "grad_joint": True,
                                 "grad_alternate": True})
    a2 = type(agent).__new__(type(agent))
    a2.__dict__.update(agent.__dict__)
    a2.cfg = cfg
    import jax
    a2._jit_rl = jax.jit(a2._rl_and_step_update)
    m1 = a2.optimize_policy()
    m2 = a2.optimize_policy()
    for m in (m1, m2):
        assert np.isfinite(m["reward_mean"]) and np.isfinite(m["ppo_loss"])


def test_ppo_gradient_alive_iff_stochastic_rollout():
    """The round-5 dead-PPO root cause: when rollout actions EQUAL the
    recomputed means, the PPO surrogate gradient is exactly zero
    (d log p/d mean = (a-m)/sigma^2 = 0 at a == m). On TPU the over-time
    recompute is bitwise identical to the mean-action rollout, so the whole
    composite PPO pathway was dead; training rollouts must sample (reference
    agents/agent.py:22,53 noise_rate=1.0 -> mean_action always False)."""
    agent = make_setup()
    policy = agent.policy
    params = agent.params
    T, N = 4, 2
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (T, N, 105))
    masks = jnp.ones((T, N))
    log_std = policy.log_std
    means = policy.action_means_over_time(params, obs, masks)
    adv = jax.random.normal(jax.random.PRNGKey(1), (T * N,))

    def surr(p, actions):
        m = policy.action_means_over_time(p, obs, masks).reshape(T * N, -1)
        a = actions.reshape(T * N, -1)
        lp = nets.gaussian_log_prob(a, m, jnp.full_like(m, log_std))
        old = nets.gaussian_log_prob(
            a, jax.lax.stop_gradient(means).reshape(T * N, -1),
            jnp.full_like(m, log_std))
        ratio = jnp.exp(lp - old)
        return -jnp.mean(jnp.minimum(ratio * adv,
                                     jnp.clip(ratio, 0.8, 1.2) * adv))

    # mean-action rollout: actions are exactly the means -> zero gradient
    g_dead = jax.grad(surr)(params, means)
    assert float(jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(jnp.abs(x)), g_dead, 0.0)) == 0.0

    # sampled rollout: strictly positive gradient
    noise = jnp.exp(log_std) * jax.random.normal(jax.random.PRNGKey(2),
                                                 means.shape)
    g_alive = jax.grad(surr)(params, means + noise)
    import optax
    assert float(optax.global_norm(g_alive)) > 0.0

    # behavioral: the trainer's default config now samples, so the logged
    # PPO diagnostics must be live
    assert agent.cfg.mean_action_rollout is False
    out = agent.optimize_policy()
    assert float(out["ppo_grad_norm"]) > 0.0, out["ppo_grad_norm"]
    assert float(out["ratio_dev"]) > 0.0, out["ratio_dev"]
    assert np.isfinite(out["ppo_loss"])


def test_agent_ar_use_of_policy_v2():
    """use_of + policy_v=2 end to end (round-4 fix: the supervised phases
    must unwrap the {"arnet","delta"} params tree, and the value net obs
    dim must include the residual policy's appended 76-d AR pose)."""
    spec = get_spec()
    model = eng.build_model(spec, uhc_control_params(spec))
    rng = np.random.RandomState(7)
    takes = []
    for t in make_dataset().takes:
        t = dict(t)
        T = t["qpos"].shape[0]
        t["of"] = rng.uniform(-1, 1, (T, 16)).astype(np.float32)
        takes.append(t)
    ds = statear.StateARDataset(takes, fr_num=12)

    kin_cfg = TrajARConfig(rnn_hdim=32, mlp_hsize=(32,), of_dim=16,
                           use_of=True, add_noise=False)
    cc_cfg = EnvConfig(obs_v=1)
    cc_policy = nets.PolicyMCP(action_dim=75, num_primitive=2,
                               hidden=(32,), composer_hidden=(16,))
    cc_params = cc_policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 784)))
    env = HumanoidAREnv(
        model, kin_cfg, cc_cfg, ARRewardWeights(), context=None,
        cc_policy_apply=cc_policy.apply, cc_policy_params=cc_params,
        cc_norm=rn.init(784), mode="train", policy_v=2)
    cfg = ARTrainConfig(batch_size=2, fr_num=12, n_envs=2, rollout_steps=6,
                        num_optim_epoch=2, num_step_update=2)
    agent = AgentAR(env, ds, cfg)
    assert set(agent.params) == {"arnet", "delta"}

    losses = [l for _, _, l, _ in agent.train_init(init_steps=4, full_steps=2,
                                                   log_every=1)]
    assert all(np.isfinite(losses)), losses
    out = agent.optimize_policy()
    for k, v in out.items():
        assert np.isfinite(v), (k, v)
