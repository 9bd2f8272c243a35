"""Shape/finite checks for the auxiliary model zoo + TRPO/A2C updates."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kinpoly_tpu.models import aux_nets, nets
from kinpoly_tpu.models.rnn import RNN
from kinpoly_tpu.rl import a2c, trpo


def test_rnn_modes():
    net = RNN(16, "gru")
    x = jnp.ones((2, 5, 8))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, 5, 16)

    net_bi = RNN(16, "lstm", bi_dir=True)
    params = net_bi.init(jax.random.PRNGKey(0), x)
    out = net_bi.apply(params, x)
    assert out.shape == (2, 5, 32)


def test_cnn_encoders():
    x = jnp.ones((2, 32, 32, 3))
    for M in (aux_nets.SimpleCNN,):
        net = M(out_dim=16)
        p = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(p, x)
        assert y.shape == (2, 16)
    net = aux_nets.ResNet18(out_dim=16)
    p = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(p, x)
    assert y.shape == (2, 16)


def test_temporal_models():
    x = jnp.ones((2, 7, 12))
    tcn = aux_nets.TCN(channels=(8, 8), out_dim=6)
    p = tcn.init(jax.random.PRNGKey(0), x)
    assert tcn.apply(p, x).shape == (2, 7, 6)

    erd = aux_nets.ERDNet(state_dim=5, hidden=16)
    p = erd.init(jax.random.PRNGKey(0), x)
    assert erd.apply(p, x).shape == (2, 7, 5)

    cmlp = aux_nets.CMLP(out_dim=5, window=3, hidden=(16,))
    p = cmlp.init(jax.random.PRNGKey(0), x)
    assert cmlp.apply(p, x).shape == (2, 7, 5)


def test_spacenet_vae():
    vox = jnp.ones((2, 16, 16, 16, 1))
    net = aux_nets.SpaceNet(latent_dim=8)
    p = net.init(jax.random.PRNGKey(0), vox)
    recon, mu, logvar = net.apply(p, vox)
    assert recon.shape == vox.shape
    assert mu.shape == (2, 8)


def test_discrete_policy():
    net = aux_nets.PolicyDiscrete(action_num=4, hidden=(16,))
    x = jnp.ones((3, 10))
    p = net.init(jax.random.PRNGKey(0), x)
    logits = net.apply(p, x)
    a = aux_nets.categorical_sample(jax.random.PRNGKey(1), logits)
    lp = aux_nets.categorical_log_prob(a, logits)
    assert a.shape == (3,) and lp.shape == (3,)
    assert np.all(np.asarray(lp) <= 0)


def _tiny_policy_value():
    policy = nets.PolicyGaussian(action_dim=3, hidden=(16,), fix_std=False)
    value = nets.Value(hidden=(16,))
    obs = jnp.asarray(np.random.RandomState(0).randn(64, 6), jnp.float32)
    pp = policy.init(jax.random.PRNGKey(0), obs)
    vp = value.init(jax.random.PRNGKey(1), obs)
    mean, log_std = policy.apply(pp, obs)
    actions = mean + 0.1 * np.random.RandomState(1).randn(*mean.shape).astype(np.float32)
    adv = jnp.asarray(np.random.RandomState(2).randn(64), jnp.float32)
    ret = jnp.asarray(np.random.RandomState(3).randn(64), jnp.float32)
    flp = nets.gaussian_log_prob(actions, mean, log_std)
    return policy, value, pp, vp, obs, actions, adv, ret, flp


def test_trpo_update_improves_surrogate():
    policy, value, pp, vp, obs, actions, adv, ret, flp = _tiny_policy_value()
    cfg = trpo.TRPOConfig()
    new_params, info = jax.jit(
        lambda p: trpo.trpo_update(policy.apply, cfg, p, obs, actions, adv, flp)
    )(pp)
    assert bool(info["accepted"])

    def surr(p):
        mean, log_std = policy.apply(p, obs)
        lp = nets.gaussian_log_prob(actions, mean, log_std)
        return float(-jnp.mean(jnp.exp(lp - flp) * adv))

    assert surr(new_params) < surr(pp)


def test_a2c_update_runs():
    policy, value, pp, vp, obs, actions, adv, ret, flp = _tiny_policy_value()
    p_opt = optax.adam(1e-3)
    v_opt = optax.adam(1e-3)
    out = a2c.a2c_update(policy.apply, value.apply, p_opt, v_opt,
                         pp, vp, p_opt.init(pp), v_opt.init(vp),
                         obs, actions, adv, ret)
    _, _, _, _, info = out
    assert np.isfinite(float(info["policy_loss"]))
    assert np.isfinite(float(info["value_loss"]))
