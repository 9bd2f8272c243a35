"""Time the PPO update alone at training shapes (TPU)."""
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.models import nets
from kinpoly_tpu.rl import ppo

B, O, A = 16384, 784, 75
policy = nets.PolicyMCP(action_dim=A)
value = nets.Value()
cpu = jax.local_devices(backend='cpu')[0]
with jax.default_device(cpu):
    pp = jax.jit(policy.init, backend='cpu')(jax.random.PRNGKey(0), jnp.zeros((1, O)))
    vp = jax.jit(value.init, backend='cpu')(jax.random.PRNGKey(1), jnp.zeros((1, O)))

cfg = ppo.PPOConfig()
pol_opt, val_opt = ppo.make_optimizers(cfg)
ts = ppo.TrainState(pp, vp, pol_opt.init(pp), val_opt.init(vp))
# move to the default (accelerator) device — committed-CPU params would pull
# the whole jit onto CPU
ts = jax.device_put(ts, jax.devices()[0])

rng = np.random.RandomState(0)
obs = jnp.asarray(rng.randn(B, O), jnp.float32)
actions = jnp.asarray(rng.randn(B, A), jnp.float32)
adv = jnp.asarray(rng.randn(B), jnp.float32)
ret = jnp.asarray(rng.randn(B), jnp.float32)
flp = jnp.asarray(rng.randn(B), jnp.float32)

fn = jax.jit(lambda ts, k: ppo.ppo_update(
    policy.apply, value.apply, cfg, ts, k, obs, actions, adv, ret, flp,
    pol_opt, val_opt))
out = fn(ts, jax.random.PRNGKey(2)); jax.block_until_ready(out)
t0 = time.time()
for i in range(5):
    out = fn(ts, jax.random.PRNGKey(i))
jax.block_until_ready(out)
print('ppo_update (10 epochs, B=16384):', (time.time() - t0) / 5, 's', flush=True)
