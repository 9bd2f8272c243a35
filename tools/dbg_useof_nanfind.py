#!/usr/bin/env python
"""Pinpoint the NaN-gradient source in the use_of full-sup step at
fr_num=100: train until gnorm goes non-finite, then (a) check the forward
feats for inf/overflow at the failing params, (b) re-run the grad with
jax_debug_nans to name the primitive."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax, joblib

from kinpoly_tpu.anim.mjcf import parse_humanoid
from kinpoly_tpu.config.config import KinPolyConfig, UHCConfig
from kinpoly_tpu.config.defaults import uhc_control_params
from kinpoly_tpu.data import statear
from kinpoly_tpu.envs.humanoid_ar import HumanoidAREnv
from kinpoly_tpu.models import nets
from kinpoly_tpu.physics import engine as eng
from kinpoly_tpu.rl import running_norm as rn
from kinpoly_tpu.rl.agent_ar import AgentAR
from kinpoly_tpu.models.traj_ar import compute_loss

cfg = KinPolyConfig("use_of", "/tmp/dbg_useof")
cc_cfg = UHCConfig("uhc", "/tmp/dbg_useof")
spec = parse_humanoid(
    "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml")
model = eng.build_model(spec, uhc_control_params(spec),
                        with_objects=True, movable_objects=True)
takes = statear.load_annotations("data_bank/action_takes_of.pkl", spec=spec)
dataset = statear.StateARDataset(takes, fr_num=100)

pol = nets.PolicyMCP(action_dim=75)
cc_params = pol.init(jax.random.PRNGKey(0), np.zeros((1, 784), np.float32))
env = HumanoidAREnv(model, cfg.traj_ar_config(), cc_cfg.env_config(),
                    cfg.reward_weights(), context=None,
                    cc_policy_apply=pol.apply, cc_policy_params=cc_params,
                    cc_norm=rn.init(784), mode="train",
                    policy_v=cfg.policy_specs.get("policy_v", 1))
tc = cfg.train_config()
tc = tc.__class__(**{**tc.__dict__, "n_envs": 4, "rollout_steps": 10})
agent = AgentAR(env, dataset, tc, out_dir=None)

opt = optax.chain(optax.zero_nans(),
                  optax.clip_by_global_norm(tc.max_grad_norm),
                  optax.adam(tc.lr))
params = agent.params
st = opt.init(params)
rng = jax.random.PRNGKey(7)

def loss_fn(pp, b, k):
    feats = agent.policy.net.apply(
        agent.policy._arnet_params(pp), b, 0.3, k, True)
    l, info = compute_loss(agent.env.kin_cfg, feats, b)
    return l, feats

@jax.jit
def step(p, s, b, k):
    (l, feats), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b, k)
    gn = optax.global_norm(g)
    up, s = opt.update(g, s)
    return optax.apply_updates(p, up), s, l, gn, feats

bad = None
for i in range(30):
    b = agent._get_batch(32)
    rng, k = jax.random.split(rng)
    newp, st, l, gn, feats = step(params, st, b, k)
    fin = bool(jnp.isfinite(gn))
    print(f"step {i}: loss {float(l):.2f} gnorm "
          f"{float(gn):.3g} finite={fin}", flush=True)
    if not fin:
        bad = (params, b, k)
        break
    params = newp

if bad is None:
    print("no NaN in 30 steps"); sys.exit(0)

p0, b0, k0 = bad
# (a) forward health at the failing point
feats = agent.policy.net.apply(agent.policy._arnet_params(p0), b0, 0.3, k0, True)
for name, v in feats.items():
    v = np.asarray(v)
    print(f"feats[{name}]: finite={np.isfinite(v).all()} "
          f"max|.|={np.abs(v[np.isfinite(v)]).max():.3g}", flush=True)

# (b) name the primitive
print("re-running grad with jax_debug_nans...", flush=True)
jax.config.update("jax_debug_nans", True)
try:
    (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p0, b0, k0)
    print("debug_nans: grad came back finite?!", float(optax.global_norm(g)))
except FloatingPointError as e:
    print("FOUND:", str(e)[:4000])
