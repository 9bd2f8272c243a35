#!/usr/bin/env python
"""Repro the use_of full-sup plateau at the production window (fr_num=100).

The fr_num=20 probe (tools/dbg_useof_fullsup.py) learns at lr=1e-4
(338->30 in 20 steps) while the production run (fr_num=100, batch 256) is
flat at ~300 for 590 steps. This script isolates the window length: same
config, fr_num=100, small batch, prints loss + gnorm trajectory at the
configured lr and a higher one.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

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

FR = int(os.environ.get("FR", 100))
BATCH = int(os.environ.get("BATCH", 32))
STEPS = int(os.environ.get("STEPS", 40))

cfg = KinPolyConfig("use_of", "/tmp/dbg_useof")
cc_cfg = UHCConfig("uhc", "/tmp/dbg_useof")
spec = parse_humanoid(
    "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml")
model = eng.build_model(spec, uhc_control_params(spec),
                        with_objects=True, movable_objects=True)
takes = statear.load_annotations("data_bank/action_takes_of.pkl", spec=spec)
dataset = statear.StateARDataset(takes, fr_num=FR)

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
print(f"FR={FR} BATCH={BATCH} lr_cfg={tc.lr} max_gn={tc.max_grad_norm}")

for lr in (tc.lr, 1e-3):
    opt = optax.chain(optax.zero_nans(),
                      optax.clip_by_global_norm(tc.max_grad_norm),
                      optax.adam(lr))
    params = agent.params
    st = opt.init(params)
    rng = jax.random.PRNGKey(7)

    @jax.jit
    def step(p, s, b, k):
        def lf(pp):
            feats = agent.policy.net.apply(
                agent.policy._arnet_params(pp), b, 0.3, k, True)
            l, info = compute_loss(agent.env.kin_cfg, feats, b)
            return l, info
        (l, info), g = jax.value_and_grad(lf, has_aux=True)(p)
        gn = optax.global_norm(g)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l, gn, info

    for i in range(STEPS):
        b = agent._get_batch(BATCH)
        rng, k = jax.random.split(rng)
        params, st, l, gn, info = step(params, st, b, k)
        if i % 5 == 0 or i == STEPS - 1:
            comp = {k2: round(float(v), 2) for k2, v in info.items()}
            print(f"lr={lr} step {i}: loss {float(l):.2f} gnorm {float(gn):.3g} "
                  f"{comp}", flush=True)
