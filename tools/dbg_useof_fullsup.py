#!/usr/bin/env python
"""Diagnose the flat full-sup loss in the use_of warm start: compute one
full-AR supervised gradient at a small window and print the loss components
and per-leaf gradient health (NaN fraction, global norm). A zeroed-NaN
gradient (sup_opt has optax.zero_nans) would leave the logged loss flat
while steps appear to run."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

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
dataset = statear.StateARDataset(takes[:8], fr_num=20)  # tiny window

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

batch = agent._get_batch(8)
print("batch of:", None if batch.of is None else
      (batch.of.shape, float(np.mean(batch.of)), float(np.std(batch.of))))

def loss_fn(p, rng, gt_rate):
    feats = agent.policy.net.apply(
        agent.policy._arnet_params(p), batch, gt_rate, rng, True)
    loss, info = compute_loss(agent.env.kin_cfg, feats, batch)
    return loss, (info, feats)

for gt_rate in (0.3, 1.0):
    (loss, (info, feats)), g = jax.value_and_grad(loss_fn, has_aux=True)(
        agent.params, jax.random.PRNGKey(1), gt_rate)
    leaves, _ = jax.tree.flatten(g)
    nan_ct = sum(int(jnp.sum(~jnp.isfinite(x))) for x in leaves)
    tot = sum(x.size for x in leaves)
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float64) ** 2)
                               for x in leaves)))
    print(f"gt_rate={gt_rate}  loss={float(loss):.3f}  "
          f"grad nonfinite {nan_ct}/{tot}  gnorm {gnorm:.4g}")
    print("  components:", {k: round(float(v), 3) for k, v in info.items()})
    print("  pred_qpos finite:", bool(jnp.all(jnp.isfinite(feats["qpos"]))),
          " max |root xyz|:", float(jnp.max(jnp.abs(feats["qpos"][..., :3]))))
    # which top-level subtrees carry NaN
    for name, sub in g.items() if isinstance(g, dict) else []:
        sl, _ = jax.tree.flatten(sub)
        n = sum(int(jnp.sum(~jnp.isfinite(x))) for x in sl)
        sn = float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in sl)))
        print(f"    grad[{name}]: nonfinite {n}, norm {sn:.4g}")

# -- learning-dynamics probe: does the jitted full-sup step reduce loss? ----
import optax
for lr in (1e-4, 1e-3):
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
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    hist = []
    for i in range(120):
        b = agent._get_batch(8)
        rng, k = jax.random.split(rng)
        params, st, l = step(params, st, b, k)
        if i % 20 == 0 or i == 119:
            hist.append((i, round(float(l), 2)))
    print(f"lr={lr}: {hist}")
