#!/usr/bin/env python
"""Train the dynamics-regulated kinematic policy
(reference scripts/train_ar_policy.py + kin_poly/core/agent_ar.py).

Phases: supervised warm start (init-state + full-AR), then per-epoch
composite updates (PPO through the simulated rollout + per-step BC).

Usage:
  python scripts/train_ar_policy.py --cfg kin_poly \
      --data sample_data/features/mocap_annotations.p \
      --uhc-checkpoint results/motion_im/uhc/models/iter_XXXX.p
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "JAX_PLATFORMS" in os.environ and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import joblib
import numpy as np


def load_uhc(path, obs_dim=784, action_dim=75):
    """Load a UHC checkpoint saved by kinpoly_tpu (agent_uhc.save_checkpoint)."""
    import pickle

    from kinpoly_tpu.models import nets
    from kinpoly_tpu.rl import running_norm as rn

    with open(path, "rb") as f:
        blob = pickle.load(f)
    cfgd = blob.get("cfg", {})
    if cfgd.get("actor_type", "mcp") == "mcp":
        policy = nets.PolicyMCP(action_dim=action_dim,
                                num_primitive=cfgd.get("num_primitive", 8),
                                hidden=tuple(cfgd.get("policy_hsize", (512, 256))),
                                log_std_init=cfgd.get("log_std", -2.3))
    else:
        policy = nets.PolicyGaussian(action_dim=action_dim,
                                     hidden=tuple(cfgd.get("policy_hsize", (512, 256))),
                                     log_std_init=cfgd.get("log_std", -2.3))
    norm = rn.RunningNorm(*blob["norm"])
    return policy.apply, blob["policy_params"], norm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="kin_poly")
    p.add_argument("--data", required=False, default=None)
    p.add_argument("--uhc-checkpoint", default=None)
    p.add_argument("--iter", type=int, default=0)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--skip-init", action="store_true")
    p.add_argument("--no-compact", action="store_true",
                   help="disable contact active-set compaction (exact "
                        "round-3 constraint-row layout, for A/B checks)")
    p.add_argument("--force-init", action="store_true",
                   help="run the supervised warm-start phases even after "
                        "resuming a checkpoint (supervised continuation)")
    p.add_argument("--init-steps", type=int, default=500)
    p.add_argument("--full-steps", type=int, default=50)
    p.add_argument("--n-envs", type=int, default=None)
    p.add_argument("--rollout-steps", type=int, default=None)
    p.add_argument("--joint-controller", action="store_true",
                   help="fine-tune the UHC controller jointly (agent_ar.py:749)")
    p.add_argument("--no-rl-update", action="store_true",
                   help="ablate the PPO half of the composite update "
                        "(BC-only arm of the round-4 PPO-liveness A/B)")
    p.add_argument("--step-update-dyna", action="store_true",
                   help="add BC toward the simulated result pose (update mode "
                        "step_update_dyna, agent_ar.py:720-726)")
    p.add_argument("--out", default="results")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the tunneled TPU plugin is "
                        "pre-registered by sitecustomize; env vars are too late)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.config import KinPolyConfig, UHCConfig
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.data import statear
    from kinpoly_tpu.envs.humanoid_ar import HumanoidAREnv
    from kinpoly_tpu.models import nets
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.rl import running_norm as rn
    from kinpoly_tpu.rl.agent_ar import AgentAR
    from kinpoly_tpu.utils.logger import create_logger

    cfg = KinPolyConfig(args.cfg, args.out)
    cc_cfg = UHCConfig("uhc", args.out)
    logger = create_logger(os.path.join(cfg.out_dir, "log.txt"))

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        # the AR env always owns the object scene (the reference loads
        # humanoid_smpl_neutral_mesh_all_step.xml, humanoid_ar_v1.py:40);
        # non-action takes park every object far away
        spec = parse_humanoid(
            "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml")
        on_tpu = jax.default_backend() != "cpu"
        model = eng.build_model(spec, uhc_control_params(spec),
                                with_objects=True, movable_objects=True,
                                solver="pallas_ltdl" if on_tpu else "ltdl",
                                use_pallas_pgs=on_tpu,
                                compact_k=None if args.no_compact else (16, 8))

        if args.data:
            takes = statear.load_annotations(args.data, spec=spec)
        else:
            logger.info("no --data; synthesizing a standing take for smoke run")
            standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
            q = np.asarray(standing["qpos"], np.float32)
            rng = np.random.RandomState(0)
            seq = np.repeat(q[None], 240, 0)
            seq[:, 7:] += np.cumsum(rng.uniform(-0.005, 0.005, (240, 69)), 0).astype(np.float32)
            obj = np.zeros((240, 7), np.float32)
            obj[:, :3] = [1.0, 0.5, 0.4]
            obj[:, 3] = 1
            takes = [statear.derive_features(spec, seq, obj)]

        dataset = statear.StateARDataset(takes, fr_num=cfg.fr_num)

        if args.uhc_checkpoint:
            cc_apply, cc_params, cc_norm = load_uhc(args.uhc_checkpoint)
        else:
            logger.info("no --uhc-checkpoint; using a fresh (untrained) UHC policy")
            pol = nets.PolicyMCP(action_dim=75)
            cc_params = pol.init(jax.random.PRNGKey(0),
                                 np.zeros((1, 784), np.float32))
            cc_apply, cc_norm = pol.apply, rn.init(784)

        env = HumanoidAREnv(
            model, cfg.traj_ar_config(), cc_cfg.env_config(),
            cfg.reward_weights(), context=None,
            cc_policy_apply=cc_apply, cc_policy_params=cc_params,
            cc_norm=cc_norm, mode="train",
            policy_v=cfg.policy_specs.get("policy_v", 1),
            body_diff_thresh=cfg.policy_specs.get("body_diff_thresh", 10.0),
            body_diff_gt_thresh=cfg.policy_specs.get("body_diff_gt_thresh", 12.0))

    tc = cfg.train_config()
    if args.n_envs:
        tc = tc.__class__(**{**tc.__dict__, "n_envs": args.n_envs})
    if args.rollout_steps:
        tc = tc.__class__(**{**tc.__dict__, "rollout_steps": args.rollout_steps})
    if args.joint_controller:
        tc = tc.__class__(**{**tc.__dict__, "joint_controller": True})
    if args.step_update_dyna:
        tc = tc.__class__(**{**tc.__dict__, "step_update_dyna": True})
    if args.no_rl_update:
        tc = tc.__class__(**{**tc.__dict__, "rl_update": False})
    from kinpoly_tpu.utils.liveness import (NAN_FRAC_WARN,
                                            check_supervised_liveness)

    def run_train_init():
        """Drive the warm start with the silent-freeze watchdog: per-phase
        loss curves must actually drop (liveness check), and any step where
        zero_nans discards gradient leaves is warned about loudly
        (round-4 c5e5efd failure class)."""
        phases = {}
        for tag, i, loss, nan_frac in agent.train_init(
                init_steps=args.init_steps, full_steps=args.full_steps,
                log_every=10):
            phases.setdefault(tag, ([], []))
            phases[tag][0].append(loss)
            phases[tag][1].append(nan_frac)
            extra = (f"  [WARN zero_nans hit {nan_frac:.0%} of grad leaves]"
                     if nan_frac > NAN_FRAC_WARN else "")
            logger.info(f"  {tag} step {i}: loss {loss:.4f}{extra}")
        for tag, (losses, nfs) in phases.items():
            check_supervised_liveness(losses, phase=f"train_init/{tag}",
                                      nan_fracs=nfs)

    agent = AgentAR(env, dataset, tc, out_dir=cfg.model_dir)
    ckpt_path = os.path.join(cfg.model_dir, f"iter_{args.iter:04d}.p")
    if args.iter > 0 or os.path.exists(ckpt_path):
        # --iter 0 resumes from the saved warm-start checkpoint when one
        # exists (reference train_init saves checkpoint 0 for exactly this)
        agent.load_checkpoint(ckpt_path)
        if args.force_init:
            logger.info("supervised continuation (train_init on resume)...")
            run_train_init()
            agent.save_checkpoint(
                os.path.join(cfg.model_dir, f"iter_{agent.epoch:04d}.p"))
    elif not args.skip_init:
        logger.info("supervised warm start (train_init)...")
        run_train_init()
        # reference agent_ar.train_init saves checkpoint 0 after the warm
        # start; lets a later run resume with --iter 0 and skip it
        if cfg.model_dir:
            path = agent.save_checkpoint(
                os.path.join(cfg.model_dir, "iter_0000.p"))
            logger.info(f"saved warm-start checkpoint {path}")

    max_epochs = (args.max_epochs if args.max_epochs is not None
                  else cfg.policy_specs.get("max_iter_num", 20000))
    from kinpoly_tpu.utils.metrics_log import MetricsLogger
    mlog = MetricsLogger(cfg.model_dir, run_name=f"ar_{args.cfg}",
                         use_wandb=True, config=dict(cfg=args.cfg))
    for i in range(agent.epoch, max_epochs):
        m = agent.optimize_policy()
        mlog.log(i, m)
        nan_warn = (f"  [WARN zero_nans hit {m['bc_nan_frac']:.0%} of BC "
                    f"grad leaves]"
                    if m.get("bc_nan_frac", 0) > NAN_FRAC_WARN else "")
        logger.info(
            f"epoch {i}  R {m['reward_mean']:.4f}  bc {m['bc_loss']:.4f}  "
            f"ppo {m['ppo_loss']:.4f}  fail {m['fail_frac']:.3f}  "
            f"|r-1| {m.get('ratio_dev', 0):.4f}  pg {m.get('ppo_grad_norm', 0):.2f}  "
            f"advs {m.get('adv_std', 0):.3f}  T {m['T_iter']:.2f}s{nan_warn}")
    # short runs end between save_model_interval marks; keep the last epoch
    if cfg.model_dir and agent.epoch % cfg.train_config().save_model_interval != 0:
        logger.info(f"saved final checkpoint {agent.save_checkpoint()}")


if __name__ == "__main__":
    main()
