#!/usr/bin/env python
"""Train the Universal Humanoid Controller (reference scripts/train_uhc.py).

The 35-process CPU sampler + single-GPU PPO of the reference becomes one
jitted train iteration per epoch: N vmapped envs x T steps rollout fused with
the PPO update on the TPU chip.

Usage:
  python scripts/train_uhc.py --cfg uhc --data <expert_pickle> [--iter N]

The expert pickle is a dict {take_name: {"qpos": (T, 76), ...}} (the output
of the AMASS preprocessing pipeline, kinpoly_tpu/data/amass.py) or a single
{"qpos": ...} dict; without --data it trains on the standing-neutral fixture
for smoke testing.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# eager prep on CPU; jitted programs on the accelerator
if "JAX_PLATFORMS" in os.environ and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import joblib
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="uhc")
    p.add_argument("--data", default=None)
    p.add_argument("--iter", type=int, default=0)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--n-envs", type=int, default=None)
    p.add_argument("--rollout-steps", type=int, default=None)
    p.add_argument("--hard-states", default=None,
                   help="hard-negative init bank from scripts/gen_states.py "
                        "({'qpos': (K,76), 'qvel': (K,75)}); enables "
                        "reactive_v=2 resets (reference reactive init, "
                        "humanoid_im.py:574-623)")
    p.add_argument("--reactive-rate", type=float, default=None)
    p.add_argument("--out", default="results")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the tunneled TPU plugin is "
                        "pre-registered by sitecustomize; env vars are too late)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.config import UHCConfig
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.data import expert as exlib
    from kinpoly_tpu.envs.humanoid_im import HumanoidImEnv
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.rl.agent_uhc import UHCAgent
    from kinpoly_tpu.utils.logger import create_logger

    cfg = UHCConfig(args.cfg, args.out)
    tc = cfg.train_config()
    if args.n_envs:
        tc = tc.__class__(**{**tc.__dict__, "n_envs": args.n_envs})
    if args.rollout_steps:
        tc = tc.__class__(**{**tc.__dict__, "rollout_steps": args.rollout_steps})

    logger = create_logger(os.path.join(cfg.out_dir, "log.txt"))

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        spec = parse_humanoid(
            "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
        on_tpu = jax.default_backend() != "cpu"
        model = eng.build_model(
            spec, cfg.control_params(spec),
            solver="pallas_ltdl" if on_tpu else "ltdl",
            use_pallas_pgs=on_tpu)

        standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
        if args.data:
            takes = joblib.load(args.data)
            if "qpos" in takes:
                takes = {"take_0": takes}
        else:
            logger.info("no --data given; smoke-training on standing fixture")
            q = np.asarray(standing["qpos"], np.float32)
            takes = {"standing": {"qpos": np.repeat(q[None], 120, 0)}}

        t_max = max(t["qpos"].shape[0] for t in takes.values())
        clips = [exlib.from_qpos(spec, np.asarray(t["qpos"], np.float32),
                                 dt=model.control_dt, pad_to=t_max)
                 for t in takes.values()]
        bank = exlib.stack_bank(clips)
        env_cfg = cfg.env_config()
        hard_states = None
        if args.hard_states:
            hs = joblib.load(args.hard_states)
            hard_states = (np.asarray(hs["qpos"], np.float32),
                           np.asarray(hs["qvel"], np.float32))
            env_cfg = env_cfg.__class__(**{**env_cfg.__dict__,
                                           "reactive_v": 2})
            logger.info(f"reactive_v=2 with {len(hard_states[0])} hard "
                        f"states from {args.hard_states}")
        if args.reactive_rate is not None:
            env_cfg = env_cfg.__class__(
                **{**env_cfg.__dict__, "reactive_rate": args.reactive_rate})
        env = HumanoidImEnv(model, env_cfg, bank,
                            np.asarray(standing["qpos"], np.float32),
                            np.asarray(standing["qvel"], np.float32),
                            hard_states=hard_states)

    agent = UHCAgent(env, tc, out_dir=cfg.model_dir)
    if args.iter > 0:
        agent.load_checkpoint(os.path.join(cfg.model_dir, f"iter_{args.iter:04d}.p"))

    from kinpoly_tpu.utils.metrics_log import MetricsLogger
    mlog = MetricsLogger(cfg.model_dir, run_name=f"uhc_{args.cfg}",
                         use_wandb=True, config=dict(cfg=args.cfg))

    max_iters = args.max_iters or cfg.max_iter_num
    for i in range(agent.epoch, max_iters):
        # adaptive noise/log_std/lr schedules (reference train_uhc.py:18
        # pre_iter_update -> copycat_config.update_adaptive_params:149-166)
        metrics = agent.train_epoch(adaptive=cfg.adaptive_params(i))
        mlog.log(i, metrics)
        logger.info(
            f"iter {i}  R {metrics['reward_mean']:.4f}  "
            f"fail {metrics['fail_frac']:.3f}  T {metrics['T_iter']:.2f}s")
        if (i + 1) % 200 == 0:
            cov, detail = agent.eval_coverage()
            mlog.log(i, dict(coverage=cov,
                             mean_tracked=float(detail["percent"].mean())),
                     prefix="eval/")
            logger.info(f"iter {i}  coverage {cov:.3f}  "
                        f"mean tracked {float(detail['percent'].mean()):.1%}")
    # runs ending between save_model_interval marks must still leave a
    # checkpoint (the queue runner resumes from the latest iter_*.p; found
    # by the round-5 queue dry-run)
    if cfg.model_dir and agent.epoch % agent.cfg.save_model_interval != 0:
        agent.save_checkpoint()
        logger.info(f"saved final checkpoint iter_{agent.epoch:04d}.p")


if __name__ == "__main__":
    main()
