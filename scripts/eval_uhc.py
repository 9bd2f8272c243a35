#!/usr/bin/env python
"""UHC coverage evaluation (reference scripts/eval_uhc.py --mode stats):
fraction of clips tracked to 100% without termination; optional fail-safe
teleports with per-clip fail counts.

The reference fans out a torch.multiprocessing Pool over clips; here all
clips run as one vmapped batch inside a single jitted scan.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="uhc")
    p.add_argument("--iter", type=int, required=True)
    p.add_argument("--data", default=None)
    p.add_argument("--out", default="results")
    p.add_argument("--metrics", action="store_true",
                   help="also print the eval_pose_all metric row per clip "
                        "(mpjpe/root/head/accel/vel/slide/pen of the tracked "
                        "vs GT trajectories)")
    p.add_argument("--seeds", type=int, default=0,
                   help="N stochastic seeds for a coverage uncertainty band")
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
    logger = create_logger()

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        spec = parse_humanoid(
            "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
        model = eng.build_model(spec, uhc_control_params(spec))
        standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
        if args.data:
            takes = joblib.load(args.data)
        else:
            q = np.asarray(standing["qpos"], np.float32)
            takes = {"standing": {"qpos": np.repeat(q[None], 120, 0)}}
        t_max = max(t["qpos"].shape[0] for t in takes.values())
        clips = [exlib.from_qpos(spec, np.asarray(t["qpos"], np.float32),
                                 dt=model.control_dt, pad_to=t_max)
                 for t in takes.values()]
        bank = exlib.stack_bank(clips)
        env = HumanoidImEnv(model, cfg.env_config(), bank,
                            np.asarray(standing["qpos"], np.float32),
                            np.asarray(standing["qvel"], np.float32),
                            mode="test")

    agent = UHCAgent(env, cfg.train_config())
    agent.load_checkpoint(os.path.join(cfg.model_dir, f"iter_{args.iter:04d}.p"))
    cov, detail = agent.eval_coverage(max_steps=t_max + 2,
                                      stochastic_seeds=args.seeds)
    for name, ok, pct in zip(takes.keys(), detail["succ"], detail["percent"]):
        logger.info(f"{name}: {'OK' if ok else 'FAIL'}  tracked {pct:.1%}")
    logger.info(f"coverage_det: {cov:.4f} over {len(detail['succ'])} clips  "
                f"mean tracked {float(detail['percent'].mean()):.1%}")
    if args.seeds:
        logger.info(f"coverage_mean: {detail['coverage_mean']:.4f} "
                    f"+- {detail['coverage_std']:.4f} over {args.seeds} seeds")

    if args.metrics:
        # deterministic mean-action tracking per clip, no auto-reset; then
        # the paper's metric suite of tracked vs GT qpos
        # (reference eval_pose_all.py:176-196)
        import jax.numpy as jnp
        from kinpoly_tpu.metrics import pose_metrics
        from kinpoly_tpu.rl import running_norm as rn

        n = len(clips)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        idxs = jnp.arange(n, dtype=jnp.int32)
        policy_apply = agent.policy.apply
        params = agent.train_state.policy_params
        norm = agent.norm

        @jax.jit
        def track():
            st, obs = jax.vmap(
                lambda k, i: env.reset(k, i, deterministic=True))(keys, idxs)

            def step(carry, _):
                s, o = carry
                mean, _ = policy_apply(params, rn.apply(norm, o))
                s2, o2, r, d, info = jax.vmap(env.step)(s, mean)
                return (s2, o2), (s2.sim.qpos, d)

            _, (qpos_seq, dones) = jax.lax.scan(
                step, (st, obs), None, length=t_max - 1)
            return qpos_seq, dones

        qpos_seq, dones = jax.device_get(track())    # (T-1, n, 76), (T-1, n)
        rows = []
        for i, (name, take) in enumerate(takes.items()):
            gt = np.asarray(take["qpos"], np.float32)
            T = gt.shape[0]
            d = np.nonzero(dones[:, i])[0]
            end = min(int(d[0]) + 1 if len(d) else T - 1, T - 1)
            m = pose_metrics.evaluate_pair(
                spec, qpos_seq[:end, i], gt[1:end + 1],
                cand=(model.cand_verts, model.cand_body))
            m = {k: float(v) for k, v in m.items()}
            rows.append(m)
            logger.info(f"{name}: " +
                        " ".join(f"{k}:{v:.2f}" for k, v in m.items()))
        agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        logger.info("MEAN  " + " ".join(f"{k}:{v:.3f}" for k, v in agg.items()))


if __name__ == "__main__":
    main()
