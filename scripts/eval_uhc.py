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
    args = p.parse_args()

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
    cov, detail = agent.eval_coverage(max_steps=t_max + 2)
    for name, ok, pct in zip(takes.keys(), detail["succ"], detail["percent"]):
        logger.info(f"{name}: {'OK' if ok else 'FAIL'}  tracked {pct:.1%}")
    logger.info(f"coverage: {cov:.4f} over {len(detail['succ'])} clips  "
                f"mean tracked {float(detail['percent'].mean()):.1%}")


if __name__ == "__main__":
    main()
