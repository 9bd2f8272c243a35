#!/usr/bin/env python
"""Aggregate the paper's metric table from saved coverage result rows
(reference scripts/eval_pose_all.py): reads the ``*_coverage_full.pkl``
files dumped by eval_ar_policy.py and prints the per-take + mean metric row
(root_dist, mpjpe, head_dist, accel_dist, vel_dist, slide, penetration).
"""

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "JAX_PLATFORMS" in os.environ and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="kin_poly")
    p.add_argument("--iter", type=int, required=True)
    p.add_argument("--algo", default="kin_poly")
    p.add_argument("--wild", action="store_true")
    p.add_argument("--out", default="results")
    args = p.parse_args()

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.config import KinPolyConfig
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.metrics import pose_metrics
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.utils.logger import create_logger

    cfg = KinPolyConfig(args.cfg, args.out)
    logger = create_logger()
    spec = parse_humanoid(
        "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml")
    model = eng.build_model(spec, uhc_control_params(spec), with_objects=True)

    tag = "wild_" if args.wild else ""
    pattern = os.path.join(cfg.out_dir, "results",
                           f"{args.iter:04d}_{tag}*_coverage_full.pkl")
    files = sorted(glob.glob(pattern))
    if not files:
        logger.info(f"no result files match {pattern}")
        return

    rows = []
    per_action = {}
    for path in files:
        with open(path, "rb") as f:
            res = pickle.load(f)
        pred, gt = np.asarray(res["pred"]), np.asarray(res["gt"])
        T = min(len(pred), len(gt))
        m = pose_metrics.evaluate_pair(
            spec, pred[:T], gt[:T], cand=(model.cand_verts, model.cand_body))
        m = {k: float(v) for k, v in m.items()}
        m["percent"] = float(res.get("percent", 1.0))
        # per-action success (computed at eval time by eval_ar_policy with
        # fail-safe counted as failure; recompute from the pieces if absent)
        if "succ" in res:
            m["succ"] = float(res["succ"])
        elif "action" in res and "obj_pose" in res:
            m["succ"] = float(pose_metrics.action_success(
                spec, model.scene, pred[:T], np.asarray(res["obj_pose"]),
                res["action"], fail_safe_used=bool(res.get("fail_safe"))))
        else:
            m["succ"] = float(m["percent"] >= 1.0)
        per_action.setdefault(res.get("action", "None"), []).append(m["succ"])
        rows.append(m)
        logger.info(os.path.basename(path) + "  " +
                    " ".join(f"{k}:{v:.3f}" for k, v in m.items()))

    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    for a in sorted(per_action):
        logger.info(f"succ[{a}]: {np.mean(per_action[a]):.3f} "
                    f"({len(per_action[a])} takes)")
    logger.info("".join(f"{k}:{v:.3f} \t " for k, v in agg.items()) +
                f"--{args.cfg} | {args.iter} | {args.algo} | wild? {args.wild}")


if __name__ == "__main__":
    main()
