#!/usr/bin/env python
"""Interactive motion viewer CLI (the reference's visualizer entry point,
``uhc/khrylib/rl/utils/visualizer.py``, as a self-contained HTML export).

  # view takes from a qpos bank (clip generators / training data)
  python scripts/view_motion.py --bank data_bank/action_takes.pkl --take sit-00

  # view an eval result (pred vs gt + simulated objects)
  python scripts/view_motion.py --result results/statear/kin_poly/results/0001_take0_coverage_full.pkl
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import joblib
import numpy as np

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bank", default=None, help="qpos bank pickle")
    p.add_argument("--take", default=None, help="take name inside the bank")
    p.add_argument("--result", default=None, help="eval result pickle (pred/gt)")
    p.add_argument("--out", default=None, help="output html (default: derived)")
    args = p.parse_args()

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.metrics import pose_metrics as pm
    from kinpoly_tpu.utils.html_viewer import export_html

    spec = parse_humanoid(XML)

    if args.result:
        blob = joblib.load(args.result)
        seqs = {"pred": np.asarray(blob["pred"])}
        if "gt" in blob:
            seqs["gt"] = np.asarray(blob["gt"])
        obj = blob.get("obj_pose")
        if obj is not None and np.asarray(obj).ndim == 2:
            # single active object -> place into the full object slot layout
            act = blob.get("action", "sit")
            T = np.asarray(obj).shape[0]
            full = np.zeros((T, len(spec.objects), 7), np.float32)
            full[:, :, 0] = np.arange(len(spec.objects))[None] * 100 + 100
            full[:, :, 3] = 1
            if act in pm.ACTIONS:
                full[:, int(pm.action_object_indices(spec)[
                    pm.ACTIONS.index(act)])] = np.asarray(obj)[:, :7]
            obj = full
        out = args.out or os.path.splitext(args.result)[0] + ".html"
        title = os.path.basename(args.result)
    elif args.bank:
        bank = joblib.load(args.bank)
        name = args.take or next(iter(bank))
        take = bank[name]
        seqs = {name: np.asarray(take["qpos"])}
        obj = None
        if "obj_pose" in take:
            act = take.get("action", "sit")
            o = np.asarray(take["obj_pose"])
            T = o.shape[0]
            obj = np.zeros((T, len(spec.objects), 7), np.float32)
            obj[:, :, 0] = np.arange(len(spec.objects))[None] * 100 + 100
            obj[:, :, 3] = 1
            if act in pm.ACTIONS:
                obj[:, int(pm.action_object_indices(spec)[
                    pm.ACTIONS.index(act)])] = o[:, :7]
            if o.shape[-1] >= 14:
                obj[:, 2] = o[:, 7:14]
            elif "table_pose" in take:
                obj[:, 2] = np.asarray(take["table_pose"])[:, :7]
        out = args.out or f"/tmp/{name}.html"
        title = name
    else:
        p.error("--bank or --result required")

    path = export_html(spec, seqs, out, obj_seq=obj, title=title)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
