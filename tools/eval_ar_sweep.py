#!/usr/bin/env python
"""Checkpoint-sweep evaluation for the AR policy: build the env + jitted
rollout ONCE, then evaluate many checkpoints against one bank (round-3
lesson: per-checkpoint eval processes paid 2-4 min of XLA CPU compile each;
one process amortizes it to a single compile).

Usage:
  python tools/eval_ar_sweep.py --cfg kin_poly --data data_bank/action_takes_test.pkl \
      --uhc-checkpoint results/motion_im/uhc/models/iter_8000.p \
      --iters 450 500 550 --out results_r4 [--fail-safe] [--wild]

Prints one summary line per checkpoint plus a final ranking by held-out
MPJPE; mirrors scripts/eval_ar_policy.py (reference eval_ar_policy.py
--mode stats + eval_pose_all.py) without the per-take result dumps.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "JAX_PLATFORMS" in os.environ and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="kin_poly")
    p.add_argument("--data", required=True)
    p.add_argument("--uhc-checkpoint", required=True)
    p.add_argument("--iters", type=int, nargs="+", required=True)
    p.add_argument("--out", default="results")
    p.add_argument("--fail-safe", action="store_true")
    p.add_argument("--wild", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.config import KinPolyConfig, UHCConfig
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.data import statear
    from kinpoly_tpu.envs.humanoid_ar import HumanoidAREnv
    from kinpoly_tpu.metrics import pose_metrics
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.physics import fk as fklib
    from kinpoly_tpu.rl import rollout_ar as roa
    from kinpoly_tpu.rl.agent_ar import AgentAR
    from scripts.train_ar_policy import load_uhc

    cfg = KinPolyConfig(args.cfg, args.out)
    cc_cfg = UHCConfig("uhc", args.out)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        spec = parse_humanoid(
            "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml")
        model = eng.build_model(spec, uhc_control_params(spec),
                                with_objects=True, movable_objects=True)
        takes = statear.load_annotations(args.data, spec=spec)
        T_max = max(t["qpos"].shape[0] for t in takes)
        dataset = statear.StateARDataset(takes, fr_num=T_max)
        cc_apply, cc_params, cc_norm = load_uhc(args.uhc_checkpoint)
        env = HumanoidAREnv(
            model, cfg.traj_ar_config(), cc_cfg.env_config(),
            cfg.reward_weights(), context=None,
            cc_policy_apply=cc_apply, cc_policy_params=cc_params,
            cc_norm=cc_norm, mode="test", wild=args.wild,
            policy_v=cfg.policy_specs.get("policy_v", 1))

    agent = AgentAR(env, dataset, cfg.train_config())
    n = dataset.n_takes
    batches = [dataset.whole_take(i, use_of=cfg.use_of, pad_to=T_max)
               for i in range(n)]
    batch = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *batches)

    rollout = roa.make_ar_rollout(env, agent.policy, T_max - 1,
                                  fail_safe=args.fail_safe)

    @jax.jit
    def run(params, ctx):
        carry = roa.init_ar_rollout_state(
            env, agent.policy, jax.random.PRNGKey(7),
            jnp.arange(n, dtype=jnp.int32), ctx)
        return rollout(carry, params, ctx, mean_action=True)

    head_idx = spec.body_index("Head")
    cand_verts, cand_body = model.cand_verts, model.cand_body
    summary = []
    for it in args.iters:
        ckpt = os.path.join(cfg.model_dir, f"iter_{it:04d}.p")
        if not os.path.exists(ckpt):
            print(f"iter {it}: MISSING {ckpt}")
            continue
        agent.load_checkpoint(ckpt)
        ctx = agent._jit_build_ctx(agent.params, batch, True)
        _, traj = run(agent.params, ctx)

        masks = np.asarray(traj.masks)
        percents = np.asarray(traj.percents)
        res_qpos = np.asarray(traj.res_qpos)
        fails = np.asarray(traj.fails)
        obj_traj = (np.asarray(traj.obj_qpos)
                    if traj.obj_qpos is not None else None)

        rows, per_action = [], {}
        for i in range(n):
            done_steps = np.nonzero(masks[:, i] == 0)[0]
            end = int(done_steps[0]) + 1 if len(done_steps) else masks.shape[0]
            percent = float(percents[end - 1, i])
            fs = int(fails[:end, i].sum())
            pred = res_qpos[:end, i]
            gt = np.asarray(batch.qpos[i, 1:end + 1])
            m = pose_metrics.evaluate_pair(spec, pred, gt,
                                           cand=(cand_verts, cand_body))
            m = {k: float(v) for k, v in m.items()}
            a_oh = np.asarray(batch.action_one_hot[i, 0])
            action = (pose_metrics.ACTIONS[int(a_oh.argmax())]
                      if a_oh.sum() > 0 else "None")
            obj_i = (obj_traj[:end, i] if obj_traj is not None
                     else np.asarray(batch.obj_pose[i, :1, :7]))
            res_fk = fklib.fk(spec, jnp.asarray(pred))
            gt_fk = fklib.fk(spec, jnp.asarray(gt))
            succ = pose_metrics.action_success(
                spec, model.scene, jnp.asarray(pred), jnp.asarray(obj_i),
                action,
                head_pose_pred=np.asarray(res_fk.xpos[:, head_idx]),
                head_pose_gt=np.asarray(gt_fk.xpos[:, head_idx]),
                fail_safe_used=fs > 0,
                verts=cand_verts, vert_body=cand_body)
            m.update(percent=percent, fail_safe=fs, succ=float(succ))
            per_action.setdefault(action, []).append(float(succ))
            rows.append(m)

        agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        coverage = float(np.mean([r["percent"] >= 1.0 and r["fail_safe"] == 0
                                  for r in rows]))
        succ_by_a = {a: float(np.mean(v)) for a, v in sorted(per_action.items())}
        line = dict(iter=it, coverage=coverage, wild=args.wild,
                    mpjpe=agg.get("mpjpe"), succ=agg.get("succ"),
                    fail_safe_rate=float(np.mean([r["fail_safe"] > 0
                                                  for r in rows])),
                    succ_by_action=succ_by_a)
        print(json.dumps(line))
        summary.append((agg.get("mpjpe", 1e9), it, line))

    if summary:
        summary.sort()
        print(f"# best by mpjpe: iter {summary[0][1]} "
              f"({summary[0][0]:.1f} mm)")


if __name__ == "__main__":
    main()
