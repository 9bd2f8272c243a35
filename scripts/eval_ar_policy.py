#!/usr/bin/env python
"""Kinematic-policy evaluation (reference scripts/eval_ar_policy.py
--mode stats): per-take coverage with optional fail-safe teleports, dumping
{pred, target(gt), percent, fail_safe} result rows, then the eval_pose_all
metric table.

The reference fans a Pool over takes; here takes run vmapped in one scan.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "JAX_PLATFORMS" in os.environ and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp
import joblib
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="kin_poly")
    p.add_argument("--iter", type=int, required=True)
    p.add_argument("--data", default=None)
    p.add_argument("--uhc-checkpoint", default=None)
    p.add_argument("--wild", action="store_true")
    p.add_argument("--fail-safe", action="store_true")
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
    from kinpoly_tpu.metrics import pose_metrics
    from kinpoly_tpu.models import nets
    from kinpoly_tpu.physics import contact as ct
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.rl import running_norm as rn, rollout_ar as roa
    from kinpoly_tpu.rl.agent_ar import AgentAR
    from kinpoly_tpu.utils.logger import create_logger
    from scripts.train_ar_policy import load_uhc

    cfg = KinPolyConfig(args.cfg, args.out)
    cc_cfg = UHCConfig("uhc", args.out)
    logger = create_logger()

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        spec = parse_humanoid(
            "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml")
        model = eng.build_model(spec, uhc_control_params(spec),
                                with_objects=True, movable_objects=True,
                                compact_k=(16, 8))
        if args.data:
            takes = statear.load_annotations(args.data, spec=spec)
        else:
            standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
            q = np.asarray(standing["qpos"], np.float32)
            rng = np.random.RandomState(0)
            seq = np.repeat(q[None], 120, 0)
            seq[:, 7:] += np.cumsum(rng.uniform(-0.003, 0.003, (120, 69)), 0).astype(np.float32)
            obj = np.zeros((120, 7), np.float32)
            obj[:, :3] = [1.0, 0.5, 0.4]
            obj[:, 3] = 1
            takes = [statear.derive_features(spec, seq, obj)]

        T_max = max(t["qpos"].shape[0] for t in takes)
        dataset = statear.StateARDataset(takes, fr_num=T_max)

        if args.uhc_checkpoint:
            cc_apply, cc_params, cc_norm = load_uhc(args.uhc_checkpoint)
        else:
            pol = nets.PolicyMCP(action_dim=75)
            cc_params = pol.init(jax.random.PRNGKey(0), np.zeros((1, 784), np.float32))
            cc_apply, cc_norm = pol.apply, rn.init(784)

        env = HumanoidAREnv(
            model, cfg.traj_ar_config(), cc_cfg.env_config(),
            cfg.reward_weights(), context=None,
            cc_policy_apply=cc_apply, cc_policy_params=cc_params,
            cc_norm=cc_norm, mode="test", wild=args.wild,
            policy_v=cfg.policy_specs.get("policy_v", 1))

    agent = AgentAR(env, dataset, cfg.train_config())
    ckpt = os.path.join(cfg.model_dir, f"iter_{args.iter:04d}.p")
    if os.path.exists(ckpt):
        agent.load_checkpoint(ckpt)
    else:
        logger.info(f"checkpoint {ckpt} not found; evaluating fresh params")

    # whole-take contexts (edge-padded to the longest take: wild banks mix
    # durations by construction — round-5 time-stretched generator)
    batches = [dataset.whole_take(i, use_of=cfg.use_of, pad_to=T_max)
               for i in range(dataset.n_takes)]
    batch = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *batches)
    ctx = agent._jit_build_ctx(agent.params, batch, True)

    n = dataset.n_takes
    rollout = roa.make_ar_rollout(env, agent.policy, T_max - 1,
                                  fail_safe=args.fail_safe)
    carry = roa.init_ar_rollout_state(
        env, agent.policy, jax.random.PRNGKey(7),
        jnp.arange(n, dtype=jnp.int32), ctx)

    @jax.jit
    def run(params, carry):
        return rollout(carry, params, ctx, mean_action=True)

    carry, traj = run(agent.params, carry)

    # per-take stats: first done step, percent, pred trajectory
    masks = np.asarray(traj.masks)             # (T, N)
    percents = np.asarray(traj.percents)
    res_qpos = np.asarray(traj.res_qpos)
    fails = np.asarray(traj.fails)
    obj_traj = (np.asarray(traj.obj_qpos)
                if traj.obj_qpos is not None else None)  # (T, N, n_obj, 7)
    cand_verts, cand_body = model.cand_verts, model.cand_body

    from kinpoly_tpu.physics import fk as fklib
    head_idx = spec.body_index("Head")

    os.makedirs(os.path.join(cfg.out_dir, "results"), exist_ok=True)
    rows = []
    per_action = {}
    for i in range(n):
        done_steps = np.nonzero(masks[:, i] == 0)[0]
        end = int(done_steps[0]) + 1 if len(done_steps) else masks.shape[0]
        # padded frames past the take's true duration are not part of the
        # episode (metrics/GT comparison stop at length-1 transitions)
        end = min(end, int(batch.length[i]) - 1)
        percent = float(percents[end - 1, i])
        fs_count = int(fails[:end, i].sum())
        pred = res_qpos[:end, i]
        gt = np.asarray(batch.qpos[i, 1:end + 1])
        m = pose_metrics.evaluate_pair(spec, pred, gt, cand=(cand_verts, cand_body))
        m = {k: float(v) for k, v in m.items()}
        m["percent"] = percent
        m["fail_safe"] = fs_count

        # per-action success (eval_pose_all.py:337-467; fail-safe => fail)
        a_oh = np.asarray(batch.action_one_hot[i, 0])
        action = (pose_metrics.ACTIONS[int(a_oh.argmax())]
                  if a_oh.sum() > 0 else "None")
        obj_i = (obj_traj[:end, i] if obj_traj is not None
                 else np.asarray(batch.obj_pose[i, :1, :7]))
        res_fk = fklib.fk(spec, jnp.asarray(pred))
        head_pred = np.asarray(res_fk.xpos[:, head_idx])
        gt_fk = fklib.fk(spec, jnp.asarray(gt))
        head_gt = np.asarray(gt_fk.xpos[:, head_idx])
        succ = pose_metrics.action_success(
            spec, model.scene, jnp.asarray(pred), jnp.asarray(obj_i), action,
            head_pose_pred=head_pred, head_pose_gt=head_gt,
            fail_safe_used=fs_count > 0,
            verts=cand_verts, vert_body=cand_body)
        m["succ"] = float(succ)
        per_action.setdefault(action, []).append(float(succ))
        rows.append(m)
        tag = "wild_" if args.wild else ""
        with open(os.path.join(cfg.out_dir, "results",
                               f"{args.iter:04d}_{tag}take{i}_coverage_full.pkl"), "wb") as f:
            pickle.dump(dict(pred=pred, gt=gt, percent=percent,
                             fail_safe=fs_count > 0, action=action,
                             obj_pose=obj_i, succ=bool(succ)), f)
        logger.info(f"take {i} [{action}]: pct {percent:.2f} fs {fs_count} " +
                    " ".join(f"{k}:{v:.3f}" for k, v in m.items()
                             if k not in ("fail_safe",)))

    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    coverage = float(np.mean([r["percent"] >= 1.0 and r["fail_safe"] == 0
                              for r in rows]))
    logger.info("MEAN  " + " ".join(f"{k}:{v:.3f}" for k, v in agg.items()))
    for a in sorted(per_action):
        logger.info(f"succ[{a}]: {np.mean(per_action[a]):.3f} "
                    f"({len(per_action[a])} takes)")
    logger.info(f"coverage: {coverage:.4f} over {n} takes "
                f"(fail-safe counted as failure)")


if __name__ == "__main__":
    main()
