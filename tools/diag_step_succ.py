#!/usr/bin/env python
"""Diagnose succ[step]=0 on the composite checkpoint: for each step take in
the bank, print the pelvis-z trajectory margins (sim vs GT), foot-on-step
contact frames, and where the success rule (pose_metrics.action_success:
foot contact AND pelvis raise > 0.1 m) fails.

Usage: python tools/diag_step_succ.py --iter 800 [--data data_bank/action_takes_test.pkl]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
# the axon sitecustomize pre-sets JAX_PLATFORMS=axon; setdefault would
# no-op and this "CPU" diagnostic would silently grab the TPU tunnel
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["JAX_PLATFORMS"] = os.environ.get("JAX_PLATFORMS", "") and \
        os.environ["JAX_PLATFORMS"] + ",cpu" or "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="kin_poly")
    p.add_argument("--data", default="data_bank/action_takes_test.pkl")
    p.add_argument("--uhc-checkpoint",
                   default="results/motion_im/uhc/models/iter_13000.p")
    p.add_argument("--iter", type=int, default=800)
    p.add_argument("--out", default="results_r5")
    args = p.parse_args()

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.config import KinPolyConfig, UHCConfig
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.data import statear
    from kinpoly_tpu.envs.humanoid_ar import HumanoidAREnv
    from kinpoly_tpu.metrics import pose_metrics
    from kinpoly_tpu.physics import contact as ct
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.rl import rollout_ar as roa
    from kinpoly_tpu.rl.agent_ar import AgentAR
    from scripts.train_ar_policy import load_uhc

    cfg = KinPolyConfig(args.cfg, args.out)
    cc_cfg = UHCConfig("uhc", args.out)
    spec = parse_humanoid(
        "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml")
    model = eng.build_model(spec, uhc_control_params(spec),
                            with_objects=True, movable_objects=True)
    takes = statear.load_annotations(args.data, spec=spec)
    # keep step takes only
    keep = [i for i, t in enumerate(takes)
            if np.asarray(t["action_one_hot"][0]).argmax() == 3
            and np.asarray(t["action_one_hot"][0]).sum() > 0]
    print(f"step takes in bank: {keep} of {len(takes)}")
    takes = [takes[i] for i in keep]
    T_max = max(t["qpos"].shape[0] for t in takes)
    dataset = statear.StateARDataset(takes, fr_num=T_max)
    cc_apply, cc_params, cc_norm = load_uhc(args.uhc_checkpoint)
    env = HumanoidAREnv(
        model, cfg.traj_ar_config(), cc_cfg.env_config(),
        cfg.reward_weights(), context=None,
        cc_policy_apply=cc_apply, cc_policy_params=cc_params,
        cc_norm=cc_norm, mode="test", wild=False,
        policy_v=cfg.policy_specs.get("policy_v", 1))
    agent = AgentAR(env, dataset, cfg.train_config())
    n = dataset.n_takes
    batches = [dataset.whole_take(i, use_of=cfg.use_of, pad_to=T_max)
               for i in range(n)]
    batch = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *batches)
    rollout = roa.make_ar_rollout(env, agent.policy, T_max - 1, fail_safe=True)

    ckpt = os.path.join(cfg.model_dir, f"iter_{args.iter:04d}.p")
    agent.load_checkpoint(ckpt)
    ctx = agent._jit_build_ctx(agent.params, batch, True)
    carry = roa.init_ar_rollout_state(
        env, agent.policy, jax.random.PRNGKey(7),
        jnp.arange(n, dtype=jnp.int32), ctx)
    _, traj = jax.jit(lambda p, c: rollout(carry, p, c, mean_action=True))(
        agent.params, ctx)

    masks = np.asarray(traj.masks)
    res_qpos = np.asarray(traj.res_qpos)
    gt_qpos_tr = np.asarray(traj.gt_qpos)
    obj_traj = np.asarray(traj.obj_qpos) if traj.obj_qpos is not None else None
    verts, vert_body = model.cand_verts, model.cand_body
    step_obj = int(pose_metrics.action_object_indices(spec)[3])

    for i in range(n):
        done = np.nonzero(masks[:, i] == 0)[0]
        end = int(done[0]) + 1 if len(done) else masks.shape[0]
        pred = res_qpos[:end, i]
        gt = np.asarray(batch.qpos[i, 1:end + 1])
        kin_gt = gt_qpos_tr[:end, i]
        obj_i = (obj_traj[:end, i] if obj_traj is not None
                 else np.asarray(batch.obj_pose[i, :1, :7]))
        if obj_i.ndim == 2:
            obj_i = np.broadcast_to(obj_i[None], (end,) + obj_i.shape)

        hit = pose_metrics._contact_frames(
            spec, model.scene, jnp.asarray(pred), jnp.asarray(obj_i),
            pose_metrics._STEP_BODIES, step_obj, verts, vert_body)
        hit = np.asarray(hit)
        raise_pred = pred[:, 2] - pred[0, 2]
        raise_gt = gt[:, 2] - gt[0, 2]
        raise_kin = kin_gt[:, 2] - kin_gt[0, 2]
        fs = int(np.asarray(traj.fails)[:end, i].sum())
        print(f"\ntake {i}: frames={end} fail_safe={fs}")
        print(f"  foot-step contact frames: {hit.sum()} "
              f"(first={int(np.argmax(hit)) if hit.any() else -1})")
        print(f"  pelvis raise max: sim={raise_pred.max():+.3f} "
              f"gt={raise_gt.max():+.3f} traj_gt={raise_kin.max():+.3f} "
              f"(threshold +0.100)")
        print(f"  pelvis z: sim start {pred[0, 2]:.3f} peak {pred[:, 2].max():.3f}"
              f" | gt start {gt[0, 2]:.3f} peak {gt[:, 2].max():.3f}")
        k = max(1, end // 12)
        zs = " ".join(f"{z:+.2f}" for z in raise_pred[::k])
        zg = " ".join(f"{z:+.2f}" for z in raise_gt[::k])
        print(f"  raise(sim) {zs}\n  raise(gt)  {zg}")


if __name__ == "__main__":
    main()
