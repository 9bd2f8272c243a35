#!/usr/bin/env python
"""Harvest hard-negative rollout states (reference
uhc/data_process/gen_states.py): run the (current) UHC policy stochastically
over the expert bank, collect the sim states at tracking-failure steps, and
save them as an init bank for reactive_v=2 training
(HumanoidImEnv(hard_states=...)).

Usage: python scripts/gen_states.py --data <expert_pickle>
         [--checkpoint results/.../iter_0500.p] [--n-envs 256] [--steps 64]
         [--out data_bank/hard_states.pkl]
"""

import argparse
import os
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
    p.add_argument("--data", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--n-envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--max-states", type=int, default=4096)
    p.add_argument("--min-z", type=float, default=0.3,
                   help="pelvis-height floor for kept states; use ~0.05 "
                        "when mining supine/get-up failures (the default "
                        "would filter out exactly those)")
    p.add_argument("--out", default="data_bank/hard_states.pkl")
    args = p.parse_args()

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.data import expert as exlib
    from kinpoly_tpu.envs.humanoid_im import EnvConfig, HumanoidImEnv
    from kinpoly_tpu.models import nets
    from kinpoly_tpu.physics import engine as eng
    from kinpoly_tpu.rl import rollout as ro, running_norm as rn
    from kinpoly_tpu.utils.logger import create_logger

    logger = create_logger()
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        spec = parse_humanoid(
            "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
        model = eng.build_model(spec, uhc_control_params(spec))
        takes = joblib.load(args.data)
        t_max = max(np.asarray(t["qpos"]).shape[0] for t in takes.values())
        clips = [exlib.from_qpos(spec, np.asarray(t["qpos"], np.float32),
                                 dt=model.control_dt, pad_to=t_max)
                 for t in takes.values()]
        bank = exlib.stack_bank(clips)
        standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
        env = HumanoidImEnv(model, EnvConfig(), bank,
                            np.asarray(standing["qpos"], np.float32),
                            np.asarray(standing["qvel"], np.float32))
        policy = nets.PolicyMCP(action_dim=env.action_dim)
        params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 784)))
        norm = rn.init(784)
        if args.checkpoint:
            import pickle
            with open(args.checkpoint, "rb") as f:
                blob = pickle.load(f)
            params, norm = blob["policy_params"], blob["norm"]

    rollout = ro.make_rollout(env, policy.apply, args.steps, noise_rate=1.0)
    probs = jnp.ones(len(clips)) / len(clips)

    @jax.jit
    def run(carry):
        carry2, traj = rollout(carry, params, norm, probs)
        return carry2, traj

    # the rollout records the post-step sim state of every env (pre-reset),
    # so the states AT failure steps are directly available
    hard_q, hard_v = [], []
    carry = ro.init_rollout_state(env, jax.random.PRNGKey(0), args.n_envs, probs)
    for r in range(args.rounds):
        carry, traj = run(carry)
        fails = np.asarray(traj.fails)                     # (T, N)
        q = np.asarray(traj.qpos)[fails]                   # (n_f, 76)
        v = np.asarray(traj.qvel)[fails]
        keep = (np.isfinite(q).all(1) & np.isfinite(v).all(1)
                & (q[:, 2] > args.min_z) & (np.abs(v).max(1) < 25.0))
        hard_q.append(q[keep])
        hard_v.append(v[keep])
        logger.info(f"round {r}: {int(fails.sum())} failure steps, "
                    f"kept {int(keep.sum())} states")

    hq = np.concatenate(hard_q)[: args.max_states].astype(np.float32)
    hv = np.concatenate(hard_v)[: args.max_states].astype(np.float32)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    joblib.dump(dict(qpos=hq, qvel=hv), args.out)
    logger.info(f"wrote {len(hq)} hard states to {args.out}")


if __name__ == "__main__":
    main()
