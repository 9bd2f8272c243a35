#!/usr/bin/env python
"""Diagnose the getup/situp/prone tracking failures (UHC coverage gate):
deterministic mean-action tracking of the failing clips, per-frame
per-body divergence around the failure point, plus an HTML viewer dump of
sim-vs-GT for visual inspection.

Usage: python tools/diag_getup.py --iter 13000 [--clips situp-00 getup-00]
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
import joblib
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iter", type=int, default=13000)
    p.add_argument("--data", default="data_bank/clips70.pkl")
    p.add_argument("--clips", nargs="+",
                   default=["situp-00", "getup-00", "prone-00"])
    p.add_argument("--out", default="results")
    p.add_argument("--html", action="store_true")
    args = p.parse_args()

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.config import UHCConfig
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.data import expert as exlib
    from kinpoly_tpu.envs.humanoid_im import HumanoidImEnv
    from kinpoly_tpu.physics import engine as eng, fk as fklib
    from kinpoly_tpu.rl import running_norm as rn
    from kinpoly_tpu.rl.agent_uhc import UHCAgent

    cfg = UHCConfig("uhc", args.out)
    spec = parse_humanoid(
        "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
    model = eng.build_model(spec, uhc_control_params(spec))
    standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
    bank_all = joblib.load(args.data)
    takes = {k: bank_all[k] for k in args.clips}
    t_max = max(t["qpos"].shape[0] for t in takes.values())
    clips = [exlib.from_qpos(spec, np.asarray(t["qpos"], np.float32),
                             dt=model.control_dt, pad_to=t_max)
             for t in takes.values()]
    bank = exlib.stack_bank(clips)
    env = HumanoidImEnv(model, cfg.env_config(), bank,
                        np.asarray(standing["qpos"], np.float32),
                        np.asarray(standing["qvel"], np.float32), mode="test")
    agent = UHCAgent(env, cfg.train_config())
    agent.load_checkpoint(os.path.join(cfg.model_dir, f"iter_{args.iter:04d}.p"))

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
            return (s2, o2), (s2.sim.qpos, d, info["fail"])

        _, (qpos_seq, dones, fails) = jax.lax.scan(
            step, (st, obs), None, length=t_max - 1)
        return qpos_seq, dones, fails

    qpos_seq, dones, fails = jax.device_get(track())
    names = list(spec.body_names)
    for i, (nm, take) in enumerate(takes.items()):
        gt = np.asarray(take["qpos"], np.float32)
        T = gt.shape[0]
        d = np.nonzero(dones[:, i])[0]
        end = min(int(d[0]) + 1 if len(d) else T - 1, T - 1)
        print(f"\n{nm}: terminated at frame {end}/{T} "
              f"(fail={bool(fails[end - 1, i])})")
        # per-body divergence in the last 12 frames before termination
        lo = max(0, end - 12)
        sim_fk = fklib.fk(spec, jnp.asarray(qpos_seq[lo:end, i]))
        gt_fk = fklib.fk(spec, jnp.asarray(gt[lo + 1:end + 1]))
        diff = np.linalg.norm(
            np.asarray(sim_fk.xpos) - np.asarray(gt_fk.xpos), axis=-1)
        mean_diff = diff.mean(-1)
        print("  frame:body_diff  " + " ".join(
            f"{lo + k}:{v:.2f}" for k, v in enumerate(mean_diff)))
        worst = diff[-1].argsort()[::-1][:6]
        print("  worst bodies at term: " + ", ".join(
            f"{names[b]}:{diff[-1, b]:.2f}" for b in worst))
        print(f"  sim pelvis z {qpos_seq[lo:end, i, 2].round(2)}")
        print(f"  gt  pelvis z {gt[lo + 1:end + 1, 2].round(2)}")
        if args.html:
            from kinpoly_tpu.utils.html_viewer import export_html
            out = f"/tmp/diag_{nm}.html"
            export_html(spec, {"sim": qpos_seq[:end, i],
                               "gt": gt[1:end + 1]}, out)
            print(f"  viewer: {out}")


if __name__ == "__main__":
    main()
