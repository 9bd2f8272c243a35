#!/usr/bin/env python
"""Supervised kinematic ARNet training (reference scripts/exp_arnet_all.py):
no physics in the loop — pure sequence modeling with scheduled sampling and
a window-length curriculum (fr_num 80 -> 150, gt_rate 0.3 -> 0).

Usage:
  python scripts/exp_arnet.py --cfg kin_poly --data <annotations.p>
  python scripts/exp_arnet.py --cfg kin_poly --data <annotations.p> --test
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
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="kin_poly")
    p.add_argument("--data", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--test", action="store_true")
    p.add_argument("--iter", type=int, default=0)
    p.add_argument("--out", default="results")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.config import KinPolyConfig
    from kinpoly_tpu.data import statear
    from kinpoly_tpu.models import traj_ar
    from kinpoly_tpu.metrics import pose_metrics
    from kinpoly_tpu.utils.logger import create_logger

    cfg = KinPolyConfig(args.cfg, args.out)
    logger = create_logger(os.path.join(cfg.out_dir, "log_arnet.txt"))

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        spec = parse_humanoid(
            "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
        if args.data:
            takes = statear.load_annotations(args.data, spec=spec)
        else:
            logger.info("no --data; synthetic standing takes (smoke run)")
            standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
            q = np.asarray(standing["qpos"], np.float32)
            rng = np.random.RandomState(0)
            seq = np.repeat(q[None], 240, 0)
            seq[:, 7:] += np.cumsum(rng.uniform(-0.005, 0.005, (240, 69)), 0).astype(np.float32)
            obj = np.zeros((240, 7), np.float32)
            obj[:, :3] = [1.0, 0.5, 0.4]
            obj[:, 3] = 1
            takes = [statear.derive_features(spec, seq, obj)]

    tcfg = cfg.traj_ar_config()
    net = traj_ar.TrajARNet(spec=spec, cfg=tcfg, as_policy=False)
    np_rng = np.random.RandomState(cfg.seed)

    ckpt_path = os.path.join(cfg.model_dir, "arnet_iter_%04d.p")

    if args.test:
        with open(ckpt_path % args.iter, "rb") as f:
            params = pickle.load(f)["params"]
        dataset = statear.StateARDataset(takes, fr_num=cfg.fr_num)
        rows = []
        for i in range(dataset.n_takes):
            batch = dataset.whole_take(i)
            feats = jax.jit(lambda p, b: net.apply(p, b, 0.0, jax.random.PRNGKey(0)))(params, batch)
            m = pose_metrics.evaluate_pair(
                spec, np.asarray(feats["qpos"][0]), np.asarray(batch.qpos[0]))
            rows.append({k: float(v) for k, v in m.items()})
            logger.info(f"take {i}: " + " ".join(f"{k}:{v:.3f}" for k, v in rows[-1].items()))
        agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        logger.info("MEAN  " + " ".join(f"{k}:{v:.3f}" for k, v in agg.items()))
        return

    # fr_num curriculum 80 -> 150 (exp_arnet_all.py:115-122)
    epochs = args.epochs or cfg.num_epoch
    params = None
    opt = optax.adam(cfg.lr)
    opt_state = None
    key = jax.random.PRNGKey(cfg.seed)

    @jax.jit
    def step(params, opt_state, batch, key, gt_rate):
        def loss_fn(p):
            feats = net.apply(p, batch, gt_rate, key, True)
            loss, info = traj_ar.compute_loss(tcfg, feats, batch)
            return loss, info
        (loss, info), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for ep in range(args.iter, epochs):
        fr_num = 80 + 10 * min(ep // 100, 7)
        gt_rate = max(0.3 * (1 - ep / 1000), 0.0)
        dataset = statear.StateARDataset(takes, fr_num=fr_num)
        batch = dataset.get_batch(np_rng, min(cfg.batch_size, 64))
        if params is None:
            key, k = jax.random.split(key)
            params = net.init(k, batch, 0.0, jax.random.PRNGKey(0))
            opt_state = opt.init(params)
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, k, gt_rate)
        if ep % 10 == 0:
            logger.info(f"epoch {ep} fr {fr_num} gt {gt_rate:.2f} loss {float(loss):.4f}")
        if (ep + 1) % cfg.policy_specs.get("save_model_interval", 50) == 0:
            os.makedirs(cfg.model_dir, exist_ok=True)
            with open(ckpt_path % (ep + 1), "wb") as f:
                pickle.dump({"params": jax.device_get(params), "epoch": ep + 1}, f)


if __name__ == "__main__":
    main()
