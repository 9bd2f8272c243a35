"""Train the optical-flow feature encoder on synthetic egomotion flow
(VERDICT r2 missing #5: the OF/person encoders ran with random weights, so
use_of features were shape-correct but semantically empty).

The reference encodes PWC-Net flow with a pretrained ResNet-18
(kin_poly/data_process/compute_of_feat.py); those weights cannot ship.
Instead we train the SAME flax ResNet-18 to regress camera egomotion from
analytically synthesized first-person flow:

- camera = the humanoid's head (head trajectories from the clip banks);
- static scene = a random smooth inverse-depth field per sequence;
- flow of a moving camera in a static scene (normalized pinhole coords):
    u = rho * (-v_x + x v_z,  -v_y + y v_z)
        + ( x y w_x - (1+x^2) w_y + y w_z,
            (1+y^2) w_x - x y w_y - x w_z )

The regression target is exactly the 6-d head velocity feature the KinPoly
context consumes (head_vels), so the trained features carry the egomotion
signal the reference's OF features provide. Saves params to
data_bank/of_encoder.pkl, which FlowFeatureEncoder auto-loads.

  python tools/train_of_encoder.py [steps] [--cpu]
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import joblib
import numpy as np
import optax

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1500
H = W = 64
BATCH = 64
OUT = "/root/repo/data_bank/of_encoder.pkl"


def head_vel_bank():
    """All head_vels rows from the committed banks -> (N, 6) training pool."""
    import jax as _jax
    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.data import statear

    spec = parse_humanoid(
        "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml")
    rows = []
    for bank in ("data_bank/action_takes.pkl", "data_bank/clips24.pkl",
                 "data_bank/hard12.pkl"):
        takes = joblib.load(os.path.join("/root/repo", bank))
        for name, t in takes.items():
            obj = t.get("obj_pose")
            if obj is None:
                obj = np.zeros((t["qpos"].shape[0], 7), np.float32)
                obj[:, 0] = 100.0
                obj[:, 3] = 1.0
            feat = statear.derive_features(spec, np.asarray(t["qpos"], np.float32),
                                           np.asarray(obj, np.float32),
                                           action=t.get("action", "sit"))
            rows.append(np.asarray(feat["head_vels"], np.float32))
    return np.concatenate(rows, 0)


def synth_flow(rng, vels):
    """(B, 6) head velocities -> (B, H, W, 2) egomotion flow with random
    smooth inverse depth + pixel noise."""
    B = vels.shape[0]
    x = np.linspace(-0.6, 0.6, W)[None, None, :]
    y = np.linspace(-0.45, 0.45, H)[None, :, None]
    x = np.broadcast_to(x, (B, H, W))
    y = np.broadcast_to(y, (B, H, W))
    # random smooth inverse-depth field in [1/8, 1/1.5]
    base = rng.uniform(0.125, 0.66, (B, 1, 1))
    bumps = np.zeros((B, H, W))
    for _ in range(3):
        fx, fy = rng.uniform(0.5, 3.0, (2, B, 1, 1))
        ph = rng.uniform(0, 2 * np.pi, (2, B, 1, 1))
        bumps += np.sin(2 * np.pi * fx * x + ph[0]) * np.sin(2 * np.pi * fy * y + ph[1])
    rho = np.clip(base * (1 + 0.25 * bumps), 0.05, 1.0)
    v, w = vels[:, :3], vels[:, 3:]
    vx, vy, vz = v[:, 0, None, None], v[:, 1, None, None], v[:, 2, None, None]
    wx, wy, wz = w[:, 0, None, None], w[:, 1, None, None], w[:, 2, None, None]
    ux = rho * (-vx + x * vz) + (x * y * wx - (1 + x**2) * wy + y * wz)
    uy = rho * (-vy + y * vz) + ((1 + y**2) * wx - x * y * wy - x * wz)
    flow = np.stack([ux, uy], -1).astype(np.float32)
    flow += rng.normal(0, 0.01, flow.shape).astype(np.float32)
    return flow


def main():
    from kinpoly_tpu.models.aux_nets import ResNet18

    print(f"backend={jax.default_backend()}", flush=True)
    vel_pool = head_vel_bank()
    print(f"head-velocity pool {vel_pool.shape}", flush=True)
    scale = np.abs(vel_pool).mean(0) + 1e-3

    net = ResNet18(out_dim=512)
    head = lambda p, f: f @ p["w"] + p["b"]   # linear egomotion readout
    rngk = jax.random.PRNGKey(0)
    params = net.init(rngk, jnp.zeros((1, H, W, 2)))
    head_p = dict(w=jnp.zeros((512, 6)), b=jnp.zeros(6))
    opt = optax.adam(3e-4)
    state = opt.init((params, head_p))

    @jax.jit
    def step(ps, st, flow, target):
        def loss_fn(ps):
            params, head_p = ps
            feat = net.apply(params, flow)
            pred = head(head_p, feat)
            return jnp.mean((pred - target) ** 2)

        l, g = jax.value_and_grad(loss_fn)(ps)
        up, st = opt.update(g, st)
        return optax.apply_updates(ps, up), st, l

    rng = np.random.RandomState(0)
    ps = (params, head_p)
    t0 = time.time()
    for i in range(STEPS):
        vels = vel_pool[rng.randint(0, len(vel_pool), BATCH)]
        vels = vels + rng.normal(0, 0.05, vels.shape).astype(np.float32)
        flow = synth_flow(rng, vels)
        ps, state, l = step(ps, state, jnp.asarray(flow),
                            jnp.asarray(vels / scale, jnp.float32))
        if i % 50 == 0:
            print(f"step {i}: loss {float(l):.4f}  ({time.time()-t0:.0f}s)",
                  flush=True)
        if i and i % 50 == 0:
            # checkpoint every 50 steps: a timeout kill keeps the latest
            # usable weights (the r3 first run lost 450 steps to this)
            with open(OUT, "wb") as f:
                pickle.dump(dict(params=jax.device_get(ps[0]),
                                 head=jax.device_get(ps[1]),
                                 scale=scale, r2=None, steps=i), f)

    # holdout check: R^2 of the egomotion readout on fresh samples
    vels = vel_pool[rng.randint(0, len(vel_pool), 256)]
    flow = synth_flow(rng, vels)
    feat = net.apply(ps[0], jnp.asarray(flow))
    pred = np.asarray(head(ps[1], feat)) * scale
    ss_res = ((pred - vels) ** 2).sum()
    ss_tot = ((vels - vels.mean(0)) ** 2).sum()
    r2 = 1 - ss_res / ss_tot
    print(f"holdout R^2 = {r2:.3f}", flush=True)

    with open(OUT, "wb") as f:
        pickle.dump(dict(params=jax.device_get(ps[0]),
                         head=jax.device_get(ps[1]),
                         scale=scale, r2=float(r2), steps=STEPS), f)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
