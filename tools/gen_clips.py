"""Generate a diverse multi-clip qpos bank for UHC training (VERDICT r2
item 3: the reference trains over AMASS; no mocap ships with either repo, so
this synthesizes >=20 kinematically plausible clips from the standing pose —
procedural but diverse in joint groups, amplitudes, frequencies, root
motion, and heading).

Writes a pickle {take_name: {"qpos": (T, 76) float32}} compatible with
scripts/train_uhc.py --data.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import joblib
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data_bank/clips24.pkl"
FPS = 30
T = 150  # 5 s per clip

from kinpoly_tpu.anim.mjcf import parse_humanoid

spec = parse_humanoid(
    "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
base = np.asarray(standing["qpos"], np.float64)

names = list(spec.body_names)
H = {n: 7 + 3 * (i - 1) for i, n in enumerate(names) if i > 0}  # first hinge idx


def hinge(n, axis):
    return H[n] + axis


ARMS = [hinge(n, a) for n in ("L_Shoulder", "R_Shoulder", "L_Elbow", "R_Elbow")
        for a in range(3)]
LEGS = [hinge(n, a) for n in ("L_Hip", "R_Hip", "L_Knee", "R_Knee")
        for a in range(3)]
SPINE = [hinge(n, a) for n in ("Torso", "Spine", "Chest") for a in range(3)]
HEAD = [hinge(n, a) for n in ("Neck", "Head") for a in range(3)]
ANKLES = [hinge(n, a) for n in ("L_Ankle", "R_Ankle") for a in range(3)]

rng = np.random.RandomState(7)
t = np.arange(T) / FPS
clips = {}


def smooth_noise(T, dims, scale, rng, octaves=3):
    x = np.zeros((T, dims))
    for o in range(octaves):
        k = 2 ** o
        phase = rng.uniform(0, 2 * np.pi, dims)
        freq = rng.uniform(0.2, 0.6, dims) * k
        amp = scale / k
        x += amp * np.sin(2 * np.pi * freq[None, :] * t[:, None] + phase[None, :])
    return x


def envelope(T, ramp=15):
    e = np.ones(T)
    e[:ramp] = np.linspace(0, 1, ramp)
    e[-ramp:] = np.linspace(1, 0, ramp)
    return e


def make_clip(groups_scales, heading_rate=0.0, sway=0.0, squat=0.0, seed=0):
    r = np.random.RandomState(seed)
    q = np.repeat(base[None], T, axis=0)
    env = envelope(T)[:, None]
    for idx, scale in groups_scales:
        q[:, idx] += smooth_noise(T, len(idx), scale, r) * env
    if squat > 0:
        ph = r.uniform(0, 2 * np.pi)
        s = squat * 0.5 * (1 - np.cos(2 * np.pi * 0.4 * t + ph)) * env[:, 0]
        for n, w in (("L_Hip", -1.0), ("R_Hip", -1.0), ("L_Knee", 1.6),
                     ("R_Knee", 1.6), ("L_Ankle", -0.6), ("R_Ankle", -0.6)):
            q[:, hinge(n, 2 if "Hip" in n or "Knee" in n else 2)] += w * s
        q[:, 2] -= 0.25 * s
    if sway > 0:
        q[:, 0] += sway * np.sin(2 * np.pi * 0.3 * t) * env[:, 0]
        q[:, 1] += sway * np.sin(2 * np.pi * 0.23 * t + 1.3) * env[:, 0]
    if heading_rate != 0.0:
        # rotate the root quat about z at heading_rate rad/s
        ang = heading_rate * t * env[:, 0]
        dq = np.stack([np.cos(ang / 2), 0 * ang, 0 * ang, np.sin(ang / 2)], -1)
        w0, x0, y0, z0 = q[:, 3], q[:, 4], q[:, 5], q[:, 6]
        w1, x1, y1, z1 = dq[:, 0], dq[:, 1], dq[:, 2], dq[:, 3]
        q[:, 3] = w1 * w0 - x1 * x0 - y1 * y0 - z1 * z0
        q[:, 4] = w1 * x0 + x1 * w0 + y1 * z0 - z1 * y0
        q[:, 5] = w1 * y0 - x1 * z0 + y1 * w0 + z1 * x0
        q[:, 6] = w1 * z0 + x1 * y0 - y1 * x0 + z1 * w0
    # clamp to joint ranges with margin
    lo = spec.jnt_range[:, 0] + 0.05
    hi = spec.jnt_range[:, 1] - 0.05
    q[:, 7:] = np.clip(q[:, 7:], lo, hi)
    n = np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    q[:, 3:7] /= n
    return q.astype(np.float32)


i = 0
for arm_s in (0.15, 0.35):
    for spine_s in (0.0, 0.12):
        for leg_s in (0.0, 0.08):
            for hr in (0.0, 0.25):
                clips[f"proc-{i:02d}"] = dict(qpos=make_clip(
                    [(ARMS, arm_s), (SPINE, spine_s), (LEGS, leg_s),
                     (HEAD, 0.08)],
                    heading_rate=hr, sway=0.02 + 0.02 * (i % 3), seed=100 + i))
                i += 1
# squat family + big-arm family
for k in range(4):
    clips[f"proc-{i:02d}"] = dict(qpos=make_clip(
        [(ARMS, 0.2), (HEAD, 0.05)], squat=0.25 + 0.1 * k, sway=0.02,
        seed=200 + k))
    i += 1
for k in range(4):
    clips[f"proc-{i:02d}"] = dict(qpos=make_clip(
        [(ARMS, 0.5), (SPINE, 0.18), (HEAD, 0.1)], sway=0.03,
        heading_rate=0.15 * (k - 1.5), seed=300 + k))
    i += 1

os.makedirs(os.path.dirname(OUT), exist_ok=True)
joblib.dump(clips, OUT)
print(f"wrote {len(clips)} clips x {T} frames to {OUT}")
