"""Hard clip families for the UHC curriculum (VERDICT r2 weak #8 / r3 #9):
jumps, deep crouch-to-stand, fast turns, get-up-from-ground. Written as a
raw qpos bank {name: {"qpos": (T, 76)}} mergeable with clips24 + action
takes (tools/merge_banks.py).

Same keyframe approach as gen_action_clips, plus a root-pitch track for the
lying poses.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import joblib
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data_bank/hard12.pkl"
FPS = 30

from kinpoly_tpu.anim.mjcf import parse_humanoid

spec = parse_humanoid(
    "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml")
standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
base = np.asarray(standing["qpos"], np.float64)
names = list(spec.body_names)
H = {n: 7 + 3 * (i - 1) for i, n in enumerate(names) if i > 0}


def j(n, a):
    return H[n] + a


def smoothstep(x):
    x = np.clip(x, 0.0, 1.0)
    return x * x * (3 - 2 * x)


def quat_mul(a, b):
    w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], -1)


def axis_quat(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    ang = np.asarray(ang)
    return np.concatenate([np.cos(ang / 2)[..., None],
                           np.sin(ang / 2)[..., None] * axis[None, :]], -1)


CROUCH = {("L_Hip", 2): -1.15, ("R_Hip", 2): -1.15,
          ("L_Knee", 2): 1.85, ("R_Knee", 2): 1.85,
          ("L_Ankle", 2): -0.55, ("R_Ankle", 2): -0.55,
          ("Torso", 2): -0.35, ("Spine", 2): -0.2,
          ("L_Shoulder", 1): -0.5, ("R_Shoulder", 1): 0.5}
TUCK = {("L_Hip", 2): -1.9, ("R_Hip", 2): -1.9,
        ("L_Knee", 2): 2.2, ("R_Knee", 2): 2.2,
        ("Torso", 2): -0.5, ("Spine", 2): -0.3}
ARMS_UP = {("L_Shoulder", 1): -2.2, ("R_Shoulder", 1): 2.2}


def keyframes(duration, keys, seed=0, arm_noise=0.03):
    """keys: (t, dxyz, heading, pitch, mods). Linear-in-smoothstep tracks."""
    r = np.random.RandomState(seed)
    T = int(round(duration * FPS))
    t = np.arange(T) / FPS
    ks = sorted(keys)
    all_slots = sorted({j(n, a) for k in ks for (n, a) in k[4]})
    slot_of = {s: i for i, s in enumerate(all_slots)}
    kv = np.zeros((len(ks), len(all_slots)))
    for ki, k in enumerate(ks):
        for (n, a), v in k[4].items():
            kv[ki, slot_of[j(n, a)]] = v
    kt = np.asarray([k[0] for k in ks])
    kroot = np.stack([np.asarray(k[1], np.float64) for k in ks])
    khead = np.asarray([k[2] for k in ks])
    kpitch = np.asarray([k[3] for k in ks])
    root = np.zeros((T, 3))
    head = np.zeros(T)
    pitch = np.zeros(T)
    ang = np.zeros((T, len(all_slots)))
    for i in range(T):
        seg = np.clip(np.searchsorted(kt, t[i], side="right") - 1, 0, len(ks) - 2)
        a, b = seg, seg + 1
        u = smoothstep((t[i] - kt[a]) / max(kt[b] - kt[a], 1e-9))
        root[i] = kroot[a] * (1 - u) + kroot[b] * u
        head[i] = khead[a] * (1 - u) + khead[b] * u
        pitch[i] = kpitch[a] * (1 - u) + kpitch[b] * u
        ang[i] = kv[a] * (1 - u) + kv[b] * u

    q = np.repeat(base[None], T, axis=0)
    q[:, :3] += root
    for s, i in slot_of.items():
        q[:, s] += ang[:, i]
    if arm_noise > 0:
        arms = [j(n, a) for n in ("L_Shoulder", "R_Shoulder") for a in range(3)]
        ph = r.uniform(0, 2 * np.pi, len(arms))
        fr = r.uniform(0.2, 0.5, len(arms))
        q[:, arms] += arm_noise * np.sin(2 * np.pi * fr[None] * t[:, None] + ph[None])
    # world-frame pitch about x (lying back), then heading about z
    rot = quat_mul(axis_quat([0, 0, 1], head), axis_quat([1, 0, 0], pitch))
    q[:, 3:7] = quat_mul(rot, q[:, 3:7])
    lo, hi = spec.jnt_range[:, 0] + 0.03, spec.jnt_range[:, 1] - 0.03
    q[:, 7:] = np.clip(q[:, 7:], lo, hi)
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    return q.astype(np.float32)


Z = (0, 0, 0)
clips = {}

# jumps: crouch -> ballistic rise -> land crouch -> stand
for k, h in enumerate((0.18, 0.28, 0.38)):
    t_air = 2 * np.sqrt(2 * h / 9.81)
    keys = [
        (0.0, Z, 0, 0, {}),
        (0.7, Z, 0, 0, {}),
        (1.2, (0, 0, -0.32), 0, 0, CROUCH),
        (1.45, (0, 0.05, 0.02), 0, 0, ARMS_UP),           # extension
        (1.45 + t_air / 2, (0, 0.1, h), 0, 0,
         {**{kk: v * 0.5 for kk, v in TUCK.items()}, **ARMS_UP}),  # apex
        (1.45 + t_air, (0, 0.2, 0.0), 0, 0, {}),
        (1.75 + t_air, (0, 0.22, -0.25), 0, 0, CROUCH),   # land absorb
        (2.8 + t_air, (0, 0.22, 0), 0, 0, {}),
        (5.0, (0, 0.22, 0), 0, 0, {}),
    ]
    clips[f"jump-{k:02d}"] = dict(qpos=keyframes(5.0, keys, seed=500 + k))

# deep crouch-to-stand cycles
for k in range(3):
    d = 0.34 + 0.05 * k
    keys = [
        (0.0, Z, 0, 0, {}),
        (0.8, (0, 0, -d), 0, 0, CROUCH),
        (1.6, Z, 0, 0, {}),
        (2.4, (0, 0, -d), 0, 0, CROUCH),
        (3.2, Z, 0, 0, {}),
        (4.0, (0, 0, -d), 0, 0, CROUCH),
        (5.0, Z, 0, 0, {}),
    ]
    clips[f"crouch-{k:02d}"] = dict(qpos=keyframes(5.0, keys, seed=520 + k))

# fast turns: 180 / 360 / alternating heading sweeps with small steps
for k, (amt, dur) in enumerate(((np.pi, 1.2), (2 * np.pi, 2.0), (-np.pi, 1.0))):
    keys = [
        (0.0, Z, 0, 0, {}),
        (0.8, Z, 0, 0, {}),
        (0.8 + dur, Z, amt, 0, {}),
        (2.4 + dur, Z, amt, 0, {}),
        (2.9 + dur, Z, amt * 0.5, 0, {}),
        (5.0, Z, amt * 0.5, 0, {}),
    ]
    clips[f"turn-{k:02d}"] = dict(qpos=keyframes(5.0, keys, seed=540 + k))

# get up from supine: lying on back -> hook knees -> sit-up -> tuck ->
# crouch -> stand. pitch +pi/2 rolls the (+y-facing) body onto its back
# (round-5 fix: the sign was reversed — the old "supine" was face-DOWN).
# Round-5 fix: the sit-up passes through hook-lying (knees drawn up, feet
# planted) — the old straight-leg path swept the legs ~0.7 m below the
# floor as the root pitched up and fix_floor levitated the reference body
# (the 27%-coverage root cause; see tools/gen_getup_clips.py).
SITUP = {("L_Hip", 2): -1.05, ("R_Hip", 2): -1.05,
         ("L_Knee", 2): 1.9, ("R_Knee", 2): 1.9,
         ("L_Ankle", 2): -0.5, ("R_Ankle", 2): -0.5,
         ("Torso", 2): -0.5, ("Spine", 2): -0.35, ("Chest", 2): -0.25}
HOOK_LIE = {k: v for k, v in SITUP.items() if k[0] not in
            ("Torso", "Spine", "Chest")}
for k in range(3):
    keys = [
        (0.0, (0, 0, -0.78), 0, np.pi / 2, {}),           # supine
        (0.9, (0, 0, -0.78), 0, np.pi / 2, {}),
        (1.25, (0, 0, -0.77), 0, np.pi / 2, HOOK_LIE),    # hook knees
        (1.7, (0, 0.05, -0.72), 0, np.pi / 4, SITUP),     # sit up on hooks
        (2.5, (0, 0.1, -0.52), 0, 0.0, TUCK),             # tuck under
        (3.3, (0, 0.1, -0.3), 0, 0, CROUCH),              # crouch
        (4.2, (0, 0.1, 0), 0, 0, {}),                     # stand
        (5.0, (0, 0.1, 0), 0, 0, {}),
    ]
    clips[f"getup-{k:02d}"] = dict(qpos=keyframes(5.0, keys, seed=560 + k))

def fix_floor(q, clearance=0.01):
    """Per-frame root-z lift so no contact vertex is below the floor
    (keyframe poses are authored coarsely; this grounds every frame)."""
    import jax.numpy as jnp

    from kinpoly_tpu.core import tmath
    from kinpoly_tpu.physics import contact as ct, fk as fklib
    verts, vbody = ct.select_contact_vertices(spec, default_k=4)
    res = fklib.fk(spec, jnp.asarray(q))
    bq = res.xquat[:, vbody, :]
    bp = res.xpos[:, vbody, :]
    world = np.asarray(bp + tmath.quat_rot_vec(bq, jnp.asarray(verts, q.dtype)))
    low = world[..., 2].min(axis=1)
    lift = np.maximum(0.0, clearance - low)
    k = np.hanning(9); k /= k.sum()
    lift = np.convolve(np.pad(lift, 4, mode="edge"), k, mode="valid")
    q = q.copy()
    q[:, 2] += lift.astype(q.dtype)
    return q


from kinpoly_tpu.data import ground_fix

for nm in clips:
    q = clips[nm]["qpos"]
    # round-5 feasibility fix (see tools/gen_getup_clips.py): ground the
    # leg/arm chains so fix_floor cannot levitate the reference body
    lift_before = ground_fix.max_root_lift(spec, q)
    q, _ = ground_fix.ground_legs(spec, q)
    q, _ = ground_fix.ground_arms(spec, q)
    lift_after = ground_fix.max_root_lift(spec, q)
    clips[nm]["qpos"] = fix_floor(q)
    print(f"{nm}: fix_floor lift {lift_before:.3f} -> {lift_after:.3f} m")

os.makedirs(os.path.dirname(OUT), exist_ok=True)
joblib.dump(clips, OUT)
print(f"wrote {len(clips)} hard clips to {OUT}")
