"""Get-up curriculum clips (round-4 VERDICT #2): the UHC tracks the r3
getup clips to only 27.3% — it fails at the very first supine->sit-up
transition. This bank decomposes the skill into stages and adds slower /
staged variants so adaptive sampling has a gradient to climb:

  situp-*        supine -> floor-sit -> lie back (the failing transition,
                 isolated, both directions)
  kneel-*        stand -> kneel -> stand (the top half of a get-up)
  getup-slow-*   8 s supine -> sit -> tuck -> kneel-lunge -> stand, with a
                 kneeling intermediate (physically easier than the original
                 5 s tuck-under)
  prone-*        prone -> quadruped -> kneel -> stand

Raw qpos bank {name: {"qpos": (T, 76)}}, mergeable with clips60
(tools/merge_banks.py). Same keyframe system as tools/gen_hard_clips.py.

Root pitch track about world x with the +y-facing humanoid:
+pi/2 = supine (face-up), -pi/2 = prone (face-down). ROUND-5 FIX: the old
note had these REVERSED, so every "supine" getup clip was authored
face-down and its sit-up mechanics (hip/torso flexion) drove the legs up
to 0.77 m below the floor; fix_floor's root lift then levitated the whole
reference body — the untrackable flying GT behind the getup family's
19-35% coverage.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import joblib
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data_bank/getup10.pkl"
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


def keyframes(duration, keys, seed=0, arm_noise=0.03):
    """keys: (t, dxyz, heading, pitch, mods). Same engine as gen_hard_clips."""
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
    rot = quat_mul(axis_quat([0, 0, 1], head), axis_quat([1, 0, 0], pitch))
    q[:, 3:7] = quat_mul(rot, q[:, 3:7])
    lo, hi = spec.jnt_range[:, 0] + 0.03, spec.jnt_range[:, 1] - 0.03
    q[:, 7:] = np.clip(q[:, 7:], lo, hi)
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    return q.astype(np.float32)


def snap_floor(q, clearance=0.005):
    """Two-sided per-frame root-z snap: the lowest contact vertex sits AT
    the floor (round-5 fix; the old one-sided lift let authored poses
    FLOAT — the prone QUAD hovered 14 cm with no support and the sim body
    slumped off the reference). Ground-skill clips always have intended
    support, so snapping down is as correct as lifting up."""
    import jax.numpy as jnp

    from kinpoly_tpu.core import tmath
    from kinpoly_tpu.physics import contact as ct, fk as fklib
    verts, vbody = ct.select_contact_vertices(spec, default_k=4)
    res = fklib.fk(spec, jnp.asarray(q))
    bq = res.xquat[:, vbody, :]
    bp = res.xpos[:, vbody, :]
    world = np.asarray(bp + tmath.quat_rot_vec(bq, jnp.asarray(verts, q.dtype)))
    low = world[..., 2].min(axis=1)
    lift = clearance - low
    k = np.hanning(9); k /= k.sum()
    lift = np.convolve(np.pad(lift, 4, mode="edge"), k, mode="valid")
    q = q.copy()
    q[:, 2] += lift.astype(q.dtype)
    return q


Z = (0, 0, 0)

# pose dictionaries ---------------------------------------------------------
# floor sit: legs forward, knees slightly bent, torso upright (after sit-up
# the torso chain counter-rotates the -pi/4 residual pitch)
FLOORSIT = {("L_Hip", 2): -1.35, ("R_Hip", 2): -1.35,
            ("L_Knee", 2): 0.45, ("R_Knee", 2): 0.45,
            ("Torso", 2): -0.30, ("Spine", 2): -0.22, ("Chest", 2): -0.15,
            ("L_Shoulder", 1): -0.6, ("R_Shoulder", 1): 0.6}
SITUP_HALF = {("L_Hip", 2): -0.7, ("R_Hip", 2): -0.7,
              ("L_Knee", 2): 0.5, ("R_Knee", 2): 0.5,
              ("Torso", 2): -0.4, ("Spine", 2): -0.3, ("Chest", 2): -0.2}
# kneel: thighs vertical (hips ~0), shins folded flat behind (knees max),
# toes pointed; pelvis sits on the heels
KNEEL = {("L_Knee", 2): 2.2, ("R_Knee", 2): 2.2,
         ("L_Ankle", 2): 0.7, ("R_Ankle", 2): 0.7,
         ("L_Shoulder", 1): -0.3, ("R_Shoulder", 1): 0.3}
# kneel-lunge: left foot planted ahead, right knee down
def lunge(L="L", T_="R"):
    return {(f"{L}_Hip", 2): -1.75, (f"{L}_Knee", 2): 1.75,
            (f"{L}_Ankle", 2): -0.3,
            (f"{T_}_Knee", 2): 2.1, (f"{T_}_Ankle", 2): 0.7,
            ("Torso", 2): -0.2, ("Spine", 2): -0.1}
LUNGE = lunge()
CROUCH = {("L_Hip", 2): -1.15, ("R_Hip", 2): -1.15,
          ("L_Knee", 2): 1.85, ("R_Knee", 2): 1.85,
          ("L_Ankle", 2): -0.55, ("R_Ankle", 2): -0.55,
          ("Torso", 2): -0.35, ("Spine", 2): -0.2,
          ("L_Shoulder", 1): -0.5, ("R_Shoulder", 1): 0.5}
TUCK = {("L_Hip", 2): -1.9, ("R_Hip", 2): -1.9,
        ("L_Knee", 2): 2.2, ("R_Knee", 2): 2.2,
        ("Torso", 2): -0.5, ("Spine", 2): -0.3}
SITUP = {("L_Hip", 2): -0.9, ("R_Hip", 2): -0.9, ("Torso", 2): -0.5,
         ("Spine", 2): -0.35, ("Chest", 2): -0.25}
# quadruped (hands + knees), reached from prone: torso pitched forward,
# thighs vertical, arms reaching down-forward to the floor
QUAD = {("L_Hip", 2): -1.5, ("R_Hip", 2): -1.5,
        ("L_Knee", 2): 1.9, ("R_Knee", 2): 1.9,
        ("L_Shoulder", 1): -1.5, ("R_Shoulder", 1): 1.5,
        ("L_Elbow", 1): -0.2, ("R_Elbow", 1): 0.2}

clips = {}

# hook-lying: knees drawn up so the feet stay planted next to the pelvis —
# the pose a real sit-up passes through. Round-5 fix: the old straight-leg
# sit-up path swept the extended legs ~0.77 m BELOW the floor as the root
# pitched up, and fix_floor then levitated the whole reference body; with
# hooks the legs stay floor-consistent through every interpolated pitch.
HOOK = {("L_Hip", 2): -1.05, ("R_Hip", 2): -1.05,
        ("L_Knee", 2): 1.9, ("R_Knee", 2): 1.9,
        ("L_Ankle", 2): -0.5, ("R_Ankle", 2): -0.5}
HOOK_SIT = dict(HOOK)
HOOK_SIT.update({("Torso", 2): -0.35, ("Spine", 2): -0.25,
                 ("Chest", 2): -0.18,
                 ("L_Shoulder", 1): -0.5, ("R_Shoulder", 1): 0.5})

# situp: supine -> hook knees -> sit up over the planted feet -> extend to
# floor sit -> hold -> reverse (both directions of the failing transition)
for k, (up, hold) in enumerate(((1.0, 1.0), (1.3, 0.8), (0.8, 1.2))):
    keys = [
        (0.0, (0, 0, -0.80), 0, np.pi / 2, {}),
        (0.9, (0, 0, -0.80), 0, np.pi / 2, {}),
        (1.15, (0, 0, -0.79), 0, np.pi / 2, HOOK),           # draw feet up
        (0.9 + up * 0.7, (0, 0.03, -0.74), 0, np.pi / 5, HOOK_SIT),
        (0.9 + up, (0, 0.05, -0.76), 0, np.pi / 12, FLOORSIT),
        (0.9 + up + hold, (0, 0.05, -0.76), 0, np.pi / 12, FLOORSIT),
        (0.9 + up + hold + 0.5, (0, 0.03, -0.74), 0, np.pi / 5, HOOK_SIT),
        (0.9 + up + hold + 0.9, (0, 0, -0.79), 0, np.pi / 2, HOOK),
        (5.0, (0, 0, -0.80), 0, np.pi / 2, {}),
    ]
    clips[f"situp-{k:02d}"] = dict(qpos=keyframes(5.0, keys, seed=600 + k))

# kneel <-> stand cycles (the top half of a get-up, both directions)
for k in range(2):
    d = 0.02 * k
    keys = [
        (0.0, Z, 0, 0, {}),
        (0.8, Z, 0, 0, {}),
        (1.5, (0, 0.02, -0.35 - d), 0, 0, CROUCH),
        (2.2, (0, 0.05, -0.62), 0, 0.15, KNEEL),      # knees down
        (3.0, (0, 0.05, -0.62), 0, 0.15, KNEEL),
        (3.6, (0, 0.07, -0.45), 0, 0.1, LUNGE),       # lead foot plants
        (4.3, (0, 0.1, -0.05), 0, 0, {}),
        (5.0, (0, 0.1, 0), 0, 0, {}),
    ]
    clips[f"kneel-{k:02d}"] = dict(qpos=keyframes(5.0, keys, seed=620 + k))

# slow get-up with kneeling intermediate: supine -> sit -> tuck -> kneel ->
# lunge -> stand over 8 s (the r3 5 s tuck-under getup stays in the bank as
# the hard target)
for k, pause in enumerate((0.0, 0.3, 0.6)):
    keys = [
        (0.0, (0, 0, -0.80), 0, np.pi / 2, {}),
        (1.0, (0, 0, -0.80), 0, np.pi / 2, {}),
        (1.4, (0, 0, -0.79), 0, np.pi / 2, HOOK),           # hook knees
        (2.2, (0, 0.04, -0.74), 0, np.pi / 6, HOOK_SIT),    # sit up on hooks
        (2.9 + pause, (0, 0.06, -0.74), 0, 0.0, TUCK),      # tuck legs under
        (3.8 + pause, (0, 0.08, -0.62), 0, 0.15, KNEEL),    # kneel tall
        (4.8 + pause, (0, 0.08, -0.62), 0, 0.15, KNEEL),
        (5.6 + pause, (0, 0.10, -0.45), 0, 0.1, LUNGE),     # lunge
        (6.6 + pause, (0, 0.14, -0.05), 0, 0, {}),          # rise
        (8.0, (0, 0.14, 0), 0, 0, {}),
    ]
    clips[f"getup-slow-{k:02d}"] = dict(qpos=keyframes(8.0, keys, seed=640 + k))

# prone get-up: face down -> quadruped -> kneel -> stand
for k in range(2):
    keys = [
        (0.0, (0, 0, -0.82), 0, -np.pi / 2, {}),            # prone
        (1.0, (0, 0, -0.82), 0, -np.pi / 2, {}),
        (2.0, (0, -0.04, -0.60), 0, -np.pi / 2.6, QUAD),    # push to all-fours
        (2.8, (0, -0.04, -0.62), 0, 0.25, KNEEL),           # rock back to kneel
        (3.6, (0, -0.04, -0.62), 0, 0.15, KNEEL),
        (4.3, (0, 0.0, -0.45), 0, 0.1, LUNGE),
        (5.2, (0, 0.04, -0.05), 0, 0, {}),
        (6.0, (0, 0.04, 0), 0, 0, {}),
    ]
    clips[f"prone-{k:02d}"] = dict(qpos=keyframes(6.0, keys, seed=660 + k))

from kinpoly_tpu.data import ground_fix

for nm in clips:
    q = clips[nm]["qpos"]
    # round-5 feasibility fix: interpolated leg/arm chains dove up to 0.77 m
    # below the floor (sit/kneel phases), and fix_floor's root lift then
    # LEVITATED the whole reference body ~0.7 m — untrackable flying motion
    # (the getup-family 27% coverage root cause). Ground the chains first so
    # fix_floor only absorbs millimetres.
    lift_before = ground_fix.max_root_lift(spec, q)
    q, _ = ground_fix.ground_legs(spec, q)
    q, _ = ground_fix.ground_arms(spec, q)
    lift_after = ground_fix.max_root_lift(spec, q)
    clips[nm]["qpos"] = snap_floor(q)
    print(f"{nm}: fix_floor lift {lift_before:.3f} -> {lift_after:.3f} m")
    # kneel/tuck/lunge phases legitimately need 0.3-0.4 m of root lift (the
    # knees/toes are the support and the keys are authored low — snap_floor
    # settles them ON the floor); the failure mode this guards is the
    # 0.6-0.8 m LYING-POSE levitation. The true acceptance check is the
    # UHC tracking eval on the regenerated bank.
    if lift_after > 0.5:
        print(f"  WARNING: {nm} residual lift {lift_after:.2f} m — "
              f"likely still authored through the floor")

os.makedirs(os.path.dirname(OUT), exist_ok=True)
joblib.dump(clips, OUT)
print(f"wrote {len(clips)} getup-curriculum clips to {OUT}")
