"""Synthesize action-labeled interaction takes (sit / push / avoid / step)
for the kinematic-policy stack (VERDICT r2 items 3/9: the repo owned no
action-labeled clips, so the paper's per-action success metric had never
executed).

Each take = a keyframe-interpolated qpos trajectory performing the action
around the `_all_step.xml` scene objects (chair / box+table / Can / step),
plus the active object's pose sequence and the action label — the raw-bank
format `statear.load_annotations` derives full StateAR features from.

Geometry (humanoid_smpl_neutral_mesh_all_step.xml:190-215):
- chair: seat top at body_z + 0.02, rests on floor at body_z = 0.38
- box:   half (0.15, 0.19, 0.12) at -0.1 -> top body_z+0.02, bottom -0.22
- table: top at body_z - 0.09, legs to -0.79 -> rests at body_z = 0.79
- Can:   r 0.279, half-h 0.345 at -0.345 -> rests at body_z = 0.69
- step:  half (0.4, 0.4, 0.17) at -0.20 -> top body_z - 0.03, rests at 0.37

The standing humanoid faces +y (ankle->toe vector).

Writes:
  data_bank/action_takes.pkl  {name: {qpos, obj_pose, action}}  (AR data)
  (UHC can train on the same file: train_uhc reads the qpos key)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import joblib
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data_bank/action_takes.pkl"
FPS = 30

from kinpoly_tpu.anim.mjcf import parse_humanoid

spec = parse_humanoid(
    "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all_step.xml")
standing = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
base = np.asarray(standing["qpos"], np.float64)
names = list(spec.body_names)
H = {n: 7 + 3 * (i - 1) for i, n in enumerate(names) if i > 0}

# rest heights of the free objects (see module docstring)
CHAIR_Z, BOX_TABLE_Z, TABLE_Z, CAN_Z, STEP_Z = 0.38, 0.92, 0.79, 0.69, 0.37
STEP_TOP = STEP_Z - 0.03


def j(n, a):
    return H[n] + a


def mirror(mods):
    """Left<->right swap of a joint-angle dict (z/y hinges flip sign)."""
    out = {}
    for (n, a), v in mods.items():
        if n.startswith("L_"):
            m = "R_" + n[2:]
        elif n.startswith("R_"):
            m = "L_" + n[2:]
        else:
            m = n
        s = -1.0 if (m != n and a in (0, 1)) else 1.0
        out[(m, a)] = s * v
    return out


# pose dicts, calibrated by FK probing (hinge slots per body: 0=z, 1=y, 2=x;
# hip/knee flexion = slot 2; shoulder forward-raise = slot 1, mirrored)
SIT_LEGS = {("L_Hip", 2): -1.5, ("R_Hip", 2): -1.5,
            ("L_Knee", 2): 1.2, ("R_Knee", 2): 1.2,
            ("L_Ankle", 2): 0.25, ("R_Ankle", 2): 0.25,
            ("Torso", 2): 0.12, ("Spine", 2): 0.10}
REACH_ARMS = {("L_Shoulder", 1): -0.95, ("R_Shoulder", 1): 0.95,
              ("L_Elbow", 1): -0.25, ("R_Elbow", 1): 0.25}
LIFT_L = {("L_Hip", 2): -1.05, ("L_Knee", 2): 1.35, ("L_Ankle", 2): -0.25}
LIFT_R = mirror(LIFT_L)


def smoothstep(x):
    x = np.clip(x, 0.0, 1.0)
    return x * x * (3 - 2 * x)


class KeyframeClip:
    """Piecewise-smoothstep interpolation between sparse keyframes of
    (root xyz offset, heading angle, joint-angle dict)."""

    def __init__(self, duration):
        self.T = int(round(duration * FPS))
        self.keys = []  # (t_sec, dxyz, heading, mods)

    def key(self, t, dxyz=(0, 0, 0), heading=0.0, mods=None):
        self.keys.append((t, np.asarray(dxyz, np.float64), heading, mods or {}))
        return self

    def build(self, arm_noise=0.0, seed=0):
        r = np.random.RandomState(seed)
        t = np.arange(self.T) / FPS
        ks = sorted(self.keys)
        # dense tracks
        all_slots = sorted({j(n, a) for _, _, _, m in ks for (n, a) in m})
        root = np.zeros((self.T, 3))
        head = np.zeros(self.T)
        ang = np.zeros((self.T, len(all_slots)))
        slot_of = {s: i for i, s in enumerate(all_slots)}
        kv = np.zeros((len(ks), len(all_slots)))
        for ki, (_, _, _, mods) in enumerate(ks):
            for (n, a), v in mods.items():
                kv[ki, slot_of[j(n, a)]] = v
        kt = np.asarray([k[0] for k in ks])
        kroot = np.stack([k[1] for k in ks])
        khead = np.asarray([k[2] for k in ks])
        for i in range(self.T):
            ti = t[i]
            seg = np.searchsorted(kt, ti, side="right") - 1
            seg = np.clip(seg, 0, len(ks) - 2)
            a, b = seg, seg + 1
            u = smoothstep((ti - kt[a]) / max(kt[b] - kt[a], 1e-9))
            root[i] = kroot[a] * (1 - u) + kroot[b] * u
            head[i] = khead[a] * (1 - u) + khead[b] * u
            ang[i] = kv[a] * (1 - u) + kv[b] * u

        q = np.repeat(base[None], self.T, axis=0)
        q[:, :3] += root
        for s, i in slot_of.items():
            q[:, s] += ang[:, i]
        if arm_noise > 0:
            arms = [j(n, a) for n in ("L_Shoulder", "R_Shoulder") for a in range(3)]
            ph = r.uniform(0, 2 * np.pi, len(arms))
            fr = r.uniform(0.2, 0.5, len(arms))
            q[:, arms] += arm_noise * np.sin(
                2 * np.pi * fr[None] * t[:, None] + ph[None])
        # heading rotation about z applied to root quat and root xy about the
        # first-frame pivot
        w0, x0, y0, z0 = q[:, 3].copy(), q[:, 4].copy(), q[:, 5].copy(), q[:, 6].copy()
        c, s_ = np.cos(head / 2), np.sin(head / 2)
        q[:, 3] = c * w0 - s_ * z0
        q[:, 4] = c * x0 - s_ * y0
        q[:, 5] = c * y0 + s_ * x0
        q[:, 6] = c * z0 + s_ * w0
        lo = spec.jnt_range[:, 0] + 0.03
        hi = spec.jnt_range[:, 1] - 0.03
        q[:, 7:] = np.clip(q[:, 7:], lo, hi)
        q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
        return q.astype(np.float32)


def fix_floor(q, clearance=0.001):
    """Raise root z per frame so no foot vertex sinks below the floor
    (keyframe interpolation can dip feet during transitions)."""
    import jax.numpy as jnp

    from kinpoly_tpu.physics import contact as ct, fk as fklib
    verts, vbody = ct.select_contact_vertices(spec, default_k=4)
    feet = [names.index(n) for n in ("L_Toe", "R_Toe", "L_Ankle", "R_Ankle")]
    sel = np.isin(vbody, feet)
    from kinpoly_tpu.core import tmath
    res = fklib.fk(spec, jnp.asarray(q))
    bq = res.xquat[:, vbody[sel], :]
    bp = res.xpos[:, vbody[sel], :]
    world = np.asarray(bp + tmath.quat_rot_vec(bq, jnp.asarray(verts[sel], q.dtype)))
    low = world[..., 2].min(axis=1)
    lift = np.maximum(0.0, clearance - low)
    # smooth the lift so qvel stays continuous
    k = np.hanning(9); k /= k.sum()
    lift = np.convolve(np.pad(lift, 4, mode="edge"), k, mode="valid")
    q = q.copy()
    q[:, 2] += lift.astype(q.dtype)
    return q


def static_obj(xy, z, T, yaw=0.0):
    o = np.zeros((T, 7), np.float32)
    o[:, 0], o[:, 1], o[:, 2] = xy[0], xy[1], z
    o[:, 3], o[:, 6] = np.cos(yaw / 2), np.sin(yaw / 2)
    return o


# ---------------------------------------------------------------------------
# sit: stand -> lower onto the chair (behind the pelvis) -> hold -> stand
# ---------------------------------------------------------------------------


def make_sit(seed, depth=0.0, hold=1.6, sit_z=None):
    # stand slightly ahead of the chair, then sit down-and-back so the
    # thighs/pelvis land on the seat (top at z 0.40; seated thigh verts
    # reach z ~0.36-0.41 at drop 0.32)
    r = np.random.RandomState(seed)
    sit_drop = 0.32 + (sit_z or 0.0)
    ahead = 0.35                        # standing clearance from the seat
    back = ahead - 0.03 + depth         # sit back over the seat
    half_legs = {k: 0.45 * v for k, v in SIT_LEGS.items()}
    c = KeyframeClip(5.0)
    c.key(0.0, dxyz=(0, ahead, 0))
    c.key(0.8 + r.uniform(-0.1, 0.1), dxyz=(0, ahead, 0))
    # crouch mostly in place first, then slide back onto the seat, so the
    # calves never sweep through the seat front
    c.key(1.4, dxyz=(0, ahead - 0.3 * back, -0.55 * sit_drop), mods=half_legs)
    c.key(2.0, dxyz=(0, ahead - back, -sit_drop), mods=SIT_LEGS)
    c.key(2.0 + hold, dxyz=(0, ahead - back, -sit_drop), mods=SIT_LEGS)
    # stand up: rise nearly straight up off the seat, then step forward
    c.key(2.7 + hold, dxyz=(0, ahead - 0.3 * back, -0.5 * sit_drop), mods=half_legs)
    c.key(3.6 + hold, dxyz=(0, ahead, 0))
    c.key(5.0, dxyz=(0, ahead, 0))
    q = fix_floor(c.build(arm_noise=0.04, seed=seed))
    # seat centered under the seated hip/pelvis contact verts
    chair = static_obj((base[0] + r.uniform(-0.03, 0.03),
                        base[1] + ahead - back - 0.05), CHAIR_Z, c.T)
    return q, chair, "sit"


# ---------------------------------------------------------------------------
# push: reach to the box on the table and push it 0.35 m across the tabletop
# ---------------------------------------------------------------------------


def make_push(seed, push_dist=0.35):
    r = np.random.RandomState(seed)
    c = KeyframeClip(5.0)
    lean = {("Torso", 2): -0.22, ("Spine", 2): -0.12}
    c.key(0.0)
    c.key(1.0, mods=REACH_ARMS)
    c.key(1.6, dxyz=(0, 0.10, 0), mods={**REACH_ARMS, **lean})
    c.key(3.2, dxyz=(0, 0.28, 0), mods={**REACH_ARMS, **lean})
    c.key(4.0, dxyz=(0, 0.05, 0))
    c.key(5.0)
    q = c.build(arm_noise=0.02, seed=seed)
    T = c.T
    # table front edge ~0.45 m ahead of the start pelvis; box starts at the
    # near edge of the tabletop and slides +y with the push
    tx = base[0] + r.uniform(-0.02, 0.02)
    box = static_obj((tx, base[1] + 0.67), BOX_TABLE_Z, T)
    t = np.arange(T) / FPS
    u = smoothstep((t - 1.6) / (3.2 - 1.6))
    box[:, 1] += (push_dist * u).astype(np.float32)
    return q, box, "push", static_obj((tx, base[1] + 0.67 + 0.45), TABLE_Z, T)


# ---------------------------------------------------------------------------
# avoid: walk forward, curving around the Can standing in the path
# ---------------------------------------------------------------------------


def make_walk(seed, dist=2.4, detour=0.0, can_at=None, duration=5.0):
    r = np.random.RandomState(seed)
    T = int(round(duration * FPS))
    t = np.arange(T) / FPS
    # root path: constant-ish forward speed with a lateral gaussian detour
    u = smoothstep(t / duration * 1.12)          # ease in, keep moving
    y = dist * (t / duration)
    y[:15] *= np.linspace(0, 1, 15)              # gentle start
    x = np.zeros(T)
    if detour != 0.0:
        x = detour * np.exp(-0.5 * ((y - (can_at or dist / 2)) / 0.55) ** 2)
    dx = np.gradient(x, 1 / FPS)
    dy = np.gradient(y, 1 / FPS)
    heading = np.arctan2(-dx, np.maximum(dy, 1e-3)) * 0.8

    q = np.repeat(base[None], T, axis=0)
    q[:, 0] += x
    q[:, 1] += y
    # gait: antiphase hip swing, knee flexion on swing, arm counter-swing
    f = 1.55 + r.uniform(-0.1, 0.1)              # stride Hz
    ph = 2 * np.pi * f * t
    amp = 0.42 * np.clip(dy / max(dy.max(), 1e-6), 0, 1)
    swing_l, swing_r = np.sin(ph), np.sin(ph + np.pi)
    q[:, j("L_Hip", 2)] += -amp * swing_l
    q[:, j("R_Hip", 2)] += -amp * swing_r
    q[:, j("L_Knee", 2)] += amp * 0.9 * np.clip(np.sin(ph + 0.8), 0, 1)
    q[:, j("R_Knee", 2)] += amp * 0.9 * np.clip(np.sin(ph + np.pi + 0.8), 0, 1)
    q[:, j("L_Ankle", 2)] += -0.12 * amp * swing_l
    q[:, j("R_Ankle", 2)] += -0.12 * amp * swing_r
    q[:, j("L_Shoulder", 1)] += 0.25 * amp * swing_r   # counter-swing
    q[:, j("R_Shoulder", 1)] += -0.25 * amp * swing_l
    q[:, 2] += 0.02 * np.sin(2 * ph)
    # heading about z
    w0, x0, y0, z0 = q[:, 3].copy(), q[:, 4].copy(), q[:, 5].copy(), q[:, 6].copy()
    c_, s_ = np.cos(heading / 2), np.sin(heading / 2)
    q[:, 3] = c_ * w0 - s_ * z0
    q[:, 4] = c_ * x0 - s_ * y0
    q[:, 5] = c_ * y0 + s_ * x0
    q[:, 6] = c_ * z0 + s_ * w0
    lo = spec.jnt_range[:, 0] + 0.03
    hi = spec.jnt_range[:, 1] - 0.03
    q[:, 7:] = np.clip(q[:, 7:], lo, hi)
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    return q.astype(np.float32), T


def make_avoid(seed, side=1.0, can_y_base=1.25, detour=0.62):
    r = np.random.RandomState(seed)
    can_y = can_y_base + r.uniform(-0.1, 0.1)
    q, T = make_walk(seed, dist=2.4, detour=detour * side, can_at=can_y)
    q = fix_floor(q)
    can = static_obj((base[0], base[1] + can_y), CAN_Z, T)
    return q, can, "avoid"


# ---------------------------------------------------------------------------
# step: step up onto the box ahead, stand on it, hold
# ---------------------------------------------------------------------------


def make_step(seed, lead_left=True, fwd_base=0.62):
    # box front face 0.33 m ahead of the start toes; the lead foot plants on
    # the box top while the trail leg is still on the floor, then the trail
    # leg swings up bent (clearing the box front) as the root rises
    r = np.random.RandomState(seed)
    fwd = fwd_base + r.uniform(-0.03, 0.03)
    L = "L" if lead_left else "R"
    T_ = "R" if lead_left else "L"
    lead_up = {(f"{L}_Hip", 2): -1.3, (f"{L}_Knee", 2): 2.05}  # heel tucked
    lead_plant = {(f"{L}_Hip", 2): -1.3, (f"{L}_Knee", 2): 1.3,
                  (f"{T_}_Ankle", 2): 0.35}            # trail heel raises
    push_off = {(f"{L}_Hip", 2): -0.95, (f"{L}_Knee", 2): 0.85,
                (f"{T_}_Hip", 2): -0.55, (f"{T_}_Knee", 2): 1.45,
                (f"{T_}_Ankle", 2): 0.35}              # trail tucks up fast
    mid = {(f"{L}_Hip", 2): -0.45, (f"{L}_Knee", 2): 0.45,
           (f"{T_}_Hip", 2): -1.15, (f"{T_}_Knee", 2): 1.9}
    c = KeyframeClip(5.0)
    c.key(0.0)
    c.key(0.8)
    c.key(1.3, dxyz=(0, 0.06, 0.03), mods=lead_up)          # lead foot up
    knee_fwd = {(f"{L}_Hip", 2): -1.45, (f"{L}_Knee", 2): 1.85,
                (f"{T_}_Ankle", 2): 0.2}
    c.key(1.6, dxyz=(0, 0.10, 0.08), mods=knee_fwd)         # knee over the box
    c.key(1.9, dxyz=(0, 0.13, 0.14), mods=lead_plant)       # foot on box top
    c.key(2.3, dxyz=(0, 0.24, STEP_TOP * 0.6), mods=push_off)
    c.key(2.7, dxyz=(0, 0.46, STEP_TOP * 1.02), mods=mid)   # trail swings bent
    c.key(3.2, dxyz=(0, fwd, STEP_TOP))                     # stand on box
    c.key(5.0, dxyz=(0, fwd, STEP_TOP))
    q = c.build(arm_noise=0.04, seed=seed)
    box = static_obj((base[0], base[1] + fwd + 0.12), STEP_Z, c.T)
    return q, box, "step"


# ---------------------------------------------------------------------------


def main():
    # seed offset + per-action count from argv: gen_action_clips.py OUT
    # [n_per_action] [seed_offset] (a held-out test bank uses a disjoint
    # offset, e.g. 100)
    n_per = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    off = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    takes = {}
    for k in range(n_per):
        q, obj, act = make_sit(seed=10 + off + k, depth=0.02 * (k % 3),
                               hold=1.2 + 0.3 * (k % 2))
        takes[f"sit-{off + k:02d}"] = dict(qpos=q, obj_pose=obj, action=act)
    for k in range(n_per):
        out = make_push(seed=20 + off + k, push_dist=0.30 + 0.04 * (k % 3))
        q, obj, act = out[0], out[1], out[2]
        takes[f"push-{off + k:02d}"] = dict(qpos=q, obj_pose=obj, action=act,
                                            table_pose=out[3])
    for k in range(n_per):
        q, obj, act = make_avoid(seed=30 + off + k,
                                 side=1.0 if k % 2 == 0 else -1.0)
        takes[f"avoid-{off + k:02d}"] = dict(qpos=q, obj_pose=obj, action=act)
    for k in range(n_per):
        q, obj, act = make_step(seed=40 + off + k, lead_left=(k % 2 == 0))
        takes[f"step-{off + k:02d}"] = dict(qpos=q, obj_pose=obj, action=act)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    joblib.dump(takes, OUT)
    print(f"wrote {len(takes)} action takes to {OUT}")


if __name__ == "__main__":
    main()
