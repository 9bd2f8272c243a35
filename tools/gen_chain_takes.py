"""Chained multi-action takes (round-4 VERDICT #9): the reference's takes
are continuous sequences — walk to the object, interact, walk away — with
ONE action label per take (kin_poly/data_loaders/statear_smpl_dataset.py
meta action_type). Every repo take so far is a single isolated action; this
tool composes walk->interact->walk chains on one continuous timeline.

Authoring = the gen_action_clips KeyframeClip root/joint tracks plus a gait
overlay: sinusoidal leg swing gated to explicit walk windows, so locomotion
and keyframed interaction stay C1-continuous by construction (no segment
stitching).

  python tools/gen_chain_takes.py [OUT] [n_per_action] [seed_offset]

Writes {name: {qpos, obj_pose, action[, table_pose]}} — same raw-bank format
as gen_action_clips (statear.load_annotations derives features; train_uhc
reads the qpos key).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import joblib
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data_bank/chain_takes.pkl"

from tools.gen_action_clips import (CHAIR_Z, BOX_TABLE_Z, TABLE_Z, CAN_Z,
                                    STEP_Z, STEP_TOP, FPS, KeyframeClip,
                                    SIT_LEGS, REACH_ARMS, base, fix_floor, j,
                                    smoothstep, static_obj)

LEAN = {("Torso", 2): -0.22, ("Spine", 2): -0.12}
HALF_SIT = {k: 0.45 * v for k, v in SIT_LEGS.items()}


def add_gait(q, windows, seed=0, freq=1.55, amp0=0.42):
    """Overlay a walking gait inside the given (t0, t1) second windows:
    antiphase hip swing, swing-leg knee flexion, arm counter-swing, root
    bob — the same tracks as gen_action_clips.make_walk, amplitude ramped
    smoothly over 0.3 s at the window edges."""
    r = np.random.RandomState(seed)
    T = q.shape[0]
    t = np.arange(T) / FPS
    f = freq + r.uniform(-0.08, 0.08)
    amp = np.zeros(T)
    for (t0, t1) in windows:
        amp += (smoothstep((t - t0) / 0.3) * smoothstep((t1 - t) / 0.3))
    amp = np.clip(amp, 0, 1) * amp0
    ph = 2 * np.pi * f * t
    swing_l, swing_r = np.sin(ph), np.sin(ph + np.pi)
    q[:, j("L_Hip", 2)] += -amp * swing_l
    q[:, j("R_Hip", 2)] += -amp * swing_r
    q[:, j("L_Knee", 2)] += amp * 0.9 * np.clip(np.sin(ph + 0.8), 0, 1)
    q[:, j("R_Knee", 2)] += amp * 0.9 * np.clip(np.sin(ph + np.pi + 0.8), 0, 1)
    q[:, j("L_Ankle", 2)] += -0.12 * amp * swing_l
    q[:, j("R_Ankle", 2)] += -0.12 * amp * swing_r
    q[:, j("L_Shoulder", 1)] += 0.25 * amp * swing_r
    q[:, j("R_Shoulder", 1)] += -0.25 * amp * swing_l
    q[:, 2] += 0.02 * amp / max(amp0, 1e-6) * np.sin(2 * ph)
    lo = None  # ranges re-clipped below
    from tools.gen_action_clips import spec
    lo = spec.jnt_range[:, 0] + 0.03
    hi = spec.jnt_range[:, 1] - 0.03
    q[:, 7:] = np.clip(q[:, 7:], lo, hi)
    return q


# ---------------------------------------------------------------------------
# chains — all authored in world coordinates, humanoid starts at `base`
# facing +y
# ---------------------------------------------------------------------------


def chain_sit(seed):
    """walk +y 1.5 m -> turn 180 -> sit on the chair behind -> stand ->
    walk back 0.8 m. Label: sit."""
    r = np.random.RandomState(seed)
    walk = 1.5 + r.uniform(-0.1, 0.1)
    sit_drop = 0.32
    back = 0.30                      # slide back over the seat while turning
    c = KeyframeClip(10.0)
    c.key(0.0)
    c.key(0.6)                                            # stand
    c.key(2.4, dxyz=(0, walk, 0))                         # walk up
    c.key(3.4, dxyz=(0, walk + 0.05, 0), heading=np.pi)   # turn in place
    c.key(4.2, dxyz=(0, walk + 0.4 * back, -0.55 * sit_drop),
          heading=np.pi, mods=HALF_SIT)
    c.key(4.9, dxyz=(0, walk + back, -sit_drop), heading=np.pi, mods=SIT_LEGS)
    c.key(6.3, dxyz=(0, walk + back, -sit_drop), heading=np.pi, mods=SIT_LEGS)
    c.key(7.0, dxyz=(0, walk + 0.4 * back, -0.5 * sit_drop),
          heading=np.pi, mods=HALF_SIT)
    c.key(7.7, dxyz=(0, walk + 0.05, 0), heading=np.pi)   # stand
    c.key(9.4, dxyz=(0, walk - 0.8, 0), heading=np.pi)    # walk away (-y)
    c.key(10.0, dxyz=(0, walk - 0.8, 0), heading=np.pi)
    q = c.build(arm_noise=0.04, seed=seed)
    q = add_gait(q, [(0.6, 2.4), (7.7, 9.4)], seed=seed)
    q = fix_floor(q)
    chair = static_obj((base[0] + r.uniform(-0.03, 0.03),
                        base[1] + walk + back + 0.05), CHAIR_Z, c.T)
    return dict(qpos=q, obj_pose=chair, action="sit")


def chain_push(seed):
    """walk +y 1.2 m -> reach and push the box 0.35 m across the table ->
    step back. Label: push."""
    r = np.random.RandomState(seed)
    walk = 1.2 + r.uniform(-0.08, 0.08)
    push = 0.33 + r.uniform(0, 0.04)
    c = KeyframeClip(9.0)
    c.key(0.0)
    c.key(0.6)
    c.key(2.2, dxyz=(0, walk, 0))                          # walk up
    c.key(3.0, dxyz=(0, walk, 0), mods=REACH_ARMS)         # raise arms
    c.key(3.6, dxyz=(0, walk + 0.10, 0), mods={**REACH_ARMS, **LEAN})
    c.key(5.2, dxyz=(0, walk + 0.28, 0), mods={**REACH_ARMS, **LEAN})  # push
    c.key(6.0, dxyz=(0, walk + 0.05, 0))                   # release
    c.key(7.6, dxyz=(0, walk - 0.5, 0))                    # back up (-y)
    c.key(9.0, dxyz=(0, walk - 0.5, 0))
    q = c.build(arm_noise=0.02, seed=seed)
    q = add_gait(q, [(0.6, 2.2), (6.0, 7.6)], seed=seed, amp0=0.36)
    q = fix_floor(q)
    T = c.T
    tx = base[0] + r.uniform(-0.02, 0.02)
    box = static_obj((tx, base[1] + walk + 0.67), BOX_TABLE_Z, T)
    t = np.arange(T) / FPS
    u = smoothstep((t - 3.6) / (5.2 - 3.6))
    box[:, 1] += (push * u).astype(np.float32)
    table = static_obj((tx, base[1] + walk + 0.67 + 0.45), TABLE_Z, T)
    return dict(qpos=q, obj_pose=box, table_pose=table, action="push")


def chain_avoid(seed, side=1.0):
    """long walk: curve around the Can at ~1.8 m, continue to 3.2 m, stop,
    quarter-turn, short walk. Label: avoid."""
    r = np.random.RandomState(seed)
    can_y = 1.8 + r.uniform(-0.1, 0.1)
    dist = 3.2
    c = KeyframeClip(10.0)
    dur_walk = 4.6
    # root path sampled onto keyframes every 0.4 s so the gaussian detour
    # survives the smoothstep interpolation
    for tt in np.arange(0.0, dur_walk + 1e-6, 0.4):
        y = dist * tt / dur_walk
        x = side * 0.62 * np.exp(-0.5 * ((y - can_y) / 0.55) ** 2)
        dx = -(y - can_y) / 0.55**2 * x * (dist / dur_walk)
        c.key(0.6 + tt, dxyz=(x, y, 0), heading=np.arctan2(-dx, 1.0) * 0.8)
    c.key(0.0)
    c.key(5.8, dxyz=(0, dist, 0), heading=0)
    c.key(6.6, dxyz=(0, dist, 0), heading=side * np.pi / 2)   # quarter turn
    c.key(8.6, dxyz=(-side * 0.8, dist, 0), heading=side * np.pi / 2)
    c.key(10.0, dxyz=(-side * 0.8, dist, 0), heading=side * np.pi / 2)
    q = c.build(arm_noise=0.03, seed=seed)
    q = add_gait(q, [(0.6, 5.2), (6.6, 8.6)], seed=seed)
    q = fix_floor(q)
    can = static_obj((base[0], base[1] + can_y), CAN_Z, c.T)
    return dict(qpos=q, obj_pose=can, action="avoid")


def chain_step(seed, lead_left=True):
    """walk +y 0.8 m -> step up onto the box -> stand on it -> step down the
    far side -> walk on. Label: step."""
    r = np.random.RandomState(seed)
    walk = 0.8 + r.uniform(-0.05, 0.05)
    fwd = 0.62
    L = "L" if lead_left else "R"
    T_ = "R" if lead_left else "L"
    lead_up = {(f"{L}_Hip", 2): -1.3, (f"{L}_Knee", 2): 2.05}
    knee_fwd = {(f"{L}_Hip", 2): -1.45, (f"{L}_Knee", 2): 1.85,
                (f"{T_}_Ankle", 2): 0.2}
    lead_plant = {(f"{L}_Hip", 2): -1.3, (f"{L}_Knee", 2): 1.3,
                  (f"{T_}_Ankle", 2): 0.35}
    push_off = {(f"{L}_Hip", 2): -0.95, (f"{L}_Knee", 2): 0.85,
                (f"{T_}_Hip", 2): -0.55, (f"{T_}_Knee", 2): 1.45,
                (f"{T_}_Ankle", 2): 0.35}
    mid = {(f"{L}_Hip", 2): -0.45, (f"{L}_Knee", 2): 0.45,
           (f"{T_}_Hip", 2): -1.15, (f"{T_}_Knee", 2): 1.9}
    # step-down mirrors: trail leg reaches down ahead
    down_reach = {(f"{T_}_Hip", 2): -0.9, (f"{T_}_Knee", 2): 0.6,
                  (f"{L}_Knee", 2): 0.8, (f"{L}_Ankle", 2): 0.45}
    c = KeyframeClip(10.0)
    y0 = walk
    c.key(0.0)
    c.key(0.6)
    c.key(2.0, dxyz=(0, y0, 0))                                  # walk up
    c.key(2.5, dxyz=(0, y0 + 0.06, 0.03), mods=lead_up)
    c.key(2.8, dxyz=(0, y0 + 0.10, 0.08), mods=knee_fwd)
    c.key(3.1, dxyz=(0, y0 + 0.13, 0.14), mods=lead_plant)
    c.key(3.5, dxyz=(0, y0 + 0.24, STEP_TOP * 0.6), mods=push_off)
    c.key(3.9, dxyz=(0, y0 + 0.46, STEP_TOP * 1.02), mods=mid)
    c.key(4.4, dxyz=(0, y0 + fwd, STEP_TOP))                     # on the box
    c.key(5.6, dxyz=(0, y0 + fwd, STEP_TOP))                     # hold
    # step down the far side (box half-depth 0.4; far edge ~ y0+fwd+0.28)
    c.key(6.1, dxyz=(0, y0 + fwd + 0.22, STEP_TOP * 0.95), mods=down_reach)
    c.key(6.6, dxyz=(0, y0 + fwd + 0.45, STEP_TOP * 0.35), mods=down_reach)
    c.key(7.1, dxyz=(0, y0 + fwd + 0.62, 0))                     # on floor
    c.key(8.8, dxyz=(0, y0 + fwd + 1.3, 0))                      # walk on
    c.key(10.0, dxyz=(0, y0 + fwd + 1.3, 0))
    q = c.build(arm_noise=0.04, seed=seed)
    q = add_gait(q, [(0.6, 2.0), (7.1, 8.8)], seed=seed)
    q = fix_floor(q)
    box = static_obj((base[0], base[1] + y0 + fwd + 0.12), STEP_Z, c.T)
    return dict(qpos=q, obj_pose=box, action="step")


def main():
    n_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    off = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    takes = {}
    for k in range(n_per):
        takes[f"chain-sit-{off + k:02d}"] = chain_sit(seed=700 + off + k)
        takes[f"chain-push-{off + k:02d}"] = chain_push(seed=720 + off + k)
        takes[f"chain-avoid-{off + k:02d}"] = chain_avoid(
            seed=740 + off + k, side=1.0 if k % 2 == 0 else -1.0)
        takes[f"chain-step-{off + k:02d}"] = chain_step(
            seed=760 + off + k, lead_left=(k % 2 == 0))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    joblib.dump(takes, OUT)
    print(f"wrote {len(takes)} chained takes to {OUT}")


if __name__ == "__main__":
    main()
