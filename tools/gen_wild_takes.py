"""Round-5 wild bank (VERDICT r4 #6): >=3 takes per action with generator
parameters DISJOINT from the training bank — not just a seed offset.

What differs from the training generator settings (gen_action_clips.main):

  action | training bank                | this wild bank
  -------|------------------------------|---------------------------------
  sit    | depth 0-0.04, hold 1.2/1.5   | depth 0.06-0.10, hold 2.0-2.8
  push   | push_dist 0.30-0.38          | push_dist 0.45-0.55
  avoid  | can at y 1.25+-0.1, detour .62 | can at y 1.05/1.45+-0.1, detour .5/.75
  step   | box front at fwd 0.62+-0.03  | fwd 0.52 / 0.72 +- 0.03
  all    | 150 frames (5 s)             | time-stretched x0.8 / x1.0 / x1.25
  all    | seeds 10-45 (+offset 200 r4) | seeds 500+
  camera | clean render                 | per-frame position+orientation
         |                              | jitter (render_ego_video --cam-noise)

Writes data_bank/wild_takes_r5.pkl (12 takes); the egocentric video + flow
feature chain is applied separately:
  python tools/render_ego_video.py data_bank/wild_takes_r5.pkl \
      data_bank/wild_takes_r5_of.pkl --cam-noise 0.01
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import joblib
import numpy as np

import gen_action_clips as g

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data_bank/wild_takes_r5.pkl"


def _renorm_quat(x, sl):
    x[:, sl] /= np.linalg.norm(x[:, sl], axis=1, keepdims=True)
    return x


def time_stretch(arr, factor, quat_slice=None):
    """Linear-resample a (T, D) track to round(T*factor) frames. Root quats
    in these banks are heading-only rotations, so lerp+renormalize is exact
    enough (max interpolation angle per frame << 1 rad)."""
    T = arr.shape[0]
    T2 = int(round(T * factor))
    src = np.linspace(0.0, T - 1, T2)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, T - 1)
    u = (src - i0)[:, None]
    out = arr[i0] * (1 - u) + arr[i1] * u
    if quat_slice is not None:
        out = _renorm_quat(out, quat_slice)
    return out.astype(np.float32)


def stretch_take(take, factor):
    out = dict(take)
    out["qpos"] = time_stretch(take["qpos"], factor, quat_slice=slice(3, 7))
    out["obj_pose"] = time_stretch(take["obj_pose"], factor,
                                   quat_slice=slice(3, 7))
    if "table_pose" in take:
        out["table_pose"] = time_stretch(take["table_pose"], factor,
                                         quat_slice=slice(3, 7))
    return out


def main():
    takes = {}
    stretches = [0.8, 1.0, 1.25]

    for k in range(3):
        q, obj, act = g.make_sit(seed=500 + k, depth=0.06 + 0.02 * k,
                                 hold=2.0 + 0.4 * k)
        takes[f"wild-sit-{k:02d}"] = stretch_take(
            dict(qpos=q, obj_pose=obj, action=act), stretches[k])
    for k in range(3):
        out = g.make_push(seed=520 + k, push_dist=0.45 + 0.05 * k)
        takes[f"wild-push-{k:02d}"] = stretch_take(
            dict(qpos=out[0], obj_pose=out[1], action=out[2],
                 table_pose=out[3]), stretches[k])
    for k in range(3):
        q, obj, act = g.make_avoid(seed=530 + k,
                                   side=1.0 if k % 2 == 0 else -1.0,
                                   can_y_base=1.05 if k == 0 else 1.45,
                                   detour=0.5 if k == 0 else 0.75)
        takes[f"wild-avoid-{k:02d}"] = stretch_take(
            dict(qpos=q, obj_pose=obj, action=act), stretches[k])
    for k in range(3):
        q, obj, act = g.make_step(seed=540 + k, lead_left=(k % 2 == 0),
                                  fwd_base=0.52 if k == 0 else 0.72)
        takes[f"wild-step-{k:02d}"] = stretch_take(
            dict(qpos=q, obj_pose=obj, action=act), stretches[k])

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    joblib.dump(takes, OUT)
    lens = {n: t["qpos"].shape[0] for n, t in takes.items()}
    print(f"wrote {len(takes)} wild takes to {OUT}; lengths {lens}")


if __name__ == "__main__":
    main()
