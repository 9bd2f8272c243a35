"""AMASS preprocessing pipeline — TPU-native equivalent of
``uhc/data_process/{process_amass_raw,amass_to_qpos,process_smpl_data}.py``.

Raw AMASS npz sequences (axis-angle SMPL poses + trans at mocap framerate)
-> 30 Hz qpos clips with feet-height fixing and optional left/right flip
augmentation. Everything runs through the framework's own SMPL<->qpos
conversion and FK — no simulator replay needed.
"""

from __future__ import annotations

import glob
import os

import jax
import numpy as np

from kinpoly_tpu.anim import smpl as smpllib
from kinpoly_tpu.core import tmath
from kinpoly_tpu.physics import fk as fklib

# SMPL joint mirror map (process_smpl_data.py:26)
LEFT_RIGHT_IDX = [0, 2, 1, 3, 5, 4, 6, 8, 7, 9, 11, 10, 12, 14, 13, 15, 17,
                  16, 19, 18, 21, 20, 23, 22]


def load_amass_npz(path: str) -> dict | None:
    """One AMASS npz -> {poses (T, 72), trans (T, 3), framerate, betas}."""
    with np.load(path, allow_pickle=True) as z:
        if "poses" not in z:
            return None
        poses = z["poses"][:, :72].astype(np.float64)  # body joints only
        return dict(
            poses=poses,
            trans=z["trans"].astype(np.float64),
            framerate=float(z.get("mocap_framerate", z.get("mocap_frame_rate", 30.0))),
            betas=np.asarray(z.get("betas", np.zeros(10)))[:10],
        )


def flip_smpl(pose_aa: np.ndarray) -> np.ndarray:
    """Left/right mirror of an axis-angle SMPL pose sequence
    (process_smpl_data.flip_smpl)."""
    p = pose_aa.reshape(-1, 24, 3)[:, LEFT_RIGHT_IDX].copy()
    # mirror each axis-angle about the x-z plane: negate y and z components...
    # equivalently negate the rotation components that flip chirality
    p[..., 1] *= -1
    p[..., 2] *= -1
    return p.reshape(pose_aa.shape[0], 72)


def fix_height(spec, qpos: np.ndarray, gnd_thresh: float = -0.15,
               feet_offset: float = -0.015,
               begin_feet_thresh: float = 50.0) -> np.ndarray | None:
    """Ground the clip: shift z so the initial feet rest on the floor
    (process_smpl_data.fix_height:52-71). Returns None for rejects."""
    res = fklib.fk(spec, qpos[:1])
    toe_l, toe_r = spec.body_index("L_Toe"), spec.body_index("R_Toe")
    begin_feet = float(min(res.xpos[0, toe_l, 2], res.xpos[0, toe_r, 2]))
    if begin_feet > begin_feet_thresh:
        return None
    begin_feet += feet_offset
    out = qpos.copy()
    out[:, 2] -= begin_feet
    res_all = fklib.fk(spec, out)
    if float(res_all.xpos[..., 2].min()) < gnd_thresh:
        return None
    return out


def amass_to_takes(spec, amass_db: dict, target_fps: float = 30.0,
                   min_len: int = 10, fix_feet: bool = True,
                   flip_augment: bool = False) -> dict:
    """{name: {poses, trans, framerate}} -> {name: {qpos, pose_aa, trans}}."""
    takes = {}
    for name, v in amass_db.items():
        poses, trans, fr = v["poses"], v["trans"], v.get("framerate", 30.0)
        if poses.shape[0] < min_len:
            continue
        skip = max(int(round(fr / target_fps)), 1)
        variants = [(name, poses[::skip], trans[::skip])]
        if flip_augment:
            flipped = flip_smpl(poses[::skip])
            ftrans = trans[::skip].copy()
            ftrans[:, 0] *= -1
            variants.append((name + "_flip", flipped, ftrans))
        for vn, p, t in variants:
            qpos = np.asarray(smpllib.smpl_to_qpose(spec, p, t))
            if fix_feet:
                qpos = fix_height(spec, qpos)
                if qpos is None:
                    continue
            takes[vn] = dict(qpos=qpos, pose_aa=np.asarray(p),
                             trans=np.asarray(t), seq_name=vn)
    return takes


def process_amass_dir(spec, amass_root: str, out_path: str | None = None,
                      **kw) -> dict:
    """Walk an AMASS directory tree of npz files (process_amass_raw.py)."""
    db = {}
    for path in sorted(glob.glob(os.path.join(amass_root, "**", "*.npz"),
                                 recursive=True)):
        entry = load_amass_npz(path)
        if entry is not None:
            key = os.path.splitext(os.path.relpath(path, amass_root))[0].replace("/", "_")
            db[key] = entry
    takes = amass_to_takes(spec, db, **kw)
    if out_path:
        import joblib

        joblib.dump(takes, out_path)
    return takes


def gen_standing_take(spec, standing_qpos: np.ndarray, n_frames: int = 120) -> dict:
    """Synthesise a standing clip (gen_standing.py equivalent)."""
    return dict(qpos=np.repeat(standing_qpos[None], n_frames, 0),
                seq_name="standing")
