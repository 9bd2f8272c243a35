"""Default UHC hyperparameters.

Numeric tables mirror the reference training configuration
(``/root/reference/config/uhc/uhc.yml``) — these are the published
hyperparameters of the method (per-joint stable-PD gains, torque limits,
reward weights), i.e. data, and the behavioural contract for the controller.
"""

from __future__ import annotations

import numpy as np

from kinpoly_tpu.physics.engine import ControlParams

# ["group", k_p, k_d, a_ref, a_scale, torque_limit] per 3-hinge body,
# (uhc.yml:86-156; identical for the z/y/x hinges of each body)
_BODY_PD = {
    "L_Hip": (500.0, 50.0, 200.0),
    "L_Knee": (500.0, 50.0, 150.0),
    "L_Ankle": (400.0, 40.0, 100.0),
    "L_Toe": (200.0, 20.0, 100.0),
    "R_Hip": (500.0, 50.0, 200.0),
    "R_Knee": (500.0, 50.0, 150.0),
    "R_Ankle": (400.0, 40.0, 100.0),
    "R_Toe": (200.0, 20.0, 100.0),
    "Torso": (1000.0, 100.0, 200.0),
    "Spine": (1000.0, 100.0, 200.0),
    "Chest": (1000.0, 100.0, 200.0),
    "Neck": (100.0, 10.0, 50.0),
    "Head": (100.0, 10.0, 50.0),
    "L_Thorax": (400.0, 40.0, 100.0),
    "L_Shoulder": (400.0, 40.0, 100.0),
    "L_Elbow": (300.0, 30.0, 60.0),
    "L_Wrist": (100.0, 10.0, 50.0),
    "L_Hand": (100.0, 10.0, 50.0),
    "R_Thorax": (400.0, 40.0, 100.0),
    "R_Shoulder": (400.0, 40.0, 100.0),
    "R_Elbow": (300.0, 30.0, 60.0),
    "R_Wrist": (100.0, 10.0, 50.0),
    "R_Hand": (100.0, 10.0, 50.0),
}

# per-body weights for the imitation body-difference distance (uhc.yml:158-182)
BODY_DIFF_WEIGHTS = {
    "L_Toe": 0.0, "R_Toe": 0.0, "L_Hand": 0.0, "R_Hand": 0.0,
}

# world_rfc_implicit reward weights (uhc.yml:37-48)
UHC_REWARD_WEIGHTS = dict(
    w_p=0.3, w_v=0.1, w_e=0.45, w_c=0.1, w_vf=0.05,
    k_p=2.0, k_v=0.005, k_e=5.0, k_c=100.0, k_vf=1.0,
)

BASE_ROT = np.array([0.7071, 0.7071, 0.0, 0.0])   # data_specs.base_rot


def uhc_control_params(spec, rfc_scale: float = 100.0, meta_pd: bool = False,
                       rfc_mode: str = "implicit", rfc_lim: float = float("inf"),
                       vf_bodies: str | tuple = "all",
                       residual_force_torque: bool = True) -> ControlParams:
    """Build ControlParams from the reference PD table. Explicit RFC
    (residual_force_mode: explicit, humanoid_im.py:76-82) resolves
    vf_bodies='all' to every body (SMPL_BONE_NAMES order = spec order)."""
    jkp, jkd, tl = [], [], []
    for name in spec.body_names[1:]:
        kp, kd, lim = _BODY_PD[name]
        jkp += [kp] * 3
        jkd += [kd] * 3
        tl += [lim] * 3
    n = len(jkp)
    if rfc_mode == "explicit":
        if vf_bodies == "all":
            vf_idx = tuple(range(len(spec.body_names)))
        else:
            vf_idx = tuple(spec.body_index(b) for b in vf_bodies)
    else:
        vf_idx = ()
    return ControlParams(
        jkp=np.asarray(jkp),
        jkd=np.asarray(jkd),
        a_ref=np.zeros(n),
        a_scale=np.ones(n),
        torque_lim=np.asarray(tl),
        rfc_scale=rfc_scale,
        rfc_lim=rfc_lim,
        action_v=1,
        meta_pd=meta_pd,
        rfc_mode=rfc_mode,
        vf_bodies=vf_idx,
        residual_force_torque=residual_force_torque,
    )


def body_diff_weights(spec) -> np.ndarray:
    """(24,) per-body weight for calc_body_diff (Pelvis weight 1, jpos_diffw
    semantics of humanoid_im.py:28)."""
    w = np.ones(len(spec.body_names))
    for i, n in enumerate(spec.body_names):
        w[i] = BODY_DIFF_WEIGHTS.get(n, 1.0)
    w[0] = 1.0
    return w


def b_diff_weights_pose(spec) -> np.ndarray:
    """(23,) non-root body weights used on pose_diff[1:] in the UHC reward
    (reward_function.py:32, cfg.b_diffw)."""
    return body_diff_weights(spec)[1:]
