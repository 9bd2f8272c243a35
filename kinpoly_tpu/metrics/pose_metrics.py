"""The paper's evaluation metric suite — port of
``scripts/eval_pose_all.py`` + ``kin_poly/utils/metrics.py``, vectorised jnp.

Given predicted and ground-truth qpos trajectories (T, 76):

- mpjpe (mm): root-zeroed mean joint position error           (:170-172)
- root_dist / head_dist: mean ||I - T_p T_g^-1||_F of 4x4 poses (:154-160)
- vel_dist: mean finite-difference qvel error (heading frame)  (:138-141,163)
- accel_dist (mm): joint acceleration error x1000              (:45-73,165)
- slide (mm): foot displacement weighted 2 - 2^(h/H) while the
  pelvis is up and the foot is low                             (:294-309)
- penetration (mm): sum of max(0, -dist - margin) of body-vs-floor
  contact distances per frame / seq_len * 1000 (replayed through our
  contact-candidate vertices instead of a MuJoCo sim,          :205-292)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath
from kinpoly_tpu.physics import fk as fklib

DT = 1.0 / 30


def root_matrices(qpos: jax.Array) -> jax.Array:
    """(T, 76)-ish pose rows with [pos3, quat4] -> (T, 4, 4)."""
    R = tmath.quat_to_mat(qpos[..., 3:7])
    T_ = jnp.zeros(qpos.shape[:-1] + (4, 4), qpos.dtype)
    T_ = T_.at[..., :3, :3].set(R)
    T_ = T_.at[..., :3, 3].set(qpos[..., :3])
    return T_.at[..., 3, 3].set(1.0)


def frobenius_norm_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    """mean ||I - x y^-1||_F over leading dims (metrics.py:64-72).
    Uses the closed-form rigid-transform inverse."""
    R = y[..., :3, :3]
    t = y[..., :3, 3]
    y_inv = jnp.zeros_like(y)
    y_inv = y_inv.at[..., :3, :3].set(jnp.swapaxes(R, -1, -2))
    y_inv = y_inv.at[..., :3, 3].set(-jnp.einsum("...ji,...j->...i", R, t))
    y_inv = y_inv.at[..., 3, 3].set(1.0)
    err = jnp.eye(4, dtype=x.dtype) - x @ y_inv
    return jnp.sqrt(jnp.sum(err * err, axis=(-2, -1))).mean()


def joint_vels(qpos: jax.Array, dt: float = DT) -> jax.Array:
    """Finite-difference qvel with heading-frame linear part
    (metrics.py get_joint_vels with transform='heading')."""
    v = tmath.qvel_fd(qpos[:-1], qpos[1:], dt)
    lin = tmath.transform_vec(
        (qpos[1:, :3] - qpos[:-1, :3]) / dt, qpos[:-1, 3:7], "heading")
    return v.at[:, :3].set(lin)


def mpjpe(jpos_pred: jax.Array, jpos_gt: jax.Array) -> jax.Array:
    """(T, 24, 3) world joint positions -> mm."""
    p = jpos_pred - jpos_pred[:, 0:1]
    g = jpos_gt - jpos_gt[:, 0:1]
    return jnp.linalg.norm(p - g, axis=2).mean() * 1000.0


def accel_dist(jpos_pred: jax.Array, jpos_gt: jax.Array) -> jax.Array:
    """Acceleration error x1000 (compute_error_accel, :45-73); 0 for
    sequences too short to difference twice."""
    if jpos_pred.shape[0] < 3:
        return jnp.zeros((), jpos_pred.dtype)
    a_g = jpos_gt[:-2] - 2 * jpos_gt[1:-1] + jpos_gt[2:]
    a_p = jpos_pred[:-2] - 2 * jpos_pred[1:-1] + jpos_pred[2:]
    return jnp.linalg.norm(a_p - a_g, axis=2).mean() * 1000.0


def foot_sliding(foot_pos: jax.Array, qpos: jax.Array) -> jax.Array:
    """(T, 3) foot positions + (T, 76) qpos -> mm/frame (:294-309)."""
    H, z_thresh = 0.033, 0.65
    T = qpos.shape[0]
    foot = foot_pos - jnp.zeros_like(foot_pos).at[:, 2].set(
        foot_pos[:3, 2].mean())
    disp = jnp.linalg.norm(foot[1:, :2] - foot[:-1, :2], axis=1)
    h_avg = (foot[:-1, 2] + foot[1:, 2]) / 2
    z = qpos[1:, 2]
    subset = (h_avg < H) & (z > z_thresh)
    stats = jnp.abs(disp * (2.0 - 2.0 ** (h_avg / H))) * subset
    return stats.sum() / T * 1000.0


def penetration(spec, cand_verts: np.ndarray, cand_body: np.ndarray,
                qpos: jax.Array, margin: float = 0.005) -> jax.Array:
    """Ground penetration in mm: per frame, sum of max(0, depth - margin)
    over candidate contact vertices below the floor (the reference replays
    the sequence through MuJoCo and sums -contact.dist - margin,
    eval_pose_all.py:205-292)."""
    res = fklib.fk(spec, qpos)
    bq = res.xquat[..., cand_body, :]
    bp = res.xpos[..., cand_body, :]
    world = bp + tmath.quat_rot_vec(bq, jnp.asarray(cand_verts, qpos.dtype))
    depth = -world[..., 2] - margin
    pen = jnp.maximum(depth, 0.0)
    # one contact per body (the deepest vertex) to mirror MuJoCo's contact set
    per_body = jax.ops.segment_max(
        jnp.moveaxis(pen, -1, 0), jnp.asarray(cand_body),
        num_segments=len(spec.body_names))
    return jnp.moveaxis(per_body, 0, -1).sum(axis=-1).mean() * 1000.0


def evaluate_pair(spec, qpos_pred: jax.Array, qpos_gt: jax.Array,
                  head_pose_gt: jax.Array | None = None,
                  cand=None, dt: float = DT) -> dict:
    """Full metric row for one take (eval_pose_all.py:130-196)."""
    fk_p = fklib.fk(spec, qpos_pred)
    fk_g = fklib.fk(spec, qpos_gt)
    head = spec.body_index("Head")
    toe_l, toe_r = spec.body_index("L_Toe"), spec.body_index("R_Toe")

    head_pose_pred = jnp.concatenate(
        [fk_p.xpos[:, head], fk_p.xquat[:, head]], axis=-1)
    if head_pose_gt is None:
        head_pose_gt = jnp.concatenate(
            [fk_g.xpos[:, head], fk_g.xquat[:, head]], axis=-1)

    vels_p = joint_vels(qpos_pred, dt)
    vels_g = joint_vels(qpos_gt, dt)

    out = dict(
        root_dist=frobenius_norm_dist(root_matrices(qpos_pred), root_matrices(qpos_gt)),
        head_dist=frobenius_norm_dist(root_matrices(head_pose_pred), root_matrices(head_pose_gt)),
        mpjpe=mpjpe(fk_p.xpos, fk_g.xpos),
        accel_dist=accel_dist(fk_p.xpos, fk_g.xpos),
        vel_dist=jnp.linalg.norm(vels_p - vels_g, axis=1).mean(),
        slide_pred=(foot_sliding(fk_p.xpos[:, toe_l], qpos_pred)
                    + foot_sliding(fk_p.xpos[:, toe_r], qpos_pred)) / 2,
        slide_gt=(foot_sliding(fk_g.xpos[:, toe_l], qpos_gt)
                  + foot_sliding(fk_g.xpos[:, toe_r], qpos_gt)) / 2,
    )
    if cand is not None:
        cand_verts, cand_body = cand
        out["pen_pred"] = penetration(spec, cand_verts, cand_body, qpos_pred)
        out["pen_gt"] = penetration(spec, cand_verts, cand_body, qpos_gt)
    return out


# ---------------------------------------------------------------------------
# per-action success rules (eval_pose_all.py:337-467). Contact-based rules
# need object geoms in the scene; the pose-based components are implemented
# here and the contact components follow the same thresholds against analytic
# object SDFs.
# ---------------------------------------------------------------------------


def success_push(obj_pose_seq: jax.Array, thresh: float = 0.1) -> jax.Array:
    """Push succeeds if the box moved > 0.1 m over the take (:400-420)."""
    disp = jnp.linalg.norm(obj_pose_seq[-1, :3] - obj_pose_seq[0, :3], axis=-1)
    return disp > thresh


def success_avoid(head_pose_pred: jax.Array, head_pose_gt: jax.Array,
                  min_step_dist: jax.Array, thresh: float = 0.5) -> jax.Array:
    """Avoid succeeds if no contact with the obstacle AND final head drift
    < 0.5 m (:430-450). `min_step_dist` is the minimum humanoid-to-obstacle
    distance over the take (>0 means no contact)."""
    drift = jnp.linalg.norm(head_pose_pred[-1, :3] - head_pose_gt[-1, :3], axis=-1)
    return (min_step_dist > 0.0) & (drift < thresh)


def success_sit(hip_chair_contact_frames: jax.Array,
                min_contig: int = 5) -> jax.Array:
    """Sit succeeds given a contiguous window of hip/torso-chair contact."""
    x = hip_chair_contact_frames.astype(jnp.int32)
    def scan_fn(run, xi):
        run = (run + xi) * xi
        return run, run
    _, runs = jax.lax.scan(scan_fn, jnp.zeros((), jnp.int32), x)
    return runs.max() >= min_contig


def success_step(foot_on_step_frames: jax.Array, pelvis_z: jax.Array,
                 base_z: jax.Array, raise_thresh: float = 0.1) -> jax.Array:
    """Step succeeds with foot-on-step contact AND pelvis raised > 0.1 m."""
    return foot_on_step_frames.any() & ((pelvis_z.max() - base_z) > raise_thresh)


# geometry sets from reference eval_pose_all.py:337-467 (geom ids there are
# 1-indexed bodies; mapped to our spec body order): sit uses Pelvis/L_Hip/
# R_Hip/Torso/Spine vs the chair, avoid uses bodies 1-12 vs the Can, step
# uses the ankles/toes vs the step box.
ACTIONS = ("sit", "push", "avoid", "step")
_SIT_BODIES = (0, 1, 5, 9, 10)
_AVOID_BODIES = tuple(range(12))
_STEP_BODIES = (3, 4, 7, 8)
# canonical action -> scene-object-name map (humanoid_ar_v1.py:37-39 pairs
# sit/push/avoid/step with chair/box/Can/step); resolve to indices from the
# parsed spec so a reordered scene cannot silently read the wrong object.
ACTION_OBJECT_NAMES = {"sit": "chair", "push": "box", "avoid": "Can", "step": "step"}


def action_object_indices(spec) -> "np.ndarray":
    """(4,) scene-object index per action in ACTIONS order, derived from the
    spec's object names (asserts all four interactables are present)."""
    names = [o.name for o in spec.objects]
    missing = [n for n in ACTION_OBJECT_NAMES.values() if n not in names]
    assert not missing, f"scene lacks interactable objects {missing}: {names}"
    return np.asarray([names.index(ACTION_OBJECT_NAMES[a]) for a in ACTIONS],
                      np.int32)


def _action_obj(spec) -> dict:
    idx = action_object_indices(spec)
    return dict(zip(ACTIONS, (int(i) for i in idx)))


def _contact_frames(spec, scene, qpos_seq, obj_seq, bodies, obj_idx,
                    verts, vert_body, margin=0.005):
    """Per-frame bool: any candidate vert of `bodies` within `margin` of
    any geom of object `obj_idx` (SDF stand-in for MuJoCo's contact list,
    reference eval_pose_all.py:205-292)."""
    from kinpoly_tpu.physics import contact as ct

    res = fklib.fk(spec, qpos_seq)
    bq = res.xquat[..., vert_body, :]
    bp = res.xpos[..., vert_body, :]
    world = bp + tmath.quat_rot_vec(bq, jnp.asarray(verts, qpos_seq.dtype))
    dist, _ = ct.object_point_distances(scene, obj_seq, world)  # (T, G, P)
    sel_g = np.asarray(scene.obj) == obj_idx
    sel_p = np.isin(np.asarray(vert_body), np.asarray(bodies))
    d = dist[:, sel_g][:, :, sel_p]
    return (d <= margin).any(axis=(-2, -1))


def action_success(spec, scene, qpos_pred: jax.Array, obj_seq: jax.Array,
                   action: str, head_pose_pred=None, head_pose_gt=None,
                   fail_safe_used: bool = False,
                   verts=None, vert_body=None) -> bool:
    """The paper's per-action success rules (eval_pose_all.py:337-467);
    fail-safe use counts as failure (:459-460).

    qpos_pred (T, 76); obj_seq (T, n_obj, 7) simulated object poses (or a
    static (n_obj, 7) broadcast for non-push actions)."""
    if verts is None:
        from kinpoly_tpu.physics import contact as ct

        verts, vert_body = ct.select_contact_vertices(spec, default_k=4)
    if obj_seq.ndim == 2:
        obj_seq = jnp.broadcast_to(obj_seq, (qpos_pred.shape[0],) + obj_seq.shape)
    _ACTION_OBJ = _action_obj(spec)

    if action == "push":
        box = obj_seq[:, _ACTION_OBJ["push"], :3]
        succ = bool(jnp.max(jnp.linalg.norm(box - box[0], axis=-1)) > 0.1)
    elif action == "sit":
        hit = _contact_frames(spec, scene, qpos_pred, obj_seq, _SIT_BODIES,
                              _ACTION_OBJ["sit"], verts, vert_body)
        succ = bool(hit.any())
    elif action == "avoid":
        hit = _contact_frames(spec, scene, qpos_pred, obj_seq, _AVOID_BODIES,
                              _ACTION_OBJ["avoid"], verts, vert_body)
        drift = float(jnp.linalg.norm(
            head_pose_pred[-1, :3] - head_pose_gt[-1, :3]))
        succ = (not bool(hit.any())) and drift <= 0.5
    elif action == "step":
        hit = _contact_frames(spec, scene, qpos_pred, obj_seq, _STEP_BODIES,
                              _ACTION_OBJ["step"], verts, vert_body)
        pelvis_raise = qpos_pred[:, 2] - qpos_pred[0, 2]
        succ = bool(hit.any()) and bool((pelvis_raise > 0.1).any())
    else:  # "None" action
        succ = True
    return succ and not fail_safe_used
