"""StateAR dataset — egocentric-context training data for the kinematic
policy (port of ``kin_poly/data_loaders/statear_smpl_dataset.py``).

Two sources:
- ``load_annotations``: the reference pickle format
  (``sample_data/features/{mocap,real}_annotations.p``: per-take dicts with
  qpos/head_pose/obj_pose/action_one_hot/...)
- ``derive_features``: recompute every feature from a raw qpos sequence +
  object pose via our FK (the formulas of
  ``kin_poly/data_process/process_trajs.py:120-230``), used for tests and
  for regenerating data from AMASS-style clips.

Window sampling (fixed fr_num) with per-take frequency weighting mirrors
``sample_seq`` (:295); batching returns fixed-shape ClipData pytrees.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath
from kinpoly_tpu.models.traj_ar import ClipData
from kinpoly_tpu.physics import fk as fklib

ACTIONS = ("sit", "push", "avoid", "step")
DT = 1.0 / 30


def get_head_vel(head_pose: jax.Array, dt: float = DT) -> jax.Array:
    """Finite-difference head velocity: linear part in the head's *heading*
    frame, angular part in the head frame (process_trajs.py:120-147)."""
    cur, nxt = head_pose[..., :-1, :], head_pose[..., 1:, :]
    v = (nxt[..., :3] - cur[..., :3]) / dt
    v = tmath.transform_vec(v, cur[..., 3:7], "heading")
    qrel = tmath.quat_mul(nxt[..., 3:7], tmath.quat_inv(cur[..., 3:7]))
    aa = tmath.rotation_from_quat(qrel)
    ang = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    wrapped = tmath.wrap_to_pi(ang)
    rv = jnp.where(ang > 1e-12, aa * wrapped / jnp.maximum(ang, 1e-12), aa) / dt
    rv = tmath.transform_vec(rv, cur[..., 3:7], "root")
    out = jnp.concatenate([v, rv], axis=-1)
    return jnp.concatenate([out, out[..., -1:, :]], axis=-2)


def get_obj_relative_pose(obj_pose: jax.Array, head_pose: jax.Array) -> jax.Array:
    """Object pose relative to the head (process_trajs.py:201-230):
    [heading-frame position diff 3, heading-relative quat 4]."""
    head_pos, head_rot = head_pose[..., :3], head_pose[..., 3:7]
    q_heading = tmath.heading_q(head_rot)
    diff = tmath.transform_vec(obj_pose[..., :3] - head_pos, head_rot, "heading")
    quat_local = tmath.quat_mul(tmath.quat_inv(q_heading), obj_pose[..., 3:7])
    return jnp.concatenate([diff, quat_local], axis=-1)


def get_traj_de_heading(qpos: jax.Array, has_z: bool = True) -> jax.Array:
    """AR target pose part (statear_smpl_dataset.py:155-180): qpos without
    xy, root quat de-headed. has_z keeps z (74-d)."""
    if has_z:
        dq = tmath.de_heading(qpos[..., 3:7])
        return jnp.concatenate([qpos[..., 2:3], dq, qpos[..., 7:]], axis=-1)
    dq = tmath.de_heading(qpos[..., 3:7])
    body = qpos[..., 7:]
    body_fwd = jnp.concatenate([body[..., 1:, :], body[..., -2:-1, :]], axis=-2)
    return jnp.concatenate([dq, body_fwd], axis=-1)


def get_root_vel(qpos: jax.Array, dt: float = DT) -> jax.Array:
    """Root velocity target: linear in heading frame, angular in root frame
    (statear_smpl_dataset.py:188-215)."""
    cur, nxt = qpos[..., :-1, :], qpos[..., 1:, :]
    v = (nxt[..., :3] - cur[..., :3]) / dt
    v = tmath.transform_vec(v, cur[..., 3:7], "heading")
    qrel = tmath.quat_mul(nxt[..., 3:7], tmath.quat_inv(cur[..., 3:7]))
    aa = tmath.rotation_from_quat(qrel)
    ang = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    wrapped = tmath.wrap_to_pi(ang)
    rv = jnp.where(ang > 1e-12, aa * wrapped / jnp.maximum(ang, 1e-12), aa) / dt
    rv = tmath.transform_vec(rv, cur[..., 3:7], "root")
    out = jnp.concatenate([v, rv], axis=-1)
    return jnp.concatenate([out, out[..., -1:, :]], axis=-2)


# default parking spot of the secondary object slot (the table, scene object
# index 2: convert_obj_qpos parks object i at ((i+1)*100, 100, 0))
_PARK2 = np.asarray([300.0, 100.0, 0.0, 1.0, 0.0, 0.0, 0.0], np.float32)


def obj_pose14(obj_pose: np.ndarray, obj2_pose: np.ndarray | None = None):
    """(T, 7) active-object pose [+ (T, 7) secondary] -> (T, 14).

    The reference's per-action context is 7-d except push, whose action_len
    is 14 (box + table, humanoid_ar_v1.py:37-39); the second slot defaults
    to the table's parking spot."""
    obj_pose = np.asarray(obj_pose, np.float32)
    if obj_pose.shape[-1] >= 14:
        return obj_pose[..., :14]
    second = (np.asarray(obj2_pose, np.float32)[..., :7]
              if obj2_pose is not None
              else np.broadcast_to(_PARK2, obj_pose[..., :7].shape))
    return np.concatenate([obj_pose[..., :7], second], axis=-1)


def derive_features(spec, qpos_seq: np.ndarray, obj_pose: np.ndarray,
                    action: str = "sit", dt: float = DT,
                    has_z: bool = True, obj2_pose: np.ndarray | None = None) -> dict:
    """Raw qpos (T, 76) + object pose (T, 7) [+ secondary object (push:
    table)] -> the full StateAR take dict."""
    qpos = jnp.asarray(qpos_seq)
    T = qpos.shape[0]
    res = fklib.fk(spec, qpos)
    head = spec.body_index("Head")
    head_pose = jnp.concatenate([res.xpos[:, head], res.xquat[:, head]], axis=-1)

    qvel = tmath.qvel_fd(qpos[:-1], qpos[1:], dt)
    qvel = jnp.concatenate([qvel[:1], qvel], axis=0)

    one_hot = np.zeros((T, len(ACTIONS)), dtype=np.asarray(qpos_seq).dtype)
    one_hot[:, ACTIONS.index(action)] = 1.0

    target = jnp.concatenate(
        [get_traj_de_heading(qpos, has_z), get_root_vel(qpos, dt)], axis=-1)

    obj14 = obj_pose14(obj_pose, obj2_pose)
    return dict(
        qpos=np.asarray(qpos),
        qvel=np.asarray(qvel),
        wbpos=np.asarray(res.xpos.reshape(T, -1)),
        wbquat=np.asarray(res.xquat.reshape(T, -1)),
        bquat=np.asarray(fklib.body_quat_sim(spec, qpos)),
        head_pose=np.asarray(head_pose),
        head_vels=np.asarray(get_head_vel(head_pose, dt)),
        obj_pose=obj14,
        obj_head_relative_poses=np.asarray(
            get_obj_relative_pose(jnp.asarray(obj14)[..., :7], head_pose)),
        action_one_hot=one_hot,
        target=np.asarray(target),
        action=action,
    )


def _ewma(x: np.ndarray, alpha: float = 0.3) -> float:
    """Exponentially weighted success average (recent episodes weigh more);
    0 for takes with no history (treated as hard -> sampled often)."""
    if x.size == 0:
        return 0.0
    w = (1.0 - alpha) ** np.arange(x.size)[::-1]
    return float((x * w).sum() / w.sum())


@dataclass
class StateARDataset:
    """Fixed-window sampler over a set of takes (host-side numpy; batches are
    devices-ready fixed-shape pytrees)."""
    takes: list[dict]
    fr_num: int = 100
    fr_margin: int = 5

    def __post_init__(self):
        # frequency indices: longer takes sampled proportionally more
        # (statear_smpl_dataset.py:140-149)
        freq = []
        for i, t in enumerate(self.takes):
            n = int(np.ceil(t["qpos"].shape[0] / self.fr_num))
            freq += [i] * n
        self.freq_indices = np.asarray(freq)

    @property
    def n_takes(self):
        return len(self.takes)

    def sample_window(self, rng: np.random.RandomState, take_idx=None,
                      freq_dict=None, sampling_temp: float = 0.3,
                      sampling_freq: float = 0.5):
        """Adaptive window sampling (statear_smpl_dataset.py:295-338): with
        probability `sampling_freq`, takes are drawn with probability
        proportional to exp(-ewma(success)/temp) of their recent episode
        outcomes in `freq_dict`; otherwise (and by default) proportional to
        take length."""
        if take_idx is not None:
            i = take_idx
        elif freq_dict:
            probs = np.exp(-np.array([
                _ewma(np.asarray(freq_dict.get(k, []), np.float64))
                for k in range(self.n_takes)]) / sampling_temp)
            probs = probs / probs.sum()
            if rng.binomial(1, sampling_freq):
                i = rng.choice(self.n_takes, p=probs)
            else:
                i = rng.choice(self.freq_indices)
        else:
            i = rng.choice(self.freq_indices)
        take = self.takes[i]
        T = take["qpos"].shape[0]
        fr = min(self.fr_num, T - 1)
        start = rng.randint(0, max(T - fr, 1))
        return i, start, fr

    def get_batch(self, rng: np.random.RandomState, batch_size: int,
                  use_of: bool = False, freq_dict=None,
                  sampling_temp: float = 0.3,
                  sampling_freq: float = 0.5) -> ClipData:
        fr = self.fr_num
        rows = []
        lengths, take_ids = [], []
        for _ in range(batch_size):
            i, start, f = self.sample_window(
                rng, freq_dict=freq_dict, sampling_temp=sampling_temp,
                sampling_freq=sampling_freq)
            T_take = self.takes[i]["qpos"].shape[0]
            lengths.append(min(fr, T_take - start))
            take_ids.append(i)
            take = self.takes[i]
            sl = slice(start, start + fr)

            def win(x):
                w = x[sl]
                if w.shape[0] < fr:  # pad with the last frame
                    w = np.concatenate([w, np.repeat(w[-1:], fr - w.shape[0], 0)])
                return w

            rows.append(dict(
                qpos=win(take["qpos"]), qvel=win(take["qvel"]),
                wbpos=win(take["wbpos"]), head_pose=win(take["head_pose"]),
                head_vels=win(take["head_vels"]),
                obj_pose=win(obj_pose14(take["obj_pose"])),
                obj_head_relative_poses=win(take["obj_head_relative_poses"][:, :7]),
                action_one_hot=win(take["action_one_hot"]),
                target=win(take["target"]),
                of=win(take["of"]) if use_of and "of" in take else None,
            ))
        batch = {k: (np.stack([r[k] for r in rows]) if rows[0][k] is not None else None)
                 for k in rows[0]}
        return ClipData(**batch,
                        length=np.asarray(lengths, np.int32),
                        take_idx=np.asarray(take_ids, np.int32))

    def whole_take(self, i: int, use_of: bool = False,
                   pad_to: int | None = None) -> ClipData:
        """pad_to: edge-repeat every time axis to a common length so takes
        of different durations batch together (the true duration stays in
        `length`; padded frames never count as tracked)."""
        t = self.takes[i]

        def p(x):
            T = x.shape[0]
            if pad_to is None or T >= pad_to:
                return x[None]
            pad = np.repeat(x[-1:], pad_to - T, axis=0)
            return np.concatenate([x, pad], axis=0)[None]

        return ClipData(
            qpos=p(t["qpos"]), qvel=p(t["qvel"]), wbpos=p(t["wbpos"]),
            head_pose=p(t["head_pose"]), head_vels=p(t["head_vels"]),
            obj_pose=p(obj_pose14(t["obj_pose"])),
            obj_head_relative_poses=p(t["obj_head_relative_poses"][:, :7]),
            action_one_hot=p(t["action_one_hot"]),
            target=p(t["target"]),
            of=p(t["of"]) if use_of and "of" in t else None,
            length=np.asarray([t["qpos"].shape[0]], np.int32),
            take_idx=np.asarray([i], np.int32),
        )


def load_annotations(path: str, spec=None) -> list[dict]:
    """Load takes: the reference annotation pickle (dict keyed by take
    name, features precomputed), a list of already-derived takes
    (tools/gen_ar_takes.py), or — when `spec` is given — a raw qpos bank
    {name: {"qpos": (T, 76)}} whose features are derived on the fly."""
    import joblib

    data = joblib.load(path)
    if isinstance(data, list):
        return data
    takes = []
    for name, take in data.items():
        take = dict(take)
        take["name"] = name
        if "target" not in take and spec is not None:
            # raw qpos bank: derive the statear feature set
            q = np.asarray(take["qpos"], np.float32)
            obj = take.get("obj_pose")
            if obj is None:
                obj = np.zeros((q.shape[0], 7), np.float32)
                obj[:, :3] = [100.0, 100.0, 0.5]
                obj[:, 3] = 1.0
            raw = take
            take = derive_features(spec, q, np.asarray(obj, np.float32),
                                   action=take.get("action", "sit"),
                                   obj2_pose=take.get("table_pose"))
            take["name"] = name
            # video-feature banks (use_of configs): carry the rendered
            # flow/person features alongside the derived kinematic ones
            for k in ("of", "person_feat"):
                if k in raw:
                    take[k] = np.asarray(raw[k], np.float32)
        takes.append(take)
    return takes
