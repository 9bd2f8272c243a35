"""Feasibility grounding for keyframe-authored clips.

Round-5 root-cause (docs/PERF... see STATUS): the getup/situp/prone clips
interpolated leg chains through the floor (toes/ankles up to 0.77 m below
z=0), and the generators' `fix_floor` root-z lift then LEVITATED the whole
body ~0.7 m to compensate — producing dynamically impossible "flying"
reference motion that the UHC tracks to exactly the failure frame and no
further (27% on getup). No controller can track a body hovering with no
support; the fix belongs in the data, not the policy.

`ground_legs` applies the minimal per-frame hip-pitch correction (one
scalar added to both hips' flexion slot) that keeps every leg contact
vertex at/above the floor, found by a batched grid search over deltas
(sign-robust across supine/prone/side poses where the analytic sign
flips). `ground_arms` does the same for the shoulders (mirrored slots).
Deltas are smoothed over time (hanning) so the correction cannot inject
velocity spikes; the generators' `fix_floor` then only has millimetres of
residual to absorb.
"""

from __future__ import annotations

import numpy as np


def _leg_min_z(spec, q, verts, vbody, body_sel):
    import jax.numpy as jnp

    from kinpoly_tpu.core import tmath
    from kinpoly_tpu.physics import fk as fklib

    res = fklib.fk(spec, jnp.asarray(q))
    world = np.asarray(
        res.xpos[..., vbody, :]
        + tmath.quat_rot_vec(res.xquat[..., vbody, :],
                             jnp.asarray(verts, q.dtype)))
    sel = np.isin(vbody, body_sel)
    return world[..., sel, 2].min(axis=-1)


def _grounding_delta(spec, q, slots, body_names_sel, clearance,
                     max_delta, grid, smooth=9):
    """Smallest per-frame delta (added to every slot in `slots`, with the
    given per-slot signs) lifting the selected bodies' contact verts to
    >= clearance. Returns the smoothed delta track (T,)."""
    from kinpoly_tpu.physics import contact as ct

    verts, vbody = ct.select_contact_vertices(spec, default_k=4)
    names = list(spec.body_names)
    body_sel = np.asarray([names.index(n) for n in body_names_sel])

    T = q.shape[0]
    deltas = np.linspace(-max_delta, max_delta, grid)
    Q = np.repeat(q[None], grid, axis=0)                 # (G, T, 76)
    for slot, sign in slots:
        Q[..., slot] += sign * deltas[:, None]
    lo, hi = spec.jnt_range[:, 0] + 0.02, spec.jnt_range[:, 1] - 0.02
    Q[..., 7:] = np.clip(Q[..., 7:], lo, hi)
    minz = _leg_min_z(spec, Q.reshape(-1, q.shape[-1]), verts, vbody,
                      body_sel).reshape(grid, T)
    ok = minz >= clearance
    # smallest |delta| that grounds the frame; if none can, best effort
    cost = np.abs(deltas)[:, None] + 1e3 * (~ok)
    pick = np.where(ok.any(axis=0), cost.argmin(axis=0), minz.argmax(axis=0))
    d = deltas[pick]
    if smooth and smooth > 1:
        k = np.hanning(smooth)
        k /= k.sum()
        d = np.convolve(np.pad(d, smooth // 2, mode="edge"), k, mode="valid")
    return d


def ground_legs(spec, q, clearance=0.005, max_delta=1.2, grid=49):
    """Hip-pitch grounding: lift leg contact verts to the floor with the
    minimal symmetric hip-flexion change. Returns (q_fixed, delta_track)."""
    names = list(spec.body_names)
    hip_slot = lambda side: 7 + 3 * (names.index(f"{side}_Hip") - 1) + 2
    slots = [(hip_slot("L"), 1.0), (hip_slot("R"), 1.0)]
    d = _grounding_delta(
        spec, q, slots, ("L_Knee", "R_Knee", "L_Ankle", "R_Ankle",
                         "L_Toe", "R_Toe"), clearance, max_delta, grid)
    out = q.copy()
    for slot, sign in slots:
        out[:, slot] += (sign * d).astype(q.dtype)
    lo, hi = spec.jnt_range[:, 0] + 0.02, spec.jnt_range[:, 1] - 0.02
    out[:, 7:] = np.clip(out[:, 7:], lo, hi)
    return out, d


def ground_arms(spec, q, clearance=0.005, max_delta=0.9, grid=25):
    """Shoulder grounding (mirrored slots): keep wrist/elbow verts out of
    the floor in lying poses. Returns (q_fixed, delta_track)."""
    names = list(spec.body_names)
    sh_slot = lambda side: 7 + 3 * (names.index(f"{side}_Shoulder") - 1) + 1
    slots = [(sh_slot("L"), -1.0), (sh_slot("R"), 1.0)]
    d = _grounding_delta(
        spec, q, slots, ("L_Elbow", "R_Elbow", "L_Wrist", "R_Wrist",
                         "L_Hand", "R_Hand"), clearance, max_delta, grid)
    out = q.copy()
    for slot, sign in slots:
        out[:, slot] += (sign * d).astype(q.dtype)
    lo, hi = spec.jnt_range[:, 0] + 0.02, spec.jnt_range[:, 1] - 0.02
    out[:, 7:] = np.clip(out[:, 7:], lo, hi)
    return out, d


def max_root_lift(spec, q, clearance=0.01):
    """The root-z lift `fix_floor` WOULD apply — the feasibility telltale a
    generator should assert on (large lift == levitating reference)."""
    from kinpoly_tpu.physics import contact as ct

    verts, vbody = ct.select_contact_vertices(spec, default_k=4)
    low = _leg_min_z(spec, q, verts, vbody, np.arange(len(spec.body_names)))
    return float(np.maximum(0.0, clearance - low).max())
