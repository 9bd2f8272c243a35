"""Soft contact + joint-limit constraints, MuJoCo-style, batched in jnp.

MuJoCo's CPU solver builds a constraint system per step with dynamic sparsity;
that shape-shifting is hostile to XLA, so we restructure it TPU-first:

- candidate contact points are *static*: a precomputed set of body-frame
  vertices per humanoid body (extreme points of each mesh) tested against the
  floor plane and (optionally) object primitives each substep;
- the K deepest candidates are gathered into a fixed-size constraint block
  (top-k selection keeps shapes static; inactive rows are disabled through
  the complementarity clamp);
- forces solve a MuJoCo-style soft-constraint problem
  (impedance d(r) from solimp, reference acceleration from solref) with a
  fixed-iteration projected Gauss-Seidel in contact space
  A = J M^-1 J^T + R.

The defaults reproduce the reference scene: solref=(0.02, 1),
solimp=(0.9, 0.95, 0.001), friction (1, .1, .1) on the floor
(`humanoid_smpl_neutral_mesh_all.xml:14,48`), pyramidal cone condim 3.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath

# MuJoCo defaults (XML does not override them)
SOLREF = (0.02, 1.0)
SOLIMP = (0.9, 0.95, 0.001)


class ContactSet(NamedTuple):
    """Fixed-size batch of candidate contacts (already top-k selected)."""
    pos: jax.Array       # (..., K, 3) world contact position
    normal: jax.Array    # (..., K, 3) world normal (points from geom2 into geom1 space; here: up out of the surface)
    depth: jax.Array     # (..., K) penetration depth (>0 means penetrating), includes margin
    body: jax.Array      # (..., K) humanoid body index the point belongs to (int32)
    friction: jax.Array  # (..., K) tangential friction coefficient
    active: jax.Array    # (..., K) bool
    obj: jax.Array = None  # (..., K) int32 scene-object index on the *other*
    #                        side of the contact (-1 = world/static); the
    #                        humanoid side is `body` (-1 = none, e.g.
    #                        object-floor contacts)


def select_contact_vertices(spec, per_body: dict[str, int] | None = None,
                            default_k: int = 6) -> tuple[np.ndarray, np.ndarray]:
    """Precompute candidate contact vertices (host-side, once).

    For each body we pick extreme vertices of its mesh: support points along a
    set of directions biased to the body-local axes. Feet/toes get more points
    since they carry the ground contact. Returns (verts (N, 3), body_id (N,)).
    """
    per_body = per_body or {}
    dirs = []
    # 6 axis directions + 8 diagonal corners
    for s in (1.0, -1.0):
        dirs += [np.array([s, 0, 0]), np.array([0, s, 0]), np.array([0, 0, s])]
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            for sz in (1.0, -1.0):
                dirs.append(np.array([sx, sy, sz]) / np.sqrt(3))
    dirs = np.stack(dirs)

    verts_out, body_out = [], []
    for i, name in enumerate(spec.body_names):
        k = per_body.get(name, default_k)
        v = spec.mesh_verts[i]
        score = v @ dirs.T                      # (V, D)
        idx = np.unique(np.argmax(score, axis=0))
        if len(idx) > k:
            # farthest point downsample
            chosen = [int(idx[np.argmin(v[idx, 2])])]  # start from lowest point
            rest = [j for j in idx if j != chosen[0]]
            while len(chosen) < k and rest:
                dmin = np.array([min(np.linalg.norm(v[j] - v[c]) for c in chosen) for j in rest])
                pick = int(np.argmax(dmin))
                chosen.append(rest.pop(pick))
            idx = np.asarray(chosen)
        verts_out.append(v[idx])
        body_out.append(np.full(len(idx), i, dtype=np.int32))
    return np.concatenate(verts_out), np.concatenate(body_out)


FOOT_BODIES = {"L_Ankle": 10, "R_Ankle": 10, "L_Toe": 10, "R_Toe": 10}


def floor_contacts(spec, cand_verts: jax.Array, cand_body: np.ndarray,
                   xpos: jax.Array, xquat: jax.Array, k_top: int,
                   margin: float = 0.001, friction: float = 1.0) -> ContactSet:
    """Candidate verts vs floor plane z=0; returns the K deepest as a fixed
    block. `cand_verts` (N, 3) body-local, `cand_body` (N,) static."""
    bq = xquat[..., cand_body, :]
    bp = xpos[..., cand_body, :]
    world = bp + tmath.quat_rot_vec(bq, cand_verts)
    # contact "distance" in MuJoCo terms: gap = z; include margin
    depth = margin - world[..., 2]                      # >0 -> active constraint
    val, idx = jax.lax.top_k(depth, k_top)
    pos = jnp.take_along_axis(world, idx[..., None], axis=-2)
    normal = jnp.zeros_like(pos).at[..., 2].set(1.0)
    body = jnp.asarray(cand_body)[idx]
    return ContactSet(
        pos=pos,
        normal=normal,
        depth=val,
        body=body,
        friction=jnp.full(val.shape, friction, dtype=val.dtype),
        active=val > 0.0,
        obj=jnp.full(val.shape, -1, jnp.int32),
    )


class SceneGeoms(NamedTuple):
    """Static object collision geoms, host-side stacked (parsed from the
    chair/box/table/Can/step free bodies of *_all_step.xml)."""
    gtype: np.ndarray    # (G,) 0=box 1=cylinder
    size: np.ndarray     # (G, 3)
    pos: np.ndarray      # (G, 3) geom offset in object frame
    quat: np.ndarray     # (G, 4)
    obj: np.ndarray      # (G,) object body index


def scene_from_spec(spec) -> SceneGeoms:
    gtypes, sizes, poss, quats, objs = [], [], [], [], []
    for oi, obj in enumerate(spec.objects):
        for g in obj.geoms:
            if g.gtype not in ("box", "cylinder"):
                continue
            gtypes.append(0 if g.gtype == "box" else 1)
            s = np.zeros(3)
            s[: len(g.size)] = g.size
            sizes.append(s)
            poss.append(g.pos)
            quats.append(g.quat)
            objs.append(oi)
    return SceneGeoms(np.asarray(gtypes, np.int32), np.stack(sizes),
                      np.stack(poss), np.stack(quats),
                      np.asarray(objs, np.int32))


def _sdf_box(p: jax.Array, half: jax.Array):
    """Signed distance + outward normal of a point vs an axis-aligned box."""
    q = jnp.abs(p) - half
    outside = jnp.maximum(q, 0.0)
    d_out = jnp.linalg.norm(outside, axis=-1)
    d_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    dist = d_out + d_in
    # normal: outside -> direction of clamped diff; inside -> axis of least
    # penetration
    n_out = outside * jnp.sign(p)
    n_out = n_out / jnp.linalg.norm(n_out, axis=-1, keepdims=True).clip(1e-9)
    ax = jnp.argmax(q, axis=-1)
    n_in = jax.nn.one_hot(ax, 3, dtype=p.dtype) * jnp.sign(
        jnp.take_along_axis(p, ax[..., None], axis=-1))
    n = jnp.where((d_out > 0)[..., None], n_out, n_in)
    return dist, n


def _sdf_cylinder(p: jax.Array, size: jax.Array):
    """Point vs z-aligned cylinder (radius size[0], half-height size[1])."""
    r, h = size[..., 0], size[..., 1]
    pr = jnp.linalg.norm(p[..., :2], axis=-1)
    dr = pr - r
    dz = jnp.abs(p[..., 2]) - h
    out_r = jnp.maximum(dr, 0.0)
    out_z = jnp.maximum(dz, 0.0)
    d_out = jnp.sqrt(out_r**2 + out_z**2)
    d_in = jnp.minimum(jnp.maximum(dr, dz), 0.0)
    dist = d_out + d_in
    nr = p[..., :2] / pr[..., None].clip(1e-9)
    n_side = jnp.concatenate([nr, jnp.zeros_like(p[..., 2:3])], axis=-1)
    n_cap = jnp.concatenate(
        [jnp.zeros_like(p[..., :2]), jnp.sign(p[..., 2:3])], axis=-1)
    use_side = jnp.where(d_out > 0, out_r >= out_z, dr >= dz)
    n = jnp.where(use_side[..., None], n_side, n_cap)
    return dist, n


def object_point_distances(scene: SceneGeoms, obj_qpos: jax.Array,
                           points: jax.Array):
    """SDF distance (and world normal) of world points (..., P, 3) to every
    object geom placed at obj_qpos (..., n_obj, 7).
    Returns (dist (..., G, P), normal (..., G, P, 3))."""
    g_obj = scene.obj
    op = obj_qpos[..., g_obj, :3]                     # (..., G, 3)
    oq = obj_qpos[..., g_obj, 3:7]
    gp = jnp.asarray(scene.pos, points.dtype)
    gq = jnp.asarray(scene.quat, points.dtype)
    # world geom frame
    wq = tmath.quat_mul(oq, gq)
    wp = op + tmath.quat_rot_vec(oq, gp)

    # points in geom frame: (..., G, P, 3)
    rel = points[..., None, :, :] - wp[..., :, None, :]
    local = tmath.quat_rot_vec_inv(wq[..., :, None, :], rel)

    size = jnp.asarray(scene.size, points.dtype)[:, None, :]  # (G, 1, 3)
    d_box, n_box = _sdf_box(local, size)
    d_cyl, n_cyl = _sdf_cylinder(local, size)
    is_box = (jnp.asarray(scene.gtype) == 0)[..., :, None]
    dist = jnp.where(is_box, d_box, d_cyl)
    n_local = jnp.where(is_box[..., None], n_box, n_cyl)
    normal = tmath.quat_rot_vec(wq[..., :, None, :], n_local)
    return dist, normal


def object_contacts(scene: SceneGeoms, obj_qpos: jax.Array,
                    cand_world: jax.Array, cand_body: np.ndarray,
                    k_top: int, margin: float = 0.001,
                    friction: float = 1.0) -> ContactSet:
    """Humanoid candidate verts (already world, (..., V, 3)) vs the object
    primitives placed at obj_qpos (..., n_obj, 7). Returns top-K block."""
    g_obj = scene.obj
    dist, normal = object_point_distances(scene, obj_qpos, cand_world)

    depth = margin - dist                              # (..., G, V)
    depth_f = depth.reshape(depth.shape[:-2] + (-1,))
    val, idx = jax.lax.top_k(depth_f, k_top)

    V = cand_world.shape[-2]
    pos_all = jnp.broadcast_to(cand_world[..., None, :, :], normal.shape)
    pos_f = pos_all.reshape(pos_all.shape[:-3] + (-1, 3))
    nrm_f = normal.reshape(normal.shape[:-3] + (-1, 3))
    body_f = jnp.broadcast_to(jnp.asarray(cand_body), depth.shape[-2:]).reshape(-1)

    pos = jnp.take_along_axis(pos_f, idx[..., None], axis=-2)
    nrm = jnp.take_along_axis(nrm_f, idx[..., None], axis=-2)
    body = body_f[idx]
    obj_f = jnp.broadcast_to(jnp.asarray(g_obj)[:, None], depth.shape[-2:]).reshape(-1)
    return ContactSet(
        pos=pos, normal=nrm, depth=val, body=body,
        friction=jnp.full(val.shape, friction, dtype=val.dtype),
        active=val > 0.0,
        obj=obj_f[idx].astype(jnp.int32),
    )


class ContactPlan(NamedTuple):
    """Per-control-step candidate plan (hoisted selection).

    The full contact build evaluates every (geom, vertex) pair and a large
    top_k EVERY 450 Hz substep, yet the candidate ranking changes on the
    33 ms control-step scale, not the 2.2 ms substep scale. The plan selects
    an oversampled candidate index set ONCE per control step (from the
    step-start pose); each substep then only refreshes the few planned
    candidates and runs a tiny top_k over them. Indices are per-env
    (dynamic content, XLA-static shapes).
    """
    floor_idx: jax.Array          # (..., Pf) into the humanoid candidate verts
    obj_idx: jax.Array = None     # (..., Po) into flattened (geom, vert) pairs
    of_idx: jax.Array = None      # (..., Pof) into the object floor verts
    lim_idx: jax.Array = None     # (..., Pl) into the 69 hinge joints


def floor_contacts_planned(cand_verts: jax.Array, cand_body: np.ndarray,
                           xpos: jax.Array, xquat: jax.Array,
                           plan_idx: jax.Array, k_top: int,
                           margin: float = 0.001,
                           friction: float = 1.0) -> ContactSet:
    """`floor_contacts` restricted to the planned candidate indices: only
    the P planned verts are transformed and the top_k runs over P, not N."""
    verts = jnp.asarray(cand_verts)[plan_idx]               # (..., P, 3)
    body = jnp.asarray(cand_body)[plan_idx]                 # (..., P)
    bq = jnp.take_along_axis(xquat, body[..., None], axis=-2)
    bp = jnp.take_along_axis(xpos, body[..., None], axis=-2)
    world = bp + tmath.quat_rot_vec(bq, verts)
    depth = margin - world[..., 2]
    val, sub = jax.lax.top_k(depth, k_top)
    pos = jnp.take_along_axis(world, sub[..., None], axis=-2)
    normal = jnp.zeros_like(pos).at[..., 2].set(1.0)
    return ContactSet(
        pos=pos, normal=normal, depth=val,
        body=jnp.take_along_axis(body, sub, axis=-1),
        friction=jnp.full(val.shape, friction, dtype=val.dtype),
        active=val > 0.0,
        obj=jnp.full(val.shape, -1, jnp.int32),
    )


def object_contacts_planned(scene: SceneGeoms, obj_qpos: jax.Array,
                            cand_verts: jax.Array, cand_body: np.ndarray,
                            xpos: jax.Array, xquat: jax.Array,
                            plan_idx: jax.Array, k_top: int,
                            margin: float = 0.001,
                            friction: float = 1.0) -> ContactSet:
    """`object_contacts` restricted to planned (geom, vert) pairs: P SDF
    evaluations per env instead of G*V, and top_k over P."""
    V = cand_verts.shape[0]
    g = plan_idx // V                                       # (..., P)
    v = plan_idx % V
    verts = jnp.asarray(cand_verts)[v]
    body = jnp.asarray(cand_body)[v]
    bq = jnp.take_along_axis(xquat, body[..., None], axis=-2)
    bp = jnp.take_along_axis(xpos, body[..., None], axis=-2)
    world = bp + tmath.quat_rot_vec(bq, verts)              # (..., P, 3)

    g_obj = jnp.asarray(scene.obj)[g]                       # (..., P)
    op = jnp.take_along_axis(obj_qpos, g_obj[..., None], axis=-2)
    oq = op[..., 3:7]
    dtype = world.dtype
    gp = jnp.asarray(scene.pos, dtype)[g]
    gq = jnp.asarray(scene.quat, dtype)[g]
    wq = tmath.quat_mul(oq, gq)
    wp = op[..., :3] + tmath.quat_rot_vec(oq, gp)
    local = tmath.quat_rot_vec_inv(wq, world - wp)

    size = jnp.asarray(scene.size, dtype)[g]                # (..., P, 3)
    d_box, n_box = _sdf_box(local, size)
    d_cyl, n_cyl = _sdf_cylinder(local, size)
    is_box = (jnp.asarray(scene.gtype)[g] == 0)
    dist = jnp.where(is_box, d_box, d_cyl)
    n_local = jnp.where(is_box[..., None], n_box, n_cyl)
    normal = tmath.quat_rot_vec(wq, n_local)

    depth = margin - dist
    val, sub = jax.lax.top_k(depth, k_top)
    return ContactSet(
        pos=jnp.take_along_axis(world, sub[..., None], axis=-2),
        normal=jnp.take_along_axis(normal, sub[..., None], axis=-2),
        depth=val,
        body=jnp.take_along_axis(body, sub, axis=-1),
        friction=jnp.full(val.shape, friction, dtype=val.dtype),
        active=val > 0.0,
        obj=jnp.take_along_axis(g_obj, sub, axis=-1).astype(jnp.int32),
    )


def object_floor_contacts_planned(obj_qpos: jax.Array, verts: np.ndarray,
                                  vert_obj: np.ndarray, plan_idx: jax.Array,
                                  k_top: int, margin: float = 0.001,
                                  friction: float = 1.0) -> ContactSet:
    """`object_floor_contacts` restricted to the planned vert indices."""
    vo = jnp.asarray(vert_obj)[plan_idx]                    # (..., P)
    vv = jnp.asarray(verts, obj_qpos.dtype)[plan_idx]       # (..., P, 3)
    op = jnp.take_along_axis(obj_qpos, vo[..., None], axis=-2)
    world = op[..., :3] + tmath.quat_rot_vec(op[..., 3:7], vv)
    depth = margin - world[..., 2]
    val, sub = jax.lax.top_k(depth, k_top)
    pos = jnp.take_along_axis(world, sub[..., None], axis=-2)
    normal = jnp.zeros_like(pos).at[..., 2].set(-1.0)
    return ContactSet(
        pos=pos, normal=normal, depth=val,
        body=jnp.full(val.shape, -1, jnp.int32),
        friction=jnp.full(val.shape, friction, dtype=val.dtype),
        active=val > 0.0,
        obj=jnp.take_along_axis(vo, sub, axis=-1).astype(jnp.int32),
    )


def joint_limit_contacts_planned(qpos: jax.Array, jnt_range: np.ndarray,
                                 plan_idx: jax.Array, k_top: int,
                                 nv: int = 75):
    """`joint_limit_contacts` restricted to the planned joint indices."""
    q = jnp.take_along_axis(qpos[..., 7:], plan_idx, axis=-1)
    lo = jnp.asarray(jnt_range[:, 0], qpos.dtype)[plan_idx]
    hi = jnp.asarray(jnt_range[:, 1], qpos.dtype)[plan_idx]
    d_lo = lo - q
    d_hi = q - hi
    depth_all = jnp.maximum(d_lo, d_hi)
    sign = jnp.where(d_lo > d_hi, 1.0, -1.0)

    val, sub = jax.lax.top_k(depth_all, k_top)
    sgn = jnp.take_along_axis(sign, sub, axis=-1)
    jidx = jnp.take_along_axis(plan_idx, sub, axis=-1)
    active = val > 0.0

    rows = jax.nn.one_hot(jidx + 6, nv, dtype=qpos.dtype) * sgn[..., None]
    J = jnp.zeros(rows.shape[:-2] + (k_top, 3, nv), qpos.dtype)
    J = J.at[..., 0, :].set(rows)
    return J.reshape(rows.shape[:-2] + (3 * k_top, nv)), val, active


def merge_contacts(a: ContactSet, b: ContactSet) -> ContactSet:
    cat2 = lambda x, y: jnp.concatenate([x, y], axis=-2)
    cat1 = lambda x, y: jnp.concatenate([x, y], axis=-1)
    return ContactSet(
        pos=cat2(a.pos, b.pos), normal=cat2(a.normal, b.normal),
        depth=cat1(a.depth, b.depth), body=cat1(a.body, b.body),
        friction=cat1(a.friction, b.friction), active=cat1(a.active, b.active),
        obj=cat1(a.obj, b.obj),
    )


def object_floor_verts(scene: SceneGeoms, per_geom: int = 8):
    """Static candidate verts (object-frame) for object<->floor contacts:
    box corners; cylinder rim points (4 bottom + 4 top). Returns
    (verts (V, 3), obj_id (V,))."""
    verts, objs = [], []
    for gi in range(len(scene.gtype)):
        s = scene.size[gi]
        if scene.gtype[gi] == 0:  # box
            local = np.array([[sx * s[0], sy * s[1], sz * s[2]]
                              for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
        else:  # cylinder
            r, h = s[0], s[1]
            local = np.array([[r * np.cos(a), r * np.sin(a), sz * h]
                              for sz in (-1, 1)
                              for a in np.arange(4) * (np.pi / 2)])
        # geom frame -> object frame
        q = scene.quat[gi]
        w, x, y, z = q
        Rm = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        verts.append(local @ Rm.T + scene.pos[gi])
        objs.append(np.full(len(local), scene.obj[gi], np.int32))
    return np.concatenate(verts), np.concatenate(objs)


def object_floor_contacts(obj_qpos: jax.Array, verts: np.ndarray,
                          vert_obj: np.ndarray, k_top: int,
                          margin: float = 0.001,
                          friction: float = 1.0) -> ContactSet:
    """Object candidate verts vs the floor plane z=0; the humanoid is not
    involved (body = -1); `obj` carries the object index so the engine routes
    the constraint rows onto the object's 6 free dofs.

    Sign convention: constraint rows measure (side A - side B) velocity where
    side B is the object (`object_jacobian` negates the object side). Here
    side A is the static floor, so the stored normal points *down* (-z): the
    row velocity -n.v_obj = +v_obj_z is then positive on separation, and the
    object force J_o^T f = -n f = +z f pushes the object out of the floor."""
    vo = jnp.asarray(vert_obj)
    op = obj_qpos[..., vo, :3]
    oq = obj_qpos[..., vo, 3:7]
    world = op + tmath.quat_rot_vec(oq, jnp.asarray(verts, obj_qpos.dtype))
    depth = margin - world[..., 2]
    val, idx = jax.lax.top_k(depth, k_top)
    pos = jnp.take_along_axis(world, idx[..., None], axis=-2)
    normal = jnp.zeros_like(pos).at[..., 2].set(-1.0)
    return ContactSet(
        pos=pos, normal=normal, depth=val,
        body=jnp.full(val.shape, -1, jnp.int32),
        friction=jnp.full(val.shape, friction, dtype=val.dtype),
        active=val > 0.0,
        obj=vo[idx].astype(jnp.int32),
    )


def contact_frame(normal: jax.Array) -> jax.Array:
    """(..., K, 3) normal -> (..., K, 3, 3) rows [n, t1, t2]."""
    n = normal
    ref = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                    jnp.broadcast_to(jnp.asarray([0.0, 0, 1], n.dtype), n.shape),
                    jnp.broadcast_to(jnp.asarray([1.0, 0, 0], n.dtype), n.shape))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True).clip(1e-9)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def object_jacobian(cs: ContactSet, com_world: jax.Array):
    """Object-side contact Jacobian: rows (..., 3K, 6) mapping object
    generalized velocity u_o = (v_com world, omega world) of the contact's
    object to the *negative* relative velocity along [n, t1, t2] (the row
    convention is relative velocity = humanoid point - object point).

    `com_world` (..., n_obj, 3): world CoM per object.
    Returns (J_o (..., 3K, 6), obj_of_row (..., 3K) int32, -1 = none)."""
    frame = contact_frame(cs.normal)                     # (..., K, 3, 3)
    oi = jnp.maximum(cs.obj, 0)
    com = jnp.take_along_axis(
        com_world, oi[..., None], axis=-2)               # (..., K, 3)
    r = cs.pos - com
    # v_point = v + omega x r  ->  d/dn = -n ; d/domega = -(r x n)
    lin = -frame                                         # (..., K, 3, 3)
    ang = -jnp.cross(jnp.broadcast_to(r[..., None, :], frame.shape), frame)
    Jo = jnp.concatenate([lin, ang], axis=-1)            # (..., K, 3, 6)
    Jo = Jo * (cs.obj >= 0)[..., None, None]
    Jo = Jo.reshape(Jo.shape[:-3] + (-1, 6))
    obj_rows = jnp.repeat(cs.obj, 3, axis=-1)
    return Jo, obj_rows


def contact_jacobian(cs: ContactSet, phi: jax.Array, anc_dof_body: np.ndarray) -> jax.Array:
    """Rows (normal, t1, t2) x K of the contact Jacobian J (..., 3K, nv).

    Velocity of the contact point on body b: v_p = omega x (p - origin...) —
    with world-origin Plücker coords, v_p = v0 + omega x p, i.e.
    J_row = n . (phi_v0 + phi_omega x p) per dof, masked by dof-ancestry.
    """
    anc = jnp.asarray(anc_dof_body, dtype=phi.dtype)     # (nv, B)
    mask = anc.T[jnp.maximum(cs.body, 0)]                # (..., K, nv)
    mask = mask * (cs.body >= 0)[..., None]              # body -1: no humanoid side

    omega, v0 = phi[..., :3], phi[..., 3:]               # (..., nv, 3)
    # velocity of the contact point per dof: v0 + omega x p
    omega_b = omega[..., None, :, :]                     # (..., 1, nv, 3)
    v0_b = v0[..., None, :, :]
    p_b = cs.pos[..., :, None, :]                        # (..., K, 1, 3)
    vel = v0_b + jnp.cross(omega_b, p_b)                 # (..., K, nv, 3)

    frame = contact_frame(cs.normal)                     # (..., K, 3, 3)
    J = jnp.einsum("...kvx,...kfx->...kfv", vel, frame) * mask[..., None, :]
    return J.reshape(J.shape[:-3] + (J.shape[-3] * 3, J.shape[-1]))


def _inv3x3(m: jax.Array) -> jax.Array:
    """Closed-form (adjugate) batched 3x3 inverse — avoids TPU LU lowering
    and is faster for tiny blocks."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack([
        A, -(b * i - c * h), b * f - c * e,
        B, a * i - c * g, -(a * f - c * d),
        C, -(a * h - b * g), a * e - b * d,
    ], axis=-1).reshape(m.shape)
    return adj * inv_det[..., None, None]


def impedance(depth: jax.Array, solimp=SOLIMP) -> jax.Array:
    """MuJoCo solimp impedance d(r): sigmoid from d0 to dmax over `width`."""
    d0, dmax, width = solimp
    x = jnp.clip(jnp.abs(depth) / width, 0.0, 1.0)
    # MuJoCo default midpoint 0.5, power 2: standard smooth sigmoid
    y = jnp.where(x < 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) * (1.0 - x))
    return d0 + y * (dmax - d0)


def joint_limit_contacts(qpos: jax.Array, jnt_range: np.ndarray, k_top: int,
                         nv: int = 75):
    """Joint-limit constraints as contact-like rows (MuJoCo limit
    constraints; the reference model limits every hinge to its XML range).

    Returns (J (..., 3K, nv), depth (..., K), active (..., K)) where only the
    first row of each 3-row block is live (friction rows are dead)."""
    q = qpos[..., 7:]
    lo = jnp.asarray(jnt_range[:, 0], qpos.dtype)
    hi = jnp.asarray(jnt_range[:, 1], qpos.dtype)
    d_lo = lo - q            # >0: below lower bound
    d_hi = q - hi            # >0: above upper bound
    depth_all = jnp.maximum(d_lo, d_hi)
    sign = jnp.where(d_lo > d_hi, 1.0, -1.0)

    val, idx = jax.lax.top_k(depth_all, k_top)
    sgn = jnp.take_along_axis(sign, idx, axis=-1)
    active = val > 0.0

    rows = jax.nn.one_hot(idx + 6, nv, dtype=qpos.dtype) * sgn[..., None]
    J = jnp.zeros(rows.shape[:-2] + (k_top, 3, nv), qpos.dtype)
    J = J.at[..., 0, :].set(rows)
    return J.reshape(rows.shape[:-2] + (3 * k_top, nv)), val, active


def solve_contacts(M_solve, J: jax.Array, qacc_smooth: jax.Array,
                   qvel: jax.Array, depth: jax.Array, active: jax.Array,
                   friction: jax.Array, dt: float,
                   solref=SOLREF, solimp=SOLIMP, iters: int = 30,
                   row_live: jax.Array | None = None,
                   use_pallas: bool = False):
    """Projected Gauss-Seidel contact solve returning qfrc = J^T f
    (compat wrapper; the engine uses `contact_forces` + its precomputed
    M^-1 J^T to avoid a redundant back-solve)."""
    MiJt = M_solve(jnp.swapaxes(J, -1, -2))
    f = contact_forces(J, MiJt, qacc_smooth, qvel, depth, active, friction,
                       dt, solref, solimp, iters, row_live, use_pallas)
    return jnp.einsum("...cv,...c->...v", J, f)


def contact_forces(J: jax.Array, MiJt: jax.Array, qacc_smooth: jax.Array,
                   qvel: jax.Array, depth: jax.Array, active: jax.Array,
                   friction: jax.Array, dt: float,
                   solref=SOLREF, solimp=SOLIMP, iters: int = 30,
                   row_live: jax.Array | None = None,
                   use_pallas: bool = False,
                   A_extra: jax.Array | None = None,
                   vel_extra: jax.Array | None = None,
                   acc_smooth_extra: jax.Array | None = None):
    """Projected Gauss-Seidel on contact-space forces.

    J: (..., 3K, nv); MiJt: precomputed M^-1 J^T (..., nv, 3K);
    depth/active/friction: (..., K). row_live: optional (3K,) bool — rows
    that carry actual constraints (joint-limit blocks have dead friction
    rows). Returns contact forces f (..., 3K); the constraint acceleration
    is MiJt @ f.

    Movable-object coupling: A_extra adds the object-side Delassus block
    J_o M_o^-1 J_o^T, vel_extra/acc_smooth_extra add the object-side
    relative velocity / unconstrained acceleration along each row.

    Split-OF: J/MiJt may carry FEWER rows/columns than 3K — the trailing
    rows (object-floor contacts) then have an identically-zero humanoid
    side and live only through A_extra/vel_extra/acc_smooth_extra. The
    returned f is always (..., 3K); the caller applies MiJt @ f[..., :rows].
    """
    nK = depth.shape[-1]
    n_h = J.shape[-2]                                    # humanoid-side rows
    n_of = 3 * nK - n_h

    def _pad_rows(x):
        return (x if n_of == 0 else
                jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_of)]))

    A = J @ MiJt                                         # (..., n_h, n_h)
    if n_of:
        A = jnp.pad(A, [(0, 0)] * (A.ndim - 2) + [(0, n_of), (0, n_of)])
    if A_extra is not None:
        A = A + A_extra

    d = impedance(depth, solimp) * active
    timeconst, dampratio = solref
    b_coef = 2.0 / (SOLIMP[1] * timeconst)
    k_coef = d / (SOLIMP[1] * SOLIMP[1] * timeconst * timeconst * dampratio * dampratio)

    vel_c = _pad_rows(jnp.einsum("...cv,...v->...c", J, qvel))  # (..., 3K)
    if vel_extra is not None:
        vel_c = vel_c + vel_extra
    vel3 = vel_c.reshape(vel_c.shape[:-1] + (nK, 3))
    # reference acceleration along each row (normal row gets position term)
    aref_n = -b_coef * vel3[..., 0] - k_coef * (-depth)  # depth>0 = penetration -> push out
    aref_t = -b_coef * vel3[..., 1:] * 0.0               # tangential: pure friction, no spring
    aref = jnp.concatenate([aref_n[..., None], aref_t], axis=-1).reshape(vel_c.shape)

    # residual: we want J qacc ~ aref => (A + R) f = aref - J qacc_smooth
    rhs = aref - _pad_rows(jnp.einsum("...cv,...v->...c", J, qacc_smooth))
    if acc_smooth_extra is not None:
        rhs = rhs - acc_smooth_extra

    diagA = jnp.diagonal(A, axis1=-2, axis2=-1)
    d_rows = jnp.repeat(d, 3, axis=-1)
    R = (1.0 - d_rows) / jnp.maximum(d_rows, 1e-6) * jnp.maximum(diagA, 1e-8)
    R = jnp.where(jnp.repeat(active, 3, axis=-1), R, 1e8)   # kill inactive rows
    if row_live is not None:
        R = jnp.where(row_live, R, 1e8)                      # kill dead rows

    # 3x3 diagonal blocks (with regularisation) and their explicit inverses
    A3 = A.reshape(A.shape[:-2] + (nK, 3, nK, 3))
    D = jnp.moveaxis(jnp.diagonal(A3, axis1=-4, axis2=-2), -1, -3)  # (..., nK, 3, 3)
    R3 = R.reshape(R.shape[:-1] + (nK, 3))
    eye3 = jnp.eye(3, dtype=A.dtype)
    D = D + R3[..., None] * eye3 + 1e-9 * eye3
    Dinv = _inv3x3(D)

    def project(f3, mu_k):
        """Euclidean projection onto the friction cone; f3 (..., 3), mu (...,)."""
        fn = jnp.maximum(f3[..., 0], 0.0)
        ft = f3[..., 1:]
        ft_norm = jnp.linalg.norm(ft, axis=-1, keepdims=True).clip(1e-12)
        scale = jnp.minimum(1.0, (mu_k * fn)[..., None] / ft_norm)
        return jnp.concatenate([fn[..., None], ft * scale], axis=-1)

    def gs_block(k, f):
        # block projected Gauss-Seidel update of contact k (PSOR: convergent
        # for the SPD regularised QP); sequential over K blocks per sweep
        Ak = jax.lax.dynamic_slice_in_dim(A, 3 * k, 3, axis=-2)   # (..., 3, 3K)
        fk = jax.lax.dynamic_slice_in_dim(f, 3 * k, 3, axis=-1)
        rk = jax.lax.dynamic_slice_in_dim(rhs, 3 * k, 3, axis=-1)
        Rk = jax.lax.dynamic_slice_in_dim(R, 3 * k, 3, axis=-1)
        res = rk - jnp.einsum("...ic,...c->...i", Ak, f) - Rk * fk
        Dk = jax.lax.dynamic_index_in_dim(Dinv, k, axis=-3, keepdims=False)
        mu_k = jax.lax.dynamic_index_in_dim(friction, k, axis=-1, keepdims=False)
        fk_new = project(fk + jnp.einsum("...ij,...j->...i", Dk, res), mu_k)
        fk_new = fk_new * jax.lax.dynamic_index_in_dim(active, k, axis=-1, keepdims=True)
        return jax.lax.dynamic_update_slice_in_dim(f, fk_new, 3 * k, axis=-1)

    def sweep(_, f):
        return jax.lax.fori_loop(0, nK, gs_block, f)

    if use_pallas:
        # vmap-aware Pallas path: unbatched trace falls back to the lax
        # iteration, batched (vmapped env) calls run the whole batch in one
        # Pallas kernel (pallas_pgs.make_vmappable_solver)
        from kinpoly_tpu.physics.pallas_pgs import (make_vmappable_solver,
                                                    pgs_solve_pallas)

        if A.ndim == 3:
            f = pgs_solve_pallas(A, rhs, Dinv, R, friction, active, iters=iters)
        else:
            f = make_vmappable_solver(iters)(
                A, rhs, Dinv, R, friction, active.astype(rhs.dtype))
    else:
        f0 = jnp.zeros_like(rhs)
        f = jax.lax.fori_loop(0, iters, sweep, f0)
    return f
