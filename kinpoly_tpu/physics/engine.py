"""The batched humanoid simulation engine: stable-PD control + residual
force control + soft contacts + semi-implicit Euler, all inside one jitted
`lax.scan` over substeps.

Replaces the reference hot loop (``uhc/envs/humanoid_im.py:506-533``:
15 x [compute_torque -> scipy cho_solve -> RFC -> MuJoCo C step] per control
step) with a pure jnp function of (state, action) that vmaps over thousands
of humanoids on a TPU chip.

Control math (kept numerically identical to the reference, which is the
behavioural contract for reusing its trained policies / hyperparameters):

  target_pos = expert_kin_pose + a_scale * ctrl[:69]        (action_v=1)
  qpos_err   = (qpos[7:] + qvel[6:]*dt) - target_pos        (0s for root)
  q_accel    = (M + K_d dt)^-1 (-C - K_p qpos_err - K_d qvel)
  tau        = -k_p qpos_err[6:] - k_d (qvel + q_accel dt)[6:],  clipped
  RFC        : qfrc_applied[:6] = clip(scale * vf, ±lim), linear part
               heading-rotated (``humanoid_im.py:497-504``)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.core import tmath
from kinpoly_tpu.physics import contact as ct
from kinpoly_tpu.physics import dynamics as dyn
from kinpoly_tpu.physics import fk as fklib
from kinpoly_tpu.physics import ltdl


class SimState(NamedTuple):
    qpos: jax.Array   # (..., 76)
    qvel: jax.Array   # (..., 75)
    # movable-object state (None unless the model was built with
    # movable_objects=True; the reference scene's objects are free bodies,
    # `_all_step.xml:190-213`, nq 76+5*7 / nv 75+5*6)
    obj_qpos: jax.Array = None   # (..., n_obj, 7)
    obj_qvel: jax.Array = None   # (..., n_obj, 6): (v_com world, omega world)


@dataclass(frozen=True)
class ControlParams:
    """Per-joint PD table (from config joint_params, uhc.yml:86-156)."""
    jkp: np.ndarray          # (69,)
    jkd: np.ndarray          # (69,)
    a_ref: np.ndarray        # (69,) base pose for action_v=0
    a_scale: np.ndarray      # (69,)
    torque_lim: np.ndarray   # (69,)
    rfc_scale: float = 100.0
    rfc_lim: float = float("inf")
    action_v: int = 1
    meta_pd: bool = False
    # residual-force mode (humanoid_im.py:71-89): implicit = 6-d root wrench;
    # explicit = per-body (contact point, force[, torque]) wrenches for
    # vf_bodies (default: all bodies)
    rfc_mode: str = "implicit"
    vf_bodies: tuple = ()            # body indices (explicit mode)
    residual_force_torque: bool = True

    @property
    def body_vf_dim(self) -> int:
        return 6 + 3 * int(self.residual_force_torque)

    @property
    def vf_dim(self) -> int:
        if self.rfc_mode == "implicit":
            return 6
        return self.body_vf_dim * len(self.vf_bodies)


@dataclass(frozen=True)
class ObjDynParams:
    """Free-body dynamics of the scene objects (parsed from the MJCF object
    bodies; chair base mass 1e5 / table legs 500 make those quasi-static,
    the 1 kg 'push' box actually moves)."""
    mass: np.ndarray           # (n_obj,)
    com: np.ndarray            # (n_obj, 3) object-frame CoM
    inertia: np.ndarray        # (n_obj, 3, 3) about CoM, object frame
    floor_verts: np.ndarray    # (V, 3) object-frame floor-contact candidates
    floor_vert_obj: np.ndarray  # (V,)


@dataclass(frozen=True)
class PhysicsModel:
    """Static bundle: spec + dynamics tables + contact candidates."""
    spec: object
    tables: dyn.DynamicsTables
    ctrl: ControlParams
    cand_verts: np.ndarray    # (N, 3) body-local contact candidate verts
    cand_body: np.ndarray     # (N,)
    scene: object = None      # ct.SceneGeoms of the interactable objects
    # simulate the scene objects as free rigid bodies (two-way contact
    # coupling + object-floor contacts + gravity); otherwise they are static
    # collision geometry at the pose passed per-step
    movable_objects: bool = False
    obj_dyn: ObjDynParams = None
    obj_floor_top_k: int = 10
    n_substeps: int = 15
    contact_top_k: int = 12
    object_top_k: int = 8
    limit_top_k: int = 6
    contact_iters: int = 20
    with_joint_limits: bool = True
    friction: float = 1.0
    # run the PSOR contact solve as a Pallas kernel (TPU; vmap-aware)
    use_pallas_pgs: bool = False
    # run the SPD factor+solves as a Pallas kernel (TPU; vmap-aware; ~6x
    # faster than XLA's batched cholesky/triangular_solve at batch 512)
    use_pallas_chol: bool = False
    # SPD solver backend: "ltdl" = tree-sparse L^T D L on the packed mass
    # matrix (physics/ltdl.py; ~3.6x faster than XLA dense Cholesky at
    # batch 4096 on v5e), "dense" = XLA batched Cholesky (use_pallas_chol
    # upgrades "dense" to the Pallas batch-on-lanes kernel)
    solver: str = "ltdl"
    topo: object = None          # ltdl.LTDLTopo (set by build_model)
    # split-OF (round-4): keep object-floor contact rows OUT of the humanoid
    # Jacobian / fused mass solve — their humanoid-side J is identically zero
    # (body = -1), so carrying them wastes ~30 of 109 RHS columns in the LTDL
    # multi-RHS solve and zero blocks in the Delassus build. False restores
    # the round-3 merged path (kept for the equivalence test).
    split_of: bool = True
    # active-set compaction (round-4): per-env top-K gather of contact
    # blocks BEFORE the fused mass solve / Delassus build / PSOR sweep.
    # (K_h over humanoid-side blocks incl. joint limits, K_o over
    # object-floor blocks). The AR env carries 36 candidate blocks (108
    # rows) of which typically <20 are active at once; every downstream
    # stage costs O(rows) to O(rows^2), so the gather cuts the dominant
    # per-substep work while keeping shapes static for XLA. None disables
    # (exact round-3 behaviour). NOTE: PSOR is sweep-order dependent, so
    # even full-K compaction reorders the Gauss-Seidel sweep — converged
    # forces match to solver tolerance, not bitwise.
    compact_k: tuple | None = None
    # contact-plan hoisting (round-5): select an oversampled candidate index
    # set ONCE per control step (from the step-start pose via one cheap FK);
    # each 450 Hz substep then evaluates only the planned candidates (a few
    # dozen gathers + a tiny top_k) instead of every (geom, vertex) pair.
    # The candidate ranking moves on the 33 ms control-step scale, so with
    # `plan_oversample` headroom the per-substep top-K selection is unchanged
    # unless a candidate outside the plan penetrates mid-step (bounded by
    # qvel_clip * control_dt of travel). None/False = exact per-substep build.
    plan_contacts: bool = False
    plan_oversample: int = 2
    # stability guard: |qvel| cap per substep. Legit motion stays < 30 rad/s;
    # this stops the v^2 Coriolis feedback loop that can take a blown-up env
    # from ~1e2 to inf within one 15-substep control step (the reference
    # wraps MuJoCo's step in try/except for the same failure class,
    # humanoid_im.py:526-529)
    qvel_clip: float = 100.0

    @property
    def dt(self) -> float:
        return self.spec.timestep

    @property
    def control_dt(self) -> float:
        return self.spec.timestep * self.n_substeps


def build_model(spec, ctrl: ControlParams, with_objects: bool = False, **kw) -> PhysicsModel:
    # contact-plan hoisting is the production default (round-5; equivalence
    # in tests/test_contact_plan.py); pass plan_contacts=False for the exact
    # per-substep candidate build
    kw.setdefault("plan_contacts", True)
    cand_verts, cand_body = ct.select_contact_vertices(
        spec, per_body=ct.FOOT_BODIES, default_k=4
    )
    scene = ct.scene_from_spec(spec) if (with_objects and spec.objects) else None
    tables = dyn.build_tables(spec)
    if kw.get("use_pallas_chol"):
        kw.setdefault("solver", "dense")
    if kw.get("movable_objects") and scene is not None:
        fv, fvo = ct.object_floor_verts(scene)
        kw.setdefault("obj_dyn", ObjDynParams(
            mass=np.asarray([o.mass for o in spec.objects]),
            com=np.stack([o.com for o in spec.objects]),
            inertia=np.stack([o.inertia for o in spec.objects]),
            floor_verts=fv, floor_vert_obj=fvo,
        ))
    return PhysicsModel(
        spec=spec, tables=tables, ctrl=ctrl,
        cand_verts=cand_verts, cand_body=cand_body, scene=scene,
        topo=ltdl.build_topo(tables.dof_parent), **kw,
    )


def compute_torque(model: PhysicsModel, qpos, qvel, ctrl_joint, base_pos,
                   C, solve_A, jkp=None, jkd=None):
    """Stable-PD torque, one substep (reference ``compute_torque``:433).
    `solve_A(rhs)` solves (M + K_d dt) x = rhs (built by the caller from the
    chosen solver backend)."""
    dt = model.dt
    dtype = qpos.dtype
    jkp = jnp.asarray(model.ctrl.jkp, dtype) if jkp is None else jkp
    jkd = jnp.asarray(model.ctrl.jkd, dtype) if jkd is None else jkd

    # wrap target into +-pi of current joint angles (humanoid_im.py:441-445)
    base_pos = tmath.normalize_angle_diff(base_pos, qpos[..., 7:])
    target_pos = base_pos + ctrl_joint

    zeros6 = jnp.zeros(qpos.shape[:-1] + (6,), dtype)
    qpos_err = jnp.concatenate(
        [zeros6, qpos[..., 7:] + qvel[..., 6:] * dt - target_pos], axis=-1
    )
    jkp = jnp.broadcast_to(jkp, qpos.shape[:-1] + (69,))
    jkd = jnp.broadcast_to(jkd, qpos.shape[:-1] + (69,))
    k_p = jnp.concatenate([zeros6, jkp], axis=-1)
    k_d = jnp.concatenate([zeros6, jkd], axis=-1)

    rhs = -C - k_p * qpos_err - k_d * qvel
    q_accel = solve_A(rhs)
    qvel_err = qvel + q_accel * dt
    torque = -jkp * qpos_err[..., 6:] - jkd * qvel_err[..., 6:]
    lim = jnp.asarray(model.ctrl.torque_lim, dtype)
    return jnp.clip(torque, -lim, lim)


def rfc_explicit(model: PhysicsModel, ks, vf):
    """Per-body residual wrenches (reference ``rfc_explicit``:483-495,
    mjf.mj_applyFT): vf per body = [contact point (3, body frame),
    force (3, body frame)[, torque (3, body frame)]]; force/torque scaled by
    rfc_scale and rotated to world; returns generalized qfrc (..., nv).

    World-origin Plücker math: a force f at world point p plus torque t on
    body b contributes Q_j = phi_j^omega . (t + p x f) + phi_j^v . f for
    every ancestor dof j of b."""
    c = model.ctrl
    d = c.body_vf_dim
    vb = np.asarray(c.vf_bodies, np.int32)
    n = len(vb)
    v = vf.reshape(vf.shape[:-1] + (n, d))
    xpos = ks.fk_res.xpos[..., vb, :]
    xquat = ks.fk_res.xquat[..., vb, :]
    p = xpos + tmath.quat_rot_vec(xquat, v[..., 0:3])
    f = tmath.quat_rot_vec(xquat, v[..., 3:6]) * c.rfc_scale
    if c.residual_force_torque:
        t = tmath.quat_rot_vec(xquat, v[..., 6:9]) * c.rfc_scale
    else:
        t = jnp.zeros_like(f)
    n0 = t + jnp.cross(p, f)
    # mask (n, nv): dof j ancestor of body vb[i]
    anc = np.asarray(model.tables.anc_dof_body)[:, vb].T     # (n, nv)
    # phi rows: (omega, v0); f_spatial = (n0, f)
    Q = jnp.einsum("...jx,nj,...nx->...j", ks.phi[..., :3],
                   jnp.asarray(anc, f.dtype), n0) \
        + jnp.einsum("...jx,nj,...nx->...j", ks.phi[..., 3:],
                     jnp.asarray(anc, f.dtype), f)
    return Q


def rfc_implicit(model: PhysicsModel, qpos, vf, base_rot):
    """Residual root wrench (reference ``rfc_implicit``:497): 6-vector of
    generalized forces on the free-joint dofs; linear part heading-rotated."""
    vf = vf * model.ctrl.rfc_scale
    root_q = tmath.quat_mul(qpos[..., 3:7], tmath.quat_conj(base_rot))
    hq = tmath.heading_q(root_q)
    lin = tmath.quat_rot_vec(hq, vf[..., :3])
    vf = jnp.concatenate([lin, vf[..., 3:6]], axis=-1)
    return jnp.clip(vf, -model.ctrl.rfc_lim, model.ctrl.rfc_lim)


def integrate(qpos, qvel, dt):
    """Semi-implicit Euler position update (MuJoCo mj_integratePos):
    free-joint quat integrated with body-local angular velocity."""
    pos = qpos[..., :3] + qvel[..., :3] * dt
    quat = tmath.quat_norm(
        tmath.quat_mul(qpos[..., 3:7], tmath.quat_from_expmap(qvel[..., 3:6] * dt))
    )
    hinge = qpos[..., 7:] + qvel[..., 6:] * dt
    return jnp.concatenate([pos, quat, hinge], axis=-1)


def _compact_rows(compact_k, J, depth, active, friction, row_live,
                  Jo, obj_rows):
    """Active-set compaction: per-env top-K gather of contact blocks before
    the fused mass solve, Delassus build, and PSOR sweep.

    Block layout (split-OF): depth/active/friction hold n_hb humanoid-side
    blocks (contacts + joint limits, the rows of J) followed by n_ob
    object-floor blocks (no humanoid rows). The humanoid and object-floor
    pools are compacted independently so the [humanoid rows | object rows]
    structure that contact_forces relies on survives. Selection is by
    (active, depth): actives first, deepest first; inactive blocks that fill
    spare slots are force-zeroed by the solver exactly as before. All gathers
    are take_along_axis with static output shapes — per-env dynamic content,
    XLA-static shapes.
    """
    K_h, K_o = compact_k
    n_hb = J.shape[-2] // 3
    n_ob = depth.shape[-1] - n_hb
    K_h = min(K_h, n_hb)
    K_o = min(K_o, n_ob)

    def top_idx(d, a, k):
        # actives dominate (depth is O(1e-2) m); deepest actives first
        score = a.astype(d.dtype) * 1e3 + d
        return jax.lax.top_k(score, k)[1]                  # (..., k)

    idx_h = top_idx(depth[..., :n_hb], active[..., :n_hb], K_h)
    if K_o:
        idx_o = n_hb + top_idx(depth[..., n_hb:], active[..., n_hb:], K_o)
        idx = jnp.concatenate([idx_h, idx_o], axis=-1)     # (..., K_h+K_o)
    else:
        idx = idx_h

    def g1(x):                                             # (..., n_blocks)
        return jnp.take_along_axis(x, idx, axis=-1)

    def g3(x, ix):                                         # (..., 3*nb, d)
        xb = x.reshape(x.shape[:-2] + (-1, 3, x.shape[-1]))
        out = jnp.take_along_axis(xb, ix[..., None, None], axis=-3)
        return out.reshape(out.shape[:-3] + (-1, x.shape[-1]))

    J = g3(J, idx_h)
    depth, friction = g1(depth), g1(friction)
    active = jnp.take_along_axis(active, idx, axis=-1)
    if row_live is not None:
        tab = row_live.reshape(-1, 3)                      # static (nb, 3)
        row_live = tab[idx].reshape(idx.shape[:-1] + (-1,))
    if Jo is not None:
        Jo = g3(Jo, idx)
        orb = obj_rows.reshape(obj_rows.shape[:-1] + (-1, 3))
        obj_rows = jnp.take_along_axis(
            orb, idx[..., None], axis=-2
        ).reshape(idx.shape[:-1] + (-1,))
    return J, depth, active, friction, row_live, Jo, obj_rows


def build_contact_plan(model: PhysicsModel, qpos: jax.Array,
                       obj_qpos=None) -> ct.ContactPlan:
    """Select the per-control-step candidate index sets (one cheap FK at the
    step-start pose; see `PhysicsModel.plan_contacts`). Plan sizes are
    `plan_oversample` x the per-substep top-K of each candidate family,
    clamped to the family size."""
    spec = model.spec
    dtype = qpos.dtype
    ov = model.plan_oversample
    fk_res = fklib.fk(spec, qpos)
    cand = jnp.asarray(model.cand_verts, dtype)
    bq = fk_res.xquat[..., model.cand_body, :]
    bp = fk_res.xpos[..., model.cand_body, :]
    world = bp + tmath.quat_rot_vec(bq, cand)

    n_cand = cand.shape[0]
    floor_idx = jax.lax.top_k(-world[..., 2],
                              min(ov * model.contact_top_k, n_cand))[1]

    obj_idx = of_idx = None
    if model.scene is not None and obj_qpos is not None:
        dist, _ = ct.object_point_distances(model.scene, obj_qpos, world)
        dist_f = dist.reshape(dist.shape[:-2] + (-1,))
        obj_idx = jax.lax.top_k(
            -dist_f, min(ov * model.object_top_k, dist_f.shape[-1]))[1]
    if model.movable_objects and model.obj_dyn is not None \
            and obj_qpos is not None:
        od = model.obj_dyn
        vo = jnp.asarray(od.floor_vert_obj)
        op = obj_qpos[..., vo, :]
        w = op[..., :3] + tmath.quat_rot_vec(
            op[..., 3:7], jnp.asarray(od.floor_verts, dtype))
        of_idx = jax.lax.top_k(
            -w[..., 2], min(ov * model.obj_floor_top_k, w.shape[-2]))[1]

    lim_idx = None
    if model.with_joint_limits:
        q = qpos[..., 7:]
        lo = jnp.asarray(spec.jnt_range[:, 0], dtype)
        hi = jnp.asarray(spec.jnt_range[:, 1], dtype)
        depth_all = jnp.maximum(lo - q, q - hi)
        lim_idx = jax.lax.top_k(
            depth_all, min(ov * model.limit_top_k, depth_all.shape[-1]))[1]

    return ct.ContactPlan(floor_idx=floor_idx, obj_idx=obj_idx,
                          of_idx=of_idx, lim_idx=lim_idx)


def substep(model: PhysicsModel, state: SimState, ctrl_joint, vf, base_pos,
            base_rot, jkp=None, jkd=None, with_contacts: bool = True,
            obj_qpos=None, plan: ct.ContactPlan | None = None) -> SimState:
    """One 450 Hz physics substep with PD control.

    `obj_qpos` (..., n_obj, 7): poses of the interactable objects (static
    collision geometry; requires model.scene). `plan`: optional hoisted
    candidate selection (see `build_contact_plan`)."""
    with jax.default_matmul_precision("highest"):
        return _substep(model, state, ctrl_joint, vf, base_pos, base_rot,
                        jkp, jkd, with_contacts, obj_qpos, plan)


def _substep(model: PhysicsModel, state: SimState, ctrl_joint, vf, base_pos,
             base_rot, jkp=None, jkd=None, with_contacts: bool = True,
             obj_qpos=None, plan: ct.ContactPlan | None = None) -> SimState:
    """Physics substep body. All matmuls/einsums here run at HIGHEST
    precision: TPU f32 matmuls default to bf16 passes, which corrupts the
    75x75 CRBA mass matrix enough to break its Cholesky (NaNs)."""
    spec, tables = model.spec, model.tables
    qpos, qvel = state.qpos, state.qvel
    dtype = qpos.dtype

    ks = dyn.kin_state(spec, tables, qpos)
    C = dyn.bias_force(spec, tables, ks, qvel)

    jkd_eff = jnp.asarray(model.ctrl.jkd, dtype) if jkd is None else jkd
    kd_full = jnp.concatenate(
        [jnp.zeros(qpos.shape[:-1] + (6,), dtype),
         jnp.broadcast_to(jkd_eff, qpos.shape[:-1] + (69,))], axis=-1)

    if model.solver in ("ltdl", "pallas_ltdl"):
        topo = model.topo
        R = ltdl.crba_packed(spec, tables, topo, ks, via_dense=False)
        if model.solver == "pallas_ltdl":
            # batch-on-lanes kernels (physics/pallas_ltdl.py): ~3.7x faster
            # factor than the XLA level-scheduled path on v5e; vmap-aware
            # (unbatched traces fall back to the jnp path)
            from kinpoly_tpu.physics import pallas_ltdl as pltdl
            _factor = pltdl.make_vmappable_factor(topo)
            _solve = pltdl.make_vmappable_solve(topo)
        else:
            _factor = lambda R_: ltdl.factor(topo, R_)
            _solve = lambda Rf_, B_: ltdl.solve(topo, Rf_, B_)
        Rf_A = _factor(ltdl.add_diag(topo, R, kd_full * model.dt))
        Rf_M = _factor(R)
        solve_A = lambda rhs: _solve(Rf_A, rhs[..., None])[..., 0]
        solve_M = lambda B: _solve(Rf_M, B)
    else:
        M = dyn.mass_matrix(spec, tables, ks)
        if model.use_pallas_chol:
            from kinpoly_tpu.physics.pallas_chol import make_vmappable_spd_solve
            spd = make_vmappable_spd_solve()
        else:
            def spd(A, B):
                return dyn.chol_solve(A, B)
        A = M + (kd_full * model.dt)[..., None, :] * jnp.eye(
            M.shape[-1], dtype=dtype)
        solve_A = lambda rhs: spd(A, rhs[..., None])[..., 0]
        solve_M = lambda B: spd(M, B)

    torque = compute_torque(model, qpos, qvel, ctrl_joint, base_pos, C,
                            solve_A, jkp, jkd)
    if model.ctrl.rfc_mode == "explicit":
        zeros6 = jnp.zeros(qpos.shape[:-1] + (6,), dtype)
        tau = jnp.concatenate([zeros6, torque], axis=-1) \
            + rfc_explicit(model, ks, vf)
    else:
        tau = jnp.concatenate(
            [rfc_implicit(model, qpos, vf, base_rot), torque], axis=-1
        )

    movable = model.movable_objects and state.obj_qpos is not None
    if movable:
        obj_qpos = state.obj_qpos

    if not with_contacts:
        qacc = solve_M((tau - C)[..., None])[..., 0]
    else:
        cand = jnp.asarray(model.cand_verts, dtype)
        if plan is not None:
            cs = ct.floor_contacts_planned(
                cand, model.cand_body, ks.fk_res.xpos, ks.fk_res.xquat,
                plan.floor_idx, model.contact_top_k,
                margin=spec.geom_margin, friction=model.friction)
        else:
            cs = ct.floor_contacts(
                spec, cand, model.cand_body,
                ks.fk_res.xpos, ks.fk_res.xquat, model.contact_top_k,
                margin=spec.geom_margin, friction=model.friction,
            )
        n_live = [cs.depth.shape[-1]]
        if model.scene is not None and obj_qpos is not None:
            if plan is not None:
                ocs = ct.object_contacts_planned(
                    model.scene, obj_qpos, cand, model.cand_body,
                    ks.fk_res.xpos, ks.fk_res.xquat, plan.obj_idx,
                    model.object_top_k, margin=spec.geom_margin,
                    friction=model.friction)
            else:
                bq = ks.fk_res.xquat[..., model.cand_body, :]
                bp = ks.fk_res.xpos[..., model.cand_body, :]
                world = bp + tmath.quat_rot_vec(bq, cand)
                ocs = ct.object_contacts(
                    model.scene, obj_qpos, world, model.cand_body,
                    model.object_top_k, margin=spec.geom_margin,
                    friction=model.friction)
            cs = ct.merge_contacts(cs, ocs)
            n_live.append(ocs.depth.shape[-1])
        fcs = None
        split_of = movable and model.split_of
        if movable:
            if plan is not None:
                fcs = ct.object_floor_contacts_planned(
                    obj_qpos, model.obj_dyn.floor_verts,
                    model.obj_dyn.floor_vert_obj, plan.of_idx,
                    model.obj_floor_top_k,
                    margin=spec.geom_margin, friction=model.friction)
            else:
                fcs = ct.object_floor_contacts(
                    obj_qpos, model.obj_dyn.floor_verts,
                    model.obj_dyn.floor_vert_obj, model.obj_floor_top_k,
                    margin=spec.geom_margin, friction=model.friction)
            if not split_of:
                cs = ct.merge_contacts(cs, fcs)
                n_live.append(fcs.depth.shape[-1])

        J = ct.contact_jacobian(cs, ks.phi, tables.anc_dof_body)
        depth, active, friction = cs.depth, cs.active, cs.friction
        row_live = None

        if model.with_joint_limits:
            if plan is not None:
                Jl, dl, al = ct.joint_limit_contacts_planned(
                    qpos, spec.jnt_range, plan.lim_idx, model.limit_top_k,
                    nv=qvel.shape[-1])
            else:
                Jl, dl, al = ct.joint_limit_contacts(
                    qpos, spec.jnt_range, model.limit_top_k, nv=qvel.shape[-1])
            J = jnp.concatenate([J, Jl], axis=-2)
            depth = jnp.concatenate([depth, dl], axis=-1)
            active = jnp.concatenate([active, al], axis=-1)
            friction = jnp.concatenate(
                [friction, jnp.zeros_like(dl)], axis=-1)
            live_contact = np.ones(3 * sum(n_live), bool)
            live_limit = np.tile([True, False, False], model.limit_top_k)
            row_live = jnp.asarray(np.concatenate([live_contact, live_limit]))

        if split_of:
            # object-floor rows appended AFTER the humanoid rows: they enter
            # the PSOR system (depth/active/friction and, below, the object-
            # side Delassus block) but NOT J / the fused mass solve — their
            # humanoid-side Jacobian is identically zero
            depth = jnp.concatenate([depth, fcs.depth], axis=-1)
            active = jnp.concatenate([active, fcs.active], axis=-1)
            friction = jnp.concatenate([friction, fcs.friction], axis=-1)
            if row_live is not None:
                row_live = jnp.concatenate(
                    [row_live,
                     jnp.ones(3 * fcs.depth.shape[-1], bool)], axis=-1)

        # object-side Jacobian rows, built BEFORE the mass solve so the
        # active-set compaction below can gather them together with J; the
        # Delassus/coupling terms are computed on the (possibly compacted)
        # rows further down.
        Jo = obj_rows = None
        if movable:
            od = model.obj_dyn
            n_obj = len(od.mass)
            oq = obj_qpos[..., 3:7]
            Rm = tmath.quat_to_mat(oq)                          # (..., n_obj, 3, 3)
            com_w = obj_qpos[..., :3] + tmath.quat_rot_vec(
                oq, jnp.asarray(od.com, dtype))
            Iw = Rm @ jnp.asarray(od.inertia, dtype) @ jnp.swapaxes(Rm, -1, -2)
            Iw_inv = ct._inv3x3(Iw)
            minv = 1.0 / jnp.asarray(od.mass, dtype).clip(1e-9)

            Jo_c, obj_rows_c = ct.object_jacobian(cs, com_w)    # contacts only
            pad = J.shape[-2] - Jo_c.shape[-2]                  # limit rows
            Jo = jnp.concatenate(
                [Jo_c, jnp.zeros(Jo_c.shape[:-2] + (pad, 6), dtype)], axis=-2)
            obj_rows = jnp.concatenate(
                [obj_rows_c,
                 jnp.full(obj_rows_c.shape[:-1] + (pad,), -1, jnp.int32)], axis=-1)
            if split_of:
                Jo_f, obj_rows_f = ct.object_jacobian(fcs, com_w)
                Jo = jnp.concatenate([Jo, Jo_f], axis=-2)
                obj_rows = jnp.concatenate([obj_rows, obj_rows_f], axis=-1)

        if model.compact_k is not None:
            (J, depth, active, friction, row_live, Jo, obj_rows) = \
                _compact_rows(model.compact_k, J, depth, active, friction,
                              row_live, Jo, obj_rows)

        # one fused multi-RHS solve: [tau - C, J^T] -> [qacc_smooth, M^-1 J^T];
        # the constraint acceleration is then MiJt @ f — no extra back-solve
        B = jnp.concatenate(
            [(tau - C)[..., None], jnp.swapaxes(J, -1, -2)], axis=-1)
        X = solve_M(B)
        qacc = X[..., 0]
        MiJt = X[..., 1:]

        # movable-object coupling: the constraint rows also see the objects'
        # free 6-dof motion. A gains the object-side Delassus block
        # J_o M_o^-1 J_o^T (per object), rows gain the object point velocity
        # and smooth (gravity + gyroscopic) acceleration.
        A_extra = vel_extra = acc_extra = None
        if movable:
            onehot = (obj_rows[..., None] == jnp.arange(n_obj)).astype(dtype)
            K_lin = Jo[..., :3] * jnp.einsum("...rn,n->...r", onehot, minv)[..., None]
            Iwi_r = jnp.einsum("...rn,...nij->...rij", onehot, Iw_inv)
            K_ang = jnp.einsum("...rij,...rj->...ri", Iwi_r, Jo[..., 3:])
            K = jnp.concatenate([K_lin, K_ang], axis=-1)        # Jo M_o^-1 per row
            same = (obj_rows[..., :, None] == obj_rows[..., None, :]) & \
                   (obj_rows >= 0)[..., :, None]
            A_extra = jnp.einsum("...ri,...si->...rs", K, Jo) * same

            u = state.obj_qvel                                  # (..., n_obj, 6)
            gvec = jnp.zeros(com_w.shape[:-2] + (n_obj, 3), dtype).at[..., 2].set(-9.81)
            gyro = -jnp.einsum(
                "...nij,...nj->...ni", Iw_inv,
                jnp.cross(u[..., 3:], jnp.einsum("...nij,...nj->...ni", Iw, u[..., 3:])))
            a_sm_obj = jnp.concatenate([gvec, gyro], axis=-1)   # (..., n_obj, 6)
            u_row = jnp.einsum("...rn,...ni->...ri", onehot, u)
            a_row = jnp.einsum("...rn,...ni->...ri", onehot, a_sm_obj)
            vel_extra = jnp.einsum("...ri,...ri->...r", Jo, u_row)
            acc_extra = jnp.einsum("...ri,...ri->...r", Jo, a_row)

        f = ct.contact_forces(
            J, MiJt, qacc, qvel, depth, active, friction,
            model.dt, iters=model.contact_iters, row_live=row_live,
            use_pallas=model.use_pallas_pgs,
            A_extra=A_extra, vel_extra=vel_extra, acc_smooth_extra=acc_extra,
        )
        qacc = qacc + jnp.einsum(
            "...vc,...c->...v", MiJt, f[..., :J.shape[-2]])

    obj_qpos_new, obj_qvel_new = state.obj_qpos, state.obj_qvel
    if movable and not with_contacts:
        # contacts off: objects still fall/rotate as free bodies (gravity +
        # gyroscopic), so the two modes agree until something touches
        od = model.obj_dyn
        oq = obj_qpos[..., 3:7]
        Rm = tmath.quat_to_mat(oq)
        com_w = obj_qpos[..., :3] + tmath.quat_rot_vec(
            oq, jnp.asarray(od.com, dtype))
        Iw = Rm @ jnp.asarray(od.inertia, dtype) @ jnp.swapaxes(Rm, -1, -2)
        Iw_inv = ct._inv3x3(Iw)
        u = state.obj_qvel
        gvec = jnp.zeros(u.shape[:-1] + (3,), dtype).at[..., 2].set(-9.81)
        gyro = -jnp.einsum(
            "...nij,...nj->...ni", Iw_inv,
            jnp.cross(u[..., 3:], jnp.einsum("...nij,...nj->...ni", Iw, u[..., 3:])))
        u_new = u + jnp.concatenate([gvec, gyro], axis=-1) * model.dt
        if model.qvel_clip:
            u_new = jnp.clip(u_new, -model.qvel_clip, model.qvel_clip)
        v_origin = u_new[..., :3] + jnp.cross(
            u_new[..., 3:], obj_qpos[..., :3] - com_w)
        pos_new = obj_qpos[..., :3] + v_origin * model.dt
        quat_new = tmath.quat_norm(tmath.quat_mul(
            tmath.quat_from_expmap(u_new[..., 3:] * model.dt), oq))
        obj_qpos_new = jnp.concatenate([pos_new, quat_new], axis=-1)
        obj_qvel_new = u_new
    if movable and with_contacts:
        # object wrench about its CoM and free-body integration
        w = jnp.einsum("...rn,...r,...ri->...ni", onehot, f, Jo)
        a_lin = w[..., :3] * minv[:, None] + a_sm_obj[..., :3]
        a_ang = jnp.einsum("...nij,...nj->...ni", Iw_inv, w[..., 3:]) \
            + a_sm_obj[..., 3:]
        u_new = u + jnp.concatenate([a_lin, a_ang], axis=-1) * model.dt
        if model.qvel_clip:
            u_new = jnp.clip(u_new, -model.qvel_clip, model.qvel_clip)
        v_origin = u_new[..., :3] + jnp.cross(
            u_new[..., 3:], obj_qpos[..., :3] - com_w)
        pos_new = obj_qpos[..., :3] + v_origin * model.dt
        quat_new = tmath.quat_norm(tmath.quat_mul(
            tmath.quat_from_expmap(u_new[..., 3:] * model.dt), oq))
        obj_qpos_new = jnp.concatenate([pos_new, quat_new], axis=-1)
        obj_qvel_new = u_new

    qvel_new = qvel + qacc * model.dt
    if model.qvel_clip:
        qvel_new = jnp.clip(qvel_new, -model.qvel_clip, model.qvel_clip)
    qpos_new = integrate(qpos, qvel_new, model.dt)
    return SimState(qpos=qpos_new, qvel=qvel_new,
                    obj_qpos=obj_qpos_new, obj_qvel=obj_qvel_new)


def control_step(model: PhysicsModel, state: SimState, action: jax.Array,
                 expert_kin_pose: jax.Array, base_rot: jax.Array,
                 with_contacts: bool = True, obj_qpos=None) -> SimState:
    """One 30 Hz control step = n_substeps PD substeps with a fixed action
    (reference ``do_simulation``:506). `action` layout: [69 joint ctrl,
    6 rfc, (optional 2*15 meta-pd)]."""
    c = model.ctrl
    dtype = state.qpos.dtype
    ctrl_joint = action[..., :69] * jnp.asarray(c.a_scale, dtype)
    vf = action[..., 69:69 + c.vf_dim]
    if c.action_v == 1:
        base_pos = expert_kin_pose
    else:
        base_pos = jnp.asarray(c.a_ref, dtype)

    plan = None
    if model.plan_contacts and with_contacts:
        plan_obj = state.obj_qpos if (model.movable_objects and
                                      state.obj_qpos is not None) else obj_qpos
        plan = build_contact_plan(model, state.qpos, plan_obj)

    if c.meta_pd:
        meta = action[..., 69 + c.vf_dim:69 + c.vf_dim + 2 * model.n_substeps]

        def body(s, i):
            kp = jnp.asarray(c.jkp, dtype) * jnp.clip(meta[..., i, None] + 1, 0, 10)
            kd = jnp.asarray(c.jkd, dtype) * jnp.clip(meta[..., i + model.n_substeps, None] + 1, 0, 10)
            return substep(model, s, ctrl_joint, vf, base_pos, base_rot,
                           jkp=kp, jkd=kd, with_contacts=with_contacts,
                           obj_qpos=obj_qpos, plan=plan), None

        state, _ = jax.lax.scan(body, state, jnp.arange(model.n_substeps))
        return state

    def body(s, _):
        return substep(model, s, ctrl_joint, vf, base_pos, base_rot,
                       with_contacts=with_contacts, obj_qpos=obj_qpos,
                       plan=plan), None

    state, _ = jax.lax.scan(body, state, None, length=model.n_substeps)
    return state
