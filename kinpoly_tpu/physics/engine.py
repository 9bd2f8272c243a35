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


class SimState(NamedTuple):
    qpos: jax.Array   # (..., 76)
    qvel: jax.Array   # (..., 75)


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


@dataclass(frozen=True)
class PhysicsModel:
    """Static bundle: spec + dynamics tables + contact candidates."""
    spec: object
    tables: dyn.DynamicsTables
    ctrl: ControlParams
    cand_verts: np.ndarray    # (N, 3) body-local contact candidate verts
    cand_body: np.ndarray     # (N,)
    scene: object = None      # ct.SceneGeoms of the interactable objects
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
    cand_verts, cand_body = ct.select_contact_vertices(
        spec, per_body=ct.FOOT_BODIES, default_k=4
    )
    scene = ct.scene_from_spec(spec) if (with_objects and spec.objects) else None
    return PhysicsModel(
        spec=spec, tables=dyn.build_tables(spec), ctrl=ctrl,
        cand_verts=cand_verts, cand_body=cand_body, scene=scene, **kw,
    )


def compute_torque(model: PhysicsModel, qpos, qvel, ctrl_joint, base_pos,
                   M, C, jkp=None, jkd=None, spd=None):
    """Stable-PD torque, one substep (reference ``compute_torque``:433).
    `spd(A, B)` solves the SPD system (multi-RHS); defaults to the XLA path."""
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
    A = M + (k_d * dt)[..., None, :] * jnp.eye(M.shape[-1], dtype=dtype)
    if spd is None:
        q_accel = dyn.chol_solve(A, rhs)
    else:
        q_accel = spd(A, rhs[..., None])[..., 0]
    qvel_err = qvel + q_accel * dt
    torque = -jkp * qpos_err[..., 6:] - jkd * qvel_err[..., 6:]
    lim = jnp.asarray(model.ctrl.torque_lim, dtype)
    return jnp.clip(torque, -lim, lim)


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


def substep(model: PhysicsModel, state: SimState, ctrl_joint, vf, base_pos,
            base_rot, jkp=None, jkd=None, with_contacts: bool = True,
            obj_qpos=None) -> SimState:
    """One 450 Hz physics substep with PD control.

    `obj_qpos` (..., n_obj, 7): poses of the interactable objects (static
    collision geometry; requires model.scene)."""
    with jax.default_matmul_precision("highest"):
        return _substep(model, state, ctrl_joint, vf, base_pos, base_rot,
                        jkp, jkd, with_contacts, obj_qpos)


def _substep(model: PhysicsModel, state: SimState, ctrl_joint, vf, base_pos,
             base_rot, jkp=None, jkd=None, with_contacts: bool = True,
             obj_qpos=None) -> SimState:
    """Physics substep body. All matmuls/einsums here run at HIGHEST
    precision: TPU f32 matmuls default to bf16 passes, which corrupts the
    75x75 CRBA mass matrix enough to break its Cholesky (NaNs)."""
    spec, tables = model.spec, model.tables
    qpos, qvel = state.qpos, state.qvel
    dtype = qpos.dtype

    ks = dyn.kin_state(spec, tables, qpos)
    M = dyn.mass_matrix(spec, tables, ks)
    C = dyn.bias_force(spec, tables, ks, qvel)

    if model.use_pallas_chol:
        from kinpoly_tpu.physics.pallas_chol import make_vmappable_spd_solve
        spd = make_vmappable_spd_solve()
    else:
        def spd(A, B):
            return dyn.chol_solve(A, B)

    torque = compute_torque(model, qpos, qvel, ctrl_joint, base_pos, M, C,
                            jkp, jkd, spd)
    tau = jnp.concatenate(
        [rfc_implicit(model, qpos, vf, base_rot), torque], axis=-1
    )

    if not with_contacts:
        qacc = spd(M, (tau - C)[..., None])[..., 0]
    else:
        cand = jnp.asarray(model.cand_verts, dtype)
        cs = ct.floor_contacts(
            spec, cand, model.cand_body,
            ks.fk_res.xpos, ks.fk_res.xquat, model.contact_top_k,
            margin=spec.geom_margin, friction=model.friction,
        )
        n_live = [cs.depth.shape[-1]]
        if model.scene is not None and obj_qpos is not None:
            bq = ks.fk_res.xquat[..., model.cand_body, :]
            bp = ks.fk_res.xpos[..., model.cand_body, :]
            world = bp + tmath.quat_rot_vec(bq, cand)
            ocs = ct.object_contacts(
                model.scene, obj_qpos, world, model.cand_body,
                model.object_top_k, margin=spec.geom_margin,
                friction=model.friction)
            cs = ct.merge_contacts(cs, ocs)
            n_live.append(ocs.depth.shape[-1])

        J = ct.contact_jacobian(cs, ks.phi, tables.anc_dof_body)
        depth, active, friction = cs.depth, cs.active, cs.friction
        row_live = None

        if model.with_joint_limits:
            Jl, dl, al = ct.joint_limit_contacts(
                qpos, spec.jnt_range, model.limit_top_k, nv=M.shape[-1])
            J = jnp.concatenate([J, Jl], axis=-2)
            depth = jnp.concatenate([depth, dl], axis=-1)
            active = jnp.concatenate([active, al], axis=-1)
            friction = jnp.concatenate(
                [friction, jnp.zeros_like(dl)], axis=-1)
            live_contact = np.ones(3 * sum(n_live), bool)
            live_limit = np.tile([True, False, False], model.limit_top_k)
            row_live = jnp.asarray(np.concatenate([live_contact, live_limit]))

        # one fused multi-RHS solve: [tau - C, J^T] -> [qacc_smooth, M^-1 J^T];
        # the constraint acceleration is then MiJt @ f — no extra back-solve
        B = jnp.concatenate(
            [(tau - C)[..., None], jnp.swapaxes(J, -1, -2)], axis=-1)
        X = spd(M, B)
        qacc = X[..., 0]
        MiJt = X[..., 1:]

        f = ct.contact_forces(
            J, MiJt, qacc, qvel, depth, active, friction,
            model.dt, iters=model.contact_iters, row_live=row_live,
            use_pallas=model.use_pallas_pgs,
        )
        qacc = qacc + jnp.einsum("...vc,...c->...v", MiJt, f)

    qvel_new = qvel + qacc * model.dt
    if model.qvel_clip:
        qvel_new = jnp.clip(qvel_new, -model.qvel_clip, model.qvel_clip)
    qpos_new = integrate(qpos, qvel_new, model.dt)
    return SimState(qpos=qpos_new, qvel=qvel_new)


def control_step(model: PhysicsModel, state: SimState, action: jax.Array,
                 expert_kin_pose: jax.Array, base_rot: jax.Array,
                 with_contacts: bool = True, obj_qpos=None) -> SimState:
    """One 30 Hz control step = n_substeps PD substeps with a fixed action
    (reference ``do_simulation``:506). `action` layout: [69 joint ctrl,
    6 rfc, (optional 2*15 meta-pd)]."""
    c = model.ctrl
    dtype = state.qpos.dtype
    ctrl_joint = action[..., :69] * jnp.asarray(c.a_scale, dtype)
    vf = action[..., 69:75]
    if c.action_v == 1:
        base_pos = expert_kin_pose
    else:
        base_pos = jnp.asarray(c.a_ref, dtype)

    if c.meta_pd:
        meta = action[..., 75:75 + 2 * model.n_substeps]

        def body(s, i):
            kp = jnp.asarray(c.jkp, dtype) * jnp.clip(meta[..., i, None] + 1, 0, 10)
            kd = jnp.asarray(c.jkd, dtype) * jnp.clip(meta[..., i + model.n_substeps, None] + 1, 0, 10)
            return substep(model, s, ctrl_joint, vf, base_pos, base_rot,
                           jkp=kp, jkd=kd, with_contacts=with_contacts,
                           obj_qpos=obj_qpos), None

        state, _ = jax.lax.scan(body, state, jnp.arange(model.n_substeps))
        return state

    def body(s, _):
        return substep(model, s, ctrl_joint, vf, base_pos, base_rot,
                       with_contacts=with_contacts, obj_qpos=obj_qpos), None

    state, _ = jax.lax.scan(body, state, None, length=model.n_substeps)
    return state
