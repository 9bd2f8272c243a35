"""AR-env component profile (VERDICT r4 #3: explain why the round-4 levers
bought +6% instead of the predicted 1.8-2.3x, then name the real
bottleneck).

Times every stage of the AR substep (mirroring engine._substep's wiring —
keep in sync) plus the env-level pieces (policy GRU, UHC MLP, FK, full env
step) at the bench config. Each stage is timed as its own jitted scan with
a scalar checksum fetch (tunnel-honest; see bench.py notes). The ledger
check: stage times should roughly sum to the FULL substep time; the env
step minus 15x substep is the "glue" (obs/reward/FK) cost.

  BENCH_AR_N_ENVS unused here; set BENCH_N_ENVS directly:
  BENCH_ENV=ar BENCH_N_ENVS=1024 python tools/profile_ar_substep.py
  BENCH_NO_COMPACT=1 ... for the no-compaction A/B.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "JAX_PLATFORMS" in os.environ and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("BENCH_N_ENVS", "1024")
os.environ.setdefault("BENCH_N_STEPS", "8")

import jax
import jax.numpy as jnp
import numpy as np

# PROF_CPU=1 forces the CPU backend: the session sitecustomize pre-registers
# the tunneled TPU before JAX_PLATFORMS is read, so the env var alone is NOT
# enough — a "CPU" run would silently share the TPU tunnel with whatever
# else is using it
if os.environ.get("PROF_CPU"):
    jax.config.update("jax_platforms", "cpu")

REPS = int(os.environ.get("BENCH_REPS", "8"))
RESULTS = {}


def timed(name, f, *args, reps=REPS):
    dev = jax.devices()[0]

    def perturb(a, c):
        # hoist-proof: nudge every float leaf of the FIRST argument by the
        # loop carry * 1e-30, so the scan body is NOT loop-invariant and
        # XLA cannot hoist f out of the reps loop (which silently divided
        # every reported time by REPS in the round-5 captures — see
        # docs/PERF.md "measurement artifact, settled").
        def g(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x + c.astype(x.dtype) * 1e-30
            return x
        return jax.tree.map(g, a)

    @jax.jit
    def run(*a):
        def body(c, _):
            out = f(perturb(a[0], c), *a[1:])
            s = sum(jnp.sum(x) * 1e-12 for x in jax.tree.leaves(out)
                    if hasattr(x, "dtype")
                    and jnp.issubdtype(x.dtype, jnp.floating))
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=reps)
        return c

    args = jax.device_put(args, dev)
    s = run(*args); jax.block_until_ready(s)          # compile
    t0 = time.time()
    s = run(*args); s.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
    RESULTS[name] = dt * 1e3
    return dt


def main():
    from bench import build_ar
    import bench

    fn, carry, params, ctx, model = build_ar()
    env, policy = bench._AR_ENV, bench._AR_POLICY

    from kinpoly_tpu.core import tmath
    from kinpoly_tpu.physics import (contact as ct, dynamics as dyn,
                                     engine as eng, fk as fklib, ltdl)

    spec, tables, topo = model.spec, model.tables, model.topo
    st = carry.env_state.sim
    qpos, qvel = st.qpos, st.qvel
    obj_qpos, obj_qvel = st.obj_qpos, st.obj_qvel
    dtype = qpos.dtype
    N = qpos.shape[0]
    print(f"batch {N}  compact_k={model.compact_k}  split_of={model.split_of}"
          f"  solver={model.solver}  pallas_pgs={model.use_pallas_pgs}",
          flush=True)

    base_rot = jnp.broadcast_to(
        jnp.asarray([0.7071, 0.7071, 0, 0], dtype), qpos.shape[:-1] + (4,))
    ctrl_joint = jnp.zeros(qpos.shape[:-1] + (69,), dtype)
    vf = jnp.zeros(qpos.shape[:-1] + (model.ctrl.vf_dim,), dtype)
    base_pos = qpos[..., 7:]

    if model.solver == "pallas_ltdl":
        from kinpoly_tpu.physics import pallas_ltdl as pltdl
        _factor = pltdl.make_vmappable_factor(topo)
        _solve = pltdl.make_vmappable_solve(topo)
    else:
        _factor = lambda R_: ltdl.factor(topo, R_)
        _solve = lambda Rf_, B_: ltdl.solve(topo, Rf_, B_)

    kd_full = jnp.concatenate(
        [jnp.zeros(qpos.shape[:-1] + (6,), dtype),
         jnp.broadcast_to(jnp.asarray(model.ctrl.jkd, dtype),
                          qpos.shape[:-1] + (69,))], axis=-1)

    # ---- build all intermediates once (mirror of engine._substep) --------
    @jax.jit
    def build(qpos, qvel, obj_qpos, obj_qvel):
        with jax.default_matmul_precision("highest"):
            ks = dyn.kin_state(spec, tables, qpos)
            C = dyn.bias_force(spec, tables, ks, qvel)
            R = ltdl.crba_packed(spec, tables, topo, ks, via_dense=False)
            Rf_A = _factor(ltdl.add_diag(topo, R, kd_full * model.dt))
            Rf_M = _factor(R)
            solve_A = lambda rhs: _solve(Rf_A, rhs[..., None])[..., 0]
            torque = eng.compute_torque(model, qpos, qvel, ctrl_joint,
                                        base_pos, C, solve_A)
            tau = jnp.concatenate(
                [eng.rfc_implicit(model, qpos, vf, base_rot), torque], -1)

            cand = jnp.asarray(model.cand_verts, dtype)
            cs = ct.floor_contacts(
                spec, cand, model.cand_body, ks.fk_res.xpos, ks.fk_res.xquat,
                model.contact_top_k, margin=spec.geom_margin,
                friction=model.friction)
            bq = ks.fk_res.xquat[..., model.cand_body, :]
            bp = ks.fk_res.xpos[..., model.cand_body, :]
            world = bp + tmath.quat_rot_vec(bq, cand)
            ocs = ct.object_contacts(
                model.scene, obj_qpos, world, model.cand_body,
                model.object_top_k, margin=spec.geom_margin,
                friction=model.friction)
            cs = ct.merge_contacts(cs, ocs)
            fcs = ct.object_floor_contacts(
                obj_qpos, model.obj_dyn.floor_verts,
                model.obj_dyn.floor_vert_obj, model.obj_floor_top_k,
                margin=spec.geom_margin, friction=model.friction)

            J = ct.contact_jacobian(cs, ks.phi, tables.anc_dof_body)
            depth, active, friction = cs.depth, cs.active, cs.friction
            Jl, dl, al = ct.joint_limit_contacts(
                qpos, spec.jnt_range, model.limit_top_k, nv=qvel.shape[-1])
            J = jnp.concatenate([J, Jl], axis=-2)
            depth = jnp.concatenate([depth, dl], axis=-1)
            active = jnp.concatenate([active, al], axis=-1)
            friction = jnp.concatenate([friction, jnp.zeros_like(dl)], -1)
            n_live = cs.depth.shape[-1]
            live = np.concatenate([
                np.ones(3 * n_live, bool),
                np.tile([True, False, False], model.limit_top_k)])
            row_live = jnp.asarray(live)
            # split-OF: object-floor rows appended after humanoid rows
            depth = jnp.concatenate([depth, fcs.depth], axis=-1)
            active = jnp.concatenate([active, fcs.active], axis=-1)
            friction = jnp.concatenate([friction, fcs.friction], axis=-1)
            row_live = jnp.concatenate(
                [row_live, jnp.ones(3 * fcs.depth.shape[-1], bool)], -1)

            od = model.obj_dyn
            n_obj = len(od.mass)
            oq = obj_qpos[..., 3:7]
            Rm = tmath.quat_to_mat(oq)
            com_w = obj_qpos[..., :3] + tmath.quat_rot_vec(
                oq, jnp.asarray(od.com, dtype))
            Iw = Rm @ jnp.asarray(od.inertia, dtype) @ jnp.swapaxes(Rm, -1, -2)
            Iw_inv = ct._inv3x3(Iw)
            minv = 1.0 / jnp.asarray(od.mass, dtype).clip(1e-9)
            Jo_c, obj_rows_c = ct.object_jacobian(cs, com_w)
            pad = J.shape[-2] - Jo_c.shape[-2]
            Jo = jnp.concatenate(
                [Jo_c, jnp.zeros(Jo_c.shape[:-2] + (pad, 6), dtype)], -2)
            obj_rows = jnp.concatenate(
                [obj_rows_c,
                 jnp.full(obj_rows_c.shape[:-1] + (pad,), -1, jnp.int32)], -1)
            Jo_f, obj_rows_f = ct.object_jacobian(fcs, com_w)
            Jo = jnp.concatenate([Jo, Jo_f], axis=-2)
            obj_rows = jnp.concatenate([obj_rows, obj_rows_f], axis=-1)

            if model.compact_k is not None:
                (J, depth, active, friction, row_live, Jo, obj_rows) = \
                    eng._compact_rows(model.compact_k, J, depth, active,
                                      friction, row_live, Jo, obj_rows)

            B = jnp.concatenate(
                [(tau - C)[..., None], jnp.swapaxes(J, -1, -2)], axis=-1)
            X = _solve(Rf_M, B)
            qacc = X[..., 0]
            MiJt = X[..., 1:]

            onehot = (obj_rows[..., None] == jnp.arange(n_obj)).astype(dtype)
            K_lin = Jo[..., :3] * jnp.einsum(
                "...rn,n->...r", onehot, minv)[..., None]
            Iwi_r = jnp.einsum("...rn,...nij->...rij", onehot, Iw_inv)
            K_ang = jnp.einsum("...rij,...rj->...ri", Iwi_r, Jo[..., 3:])
            K = jnp.concatenate([K_lin, K_ang], axis=-1)
            same = (obj_rows[..., :, None] == obj_rows[..., None, :]) & \
                   (obj_rows >= 0)[..., :, None]
            A_extra = jnp.einsum("...ri,...si->...rs", K, Jo) * same
            u = obj_qvel
            gvec = jnp.zeros(com_w.shape[:-2] + (n_obj, 3),
                             dtype).at[..., 2].set(-9.81)
            gyro = -jnp.einsum(
                "...nij,...nj->...ni", Iw_inv,
                jnp.cross(u[..., 3:],
                          jnp.einsum("...nij,...nj->...ni", Iw, u[..., 3:])))
            a_sm_obj = jnp.concatenate([gvec, gyro], axis=-1)
            u_row = jnp.einsum("...rn,...ni->...ri", onehot, u)
            a_row = jnp.einsum("...rn,...ni->...ri", onehot, a_sm_obj)
            vel_extra = jnp.einsum("...ri,...ri->...r", Jo, u_row)
            acc_extra = jnp.einsum("...ri,...ri->...r", Jo, a_row)
        return dict(ks=ks, C=C, R=R, Rf_A=Rf_A, Rf_M=Rf_M, tau=tau, cs=cs,
                    fcs=fcs, J=J, depth=depth, active=active,
                    friction=friction, row_live=row_live, Jo=Jo,
                    obj_rows=obj_rows, B=B, qacc=qacc, MiJt=MiJt,
                    A_extra=A_extra, vel_extra=vel_extra,
                    acc_extra=acc_extra, com_w=com_w)

    iv = jax.device_put(build(qpos, qvel, obj_qpos, obj_qvel),
                        jax.devices()[0])

    def P(f):
        def g(*a):
            with jax.default_matmul_precision("highest"):
                return f(*a)
        return g

    # ---- substep stages ---------------------------------------------------
    timed("kin_state (FK+frames+phi)",
          P(lambda q: dyn.kin_state(spec, tables, q)), qpos)
    timed("bias_force (RNEA)",
          P(lambda ks, v: dyn.bias_force(spec, tables, ks, v)),
          iv["ks"], qvel)
    timed("crba_packed",
          P(lambda ks: ltdl.crba_packed(spec, tables, topo, ks,
                                        via_dense=False)), iv["ks"])
    timed("ltdl factor (x1 of 2)", P(_factor), iv["R"])
    timed("PD 1-RHS solve + torque",
          P(lambda RfA, C, q, v: eng.compute_torque(
              model, q, v, ctrl_joint, q[..., 7:], C,
              lambda rhs: _solve(RfA, rhs[..., None])[..., 0])),
          iv["Rf_A"], iv["C"], qpos, qvel)
    timed("contacts: floor+object",
          P(lambda ks, oq: ct.merge_contacts(
              ct.floor_contacts(spec, jnp.asarray(model.cand_verts, dtype),
                                model.cand_body, ks.fk_res.xpos,
                                ks.fk_res.xquat, model.contact_top_k,
                                margin=spec.geom_margin,
                                friction=model.friction),
              ct.object_contacts(
                  model.scene, oq,
                  ks.fk_res.xpos[..., model.cand_body, :] + tmath.quat_rot_vec(
                      ks.fk_res.xquat[..., model.cand_body, :],
                      jnp.asarray(model.cand_verts, dtype)),
                  model.cand_body, model.object_top_k,
                  margin=spec.geom_margin, friction=model.friction))),
          iv["ks"], obj_qpos)
    timed("contacts: object-floor",
          P(lambda oq: ct.object_floor_contacts(
              oq, model.obj_dyn.floor_verts, model.obj_dyn.floor_vert_obj,
              model.obj_floor_top_k, margin=spec.geom_margin,
              friction=model.friction)), obj_qpos)
    # ---- round-5 contact-plan rows (hoisted selection) ---------------------
    if model.plan_contacts:
        plan = jax.device_put(
            jax.jit(lambda q, oq: eng.build_contact_plan(model, q, oq))(
                qpos, obj_qpos), jax.devices()[0])
        timed("contact plan build (1x/ctrl step)",
              P(lambda q, oq: eng.build_contact_plan(model, q, oq)),
              qpos, obj_qpos)
        timed("contacts planned: floor+object",
              P(lambda ks, oq: ct.merge_contacts(
                  ct.floor_contacts_planned(
                      jnp.asarray(model.cand_verts, dtype), model.cand_body,
                      ks.fk_res.xpos, ks.fk_res.xquat, plan.floor_idx,
                      model.contact_top_k, margin=spec.geom_margin,
                      friction=model.friction),
                  ct.object_contacts_planned(
                      model.scene, oq, jnp.asarray(model.cand_verts, dtype),
                      model.cand_body, ks.fk_res.xpos, ks.fk_res.xquat,
                      plan.obj_idx, model.object_top_k,
                      margin=spec.geom_margin, friction=model.friction))),
              iv["ks"], obj_qpos)
        timed("contacts planned: object-floor",
              P(lambda oq: ct.object_floor_contacts_planned(
                  oq, model.obj_dyn.floor_verts, model.obj_dyn.floor_vert_obj,
                  plan.of_idx, model.obj_floor_top_k,
                  margin=spec.geom_margin, friction=model.friction)),
              obj_qpos)
        timed("joint_limit_contacts planned",
              P(lambda q: ct.joint_limit_contacts_planned(
                  q, spec.jnt_range, plan.lim_idx, model.limit_top_k,
                  nv=qvel.shape[-1])), qpos)
        timed("substep (planned)",
              lambda s, cj, v, bp, br: eng.substep(
                  model, s, cj, v, bp, br, plan=plan),
              st, ctrl_joint, vf, base_pos, base_rot)

    timed("contact_jacobian (humanoid)",
          P(lambda cs, ks: ct.contact_jacobian(cs, ks.phi,
                                               tables.anc_dof_body)),
          iv["cs"], iv["ks"])
    timed("joint_limit_contacts",
          P(lambda q: ct.joint_limit_contacts(
              q, spec.jnt_range, model.limit_top_k, nv=qvel.shape[-1])),
          qpos)
    timed("object_jacobian",
          P(lambda cs, cw: ct.object_jacobian(cs, cw)), iv["cs"], iv["com_w"])
    if model.compact_k is not None:
        timed("active-set compaction",
              P(lambda J, d, a, f, rl, Jo, orow: eng._compact_rows(
                  model.compact_k, J, d, a, f, rl, Jo, orow)),
              # pre-compaction row layout: rebuild from cs/fcs quickly is
              # awkward; time on the compacted shapes as a lower bound
              iv["J"], iv["depth"], iv["active"], iv["friction"],
              iv["row_live"], iv["Jo"], iv["obj_rows"])
    timed(f"fused multi-RHS mass solve ({iv['B'].shape[-1]} rhs)",
          P(lambda RfM, B: _solve(RfM, B)), iv["Rf_M"], iv["B"])
    timed("object coupling einsums",
          P(lambda Jo, orow, oq, ov, cw: _coupling(model, Jo, orow, oq, ov,
                                                   cw)),
          iv["Jo"], iv["obj_rows"], obj_qpos, obj_qvel, iv["com_w"])
    timed(f"PSOR contact_forces ({iv['depth'].shape[-1]} blocks, "
          f"{model.contact_iters} iters)",
          P(lambda J, MiJt, qacc, v, d, a, f, rl, Ae, ve, ae:
            ct.contact_forces(J, MiJt, qacc, v, d, a, f, model.dt,
                              iters=model.contact_iters, row_live=rl,
                              use_pallas=model.use_pallas_pgs,
                              A_extra=Ae, vel_extra=ve,
                              acc_smooth_extra=ae)),
          iv["J"], iv["MiJt"], iv["qacc"], qvel, iv["depth"], iv["active"],
          iv["friction"], iv["row_live"], iv["A_extra"], iv["vel_extra"],
          iv["acc_extra"])
    t_sub = timed("FULL substep",
                  lambda s, cj, v, bp, br: eng.substep(
                      model, s, cj, v, bp, br),
                  st, ctrl_joint, vf, base_pos, base_rot)
    t_ctrl = timed(f"control_step ({model.n_substeps} substeps)",
                   lambda s, a, q: eng.control_step(
                       model, s, a, q[..., 7:], base_rot),
                   st, jnp.zeros(qpos.shape[:-1] + (69 + model.ctrl.vf_dim,),
                                 dtype), qpos)

    # ---- env-level pieces --------------------------------------------------
    timed("policy GRU+MLP step (action_mean)",
          lambda p, g, o: policy.action_mean(p, g, o),
          params, carry.gru, carry.obs)
    cc_obs = jnp.zeros((N, 784), dtype)
    timed("UHC MCP policy apply",
          lambda p, o: env.cc_policy_apply(p, o),
          env.cc_policy_params, cc_obs)
    timed("env FK (fk + body_quat_sim)",
          P(lambda q: (fklib.fk(spec, q), fklib.body_quat_sim(spec, q))),
          qpos)
    v_step = jax.vmap(lambda s, a: env.step(s, a, ctx))
    a0 = jnp.zeros((N, policy.action_dim), dtype) \
        if hasattr(policy, "action_dim") else \
        jnp.zeros((N, 80), dtype)
    t_env = timed("FULL env.step (vmapped)",
                  lambda s, a: v_step(s, a), carry.env_state, a0)

    print(json.dumps({"n_envs": N, "compact": model.compact_k is not None,
                      "stages_ms": RESULTS}), flush=True)
    print(f"\nledger: control_step {t_ctrl*1e3:.1f} ms vs 15 x substep "
          f"{15*t_sub*1e3:.1f} ms; env glue (obs/reward/FK/policies) "
          f"{(t_env-t_ctrl)*1e3:.1f} ms", flush=True)


def _coupling(model, Jo, obj_rows, obj_qpos, obj_qvel, com_w):
    from kinpoly_tpu.core import tmath
    from kinpoly_tpu.physics import contact as ct
    od = model.obj_dyn
    dtype = Jo.dtype
    n_obj = len(od.mass)
    oq = obj_qpos[..., 3:7]
    Rm = tmath.quat_to_mat(oq)
    Iw = Rm @ jnp.asarray(od.inertia, dtype) @ jnp.swapaxes(Rm, -1, -2)
    Iw_inv = ct._inv3x3(Iw)
    minv = 1.0 / jnp.asarray(od.mass, dtype).clip(1e-9)
    onehot = (obj_rows[..., None] == jnp.arange(n_obj)).astype(dtype)
    K_lin = Jo[..., :3] * jnp.einsum("...rn,n->...r", onehot, minv)[..., None]
    Iwi_r = jnp.einsum("...rn,...nij->...rij", onehot, Iw_inv)
    K_ang = jnp.einsum("...rij,...rj->...ri", Iwi_r, Jo[..., 3:])
    K = jnp.concatenate([K_lin, K_ang], axis=-1)
    same = (obj_rows[..., :, None] == obj_rows[..., None, :]) & \
           (obj_rows >= 0)[..., :, None]
    A_extra = jnp.einsum("...ri,...si->...rs", K, Jo) * same
    u = obj_qvel
    gvec = jnp.zeros(com_w.shape[:-2] + (n_obj, 3), dtype).at[..., 2].set(-9.81)
    gyro = -jnp.einsum(
        "...nij,...nj->...ni", Iw_inv,
        jnp.cross(u[..., 3:], jnp.einsum("...nij,...nj->...ni", Iw, u[..., 3:])))
    a_sm_obj = jnp.concatenate([gvec, gyro], axis=-1)
    u_row = jnp.einsum("...rn,...ni->...ri", onehot, u)
    a_row = jnp.einsum("...rn,...ni->...ri", onehot, a_sm_obj)
    vel_extra = jnp.einsum("...ri,...ri->...r", Jo, u_row)
    acc_extra = jnp.einsum("...ri,...ri->...r", Jo, a_row)
    return A_extra, vel_extra, acc_extra


if __name__ == "__main__":
    main()
