"""Decompose the AR env.step "glue" cost (VERDICT r4 #3, round-5 follow-up).

The r5 on-chip profile (docs/prof_ar1024_compact_r5.txt) showed FULL
env.step = 383 ms at 1024 envs while the physics control_step is only
65 ms — ~83% of the AR step is NOT the contact solve the round-4 levers
targeted. But the per-stage timings in that profile sit on a ~3 ms
tunnel-dispatch floor and the timing scan re-runs a loop-invariant body
(XLA can hoist it), so they can't say WHERE the 318 ms goes.

This profiler fixes both problems:
  * hoist-proof timing: each rep perturbs the primary input by
    carry * 1e-30 and folds a checksum of the output back into the
    carry, so reps form a serial data-dependent chain XLA cannot
    CSE/hoist;
  * stub ablation: env.step is re-traced with control_step / reward /
    get_obs / the UHC policy replaced by shape-preserving stubs, giving
    a subtractive ledger of the real fused graph (component-in-context,
    not component-in-isolation).

Run on CPU while the chip is busy (relative costs transfer):
  PROF_CPU=1 BENCH_N_ENVS=128 python tools/profile_env_glue.py
or on the TPU when free:
  BENCH_ENV=ar BENCH_N_ENVS=1024 python tools/profile_env_glue.py
"""

import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "JAX_PLATFORMS" in os.environ and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("BENCH_N_ENVS", "128")
os.environ.setdefault("BENCH_N_STEPS", "8")

import jax
import jax.numpy as jnp

if os.environ.get("PROF_CPU"):
    jax.config.update("jax_platforms", "cpu")

REPS = int(os.environ.get("BENCH_REPS", "4"))
RESULTS = {}


def timed(name, f, *args, reps=REPS):
    """Serial-chain timing: rep i's input depends on rep i-1's output."""
    dev = jax.devices()[0]

    def perturb(a, c):
        # nudge every float leaf of the FIRST argument by c*1e-30
        def g(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x + c.astype(x.dtype) * 1e-30
            return x
        return jax.tree.map(g, a)

    @jax.jit
    def run(*a):
        def body(c, _):
            out = f(perturb(a[0], c), *a[1:])
            s = sum(jnp.sum(x).astype(jnp.float32) * 1e-30
                    for x in jax.tree.leaves(out)
                    if hasattr(x, "dtype")
                    and jnp.issubdtype(x.dtype, jnp.floating))
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return c

    args = jax.device_put(args, dev)
    s = run(*args); jax.block_until_ready(s)          # compile
    t0 = time.time()
    s = run(*args); s.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    RESULTS[name] = dt * 1e3
    return dt


@contextlib.contextmanager
def patched(obj, attr, repl):
    orig = getattr(obj, attr)
    setattr(obj, attr, repl)
    try:
        yield
    finally:
        setattr(obj, attr, orig)


def main():
    from bench import build_ar
    import bench
    from kinpoly_tpu.physics import engine as eng, fk as fklib

    fn, carry, params, ctx, model = build_ar()
    env, policy = bench._AR_ENV, bench._AR_POLICY
    N = carry.env_state.sim.qpos.shape[0]
    print(f"batch {N}  backend={jax.default_backend()}  "
          f"solver={model.solver}  pallas_pgs={model.use_pallas_pgs}  "
          f"compact_k={model.compact_k}", flush=True)

    a0 = jnp.zeros((N, env.action_dim), carry.env_state.sim.qpos.dtype)
    st = carry.env_state

    def v_step(s, a):
        return jax.vmap(lambda ss, aa: env.step(ss, aa, ctx))(s, a)

    # ---- the reference points ------------------------------------------
    t_full = timed("env.step FULL", v_step, st, a0)
    t_ctrl = timed(
        f"control_step direct ({model.n_substeps} substeps)",
        lambda s, a: eng.control_step(model, s, a[..., :69 + model.ctrl.vf_dim],
                                      s.qpos[..., 7:], env.base_rot),
        st.sim, jnp.zeros((N, 69 + model.ctrl.vf_dim),
                          st.sim.qpos.dtype))

    # ---- subtractive ablations ------------------------------------------
    # each re-traces env.step with ONE piece stubbed; full - ablated = the
    # in-context cost of that piece (fusion with neighbours included)
    def stub_control_step(model_, sim, a, base_pos, base_rot, obj_qpos=None):
        # keep a data dependency on the action so the UHC chain stays live
        return sim._replace(
            qpos=sim.qpos + a[..., :1] * 1e-30,
            qvel=sim.qvel * (1.0 - 1e-30))

    with patched(eng, "control_step", stub_control_step):
        t_nophys = timed("env.step w/o physics (glue only)", v_step, st, a0)

    zr = jnp.zeros((), st.sim.qpos.dtype)

    def stub_reward(state, sim, fk_cur, cur_bquat, prev_bquat, prev_hpos,
                    tgt_bquat, target, ctx_, new_t):
        z = sim.qpos[..., 0] * 0.0
        return z, jnp.stack([z] * 6, axis=-1)

    with patched(env, "_reward", stub_reward):
        t_norw = timed("env.step w/o reward", v_step, st, a0)

    real_get_obs = env.get_obs
    obs_d = st.sim.qpos.shape[:-1]

    def stub_get_obs(state, ctx_=None):
        return jnp.zeros(obs_d + (carry.obs.shape[-1],),
                         st.sim.qpos.dtype) + state.sim.qpos[..., :1] * 1e-30

    with patched(env, "get_obs", stub_get_obs):
        t_noobs = timed("env.step w/o get_obs", v_step, st, a0)

    real_cc = env.cc_policy_apply

    def stub_cc(params_, obs):
        return (jnp.zeros(obs.shape[:-1] + (75,), obs.dtype)
                + obs[..., :1] * 1e-30,
                jnp.zeros(obs.shape[:-1] + (75,), obs.dtype))

    with patched(env, "cc_policy_apply", stub_cc):
        t_nocc = timed("env.step w/o UHC policy apply", v_step, st, a0)

    def stub_cc_obs(sim, target, fk_res=None):
        return jnp.zeros(sim.qpos.shape[:-1] + (784,), sim.qpos.dtype) \
            + sim.qpos[..., :1] * 1e-30

    with patched(env, "cc_obs", stub_cc_obs):
        t_noccobs = timed("env.step w/o cc_obs build", v_step, st, a0)

    def stub_target(next_qpos):
        shape = next_qpos.shape[:-1]
        nb = model.spec.n_bodies
        z3 = jnp.zeros(shape + (nb * 3,), next_qpos.dtype) \
            + next_qpos[..., :1] * 1e-30
        z4 = jnp.zeros(shape + (nb * 4,), next_qpos.dtype)
        from kinpoly_tpu.envs.humanoid_ar import TargetFrame
        fk0 = fklib.fk(model.spec, next_qpos * 0 + next_qpos)  # placeholder
        return TargetFrame(qpos=next_qpos, wbpos=z3, body_com=z3,
                           wbquat=z4), fk0

    # target_frame still needs a real FKResult for downstream shapes; stub
    # only the TargetFrame tensors (the FK itself is measured via fk below)
    with patched(env, "target_frame", stub_target):
        t_notgt = timed("env.step w/o target-frame tensors", v_step, st, a0)

    # ---- isolated pieces for cross-checking -----------------------------
    timed("fk (batched, direct)",
          lambda q: fklib.fk(model.spec, q), st.sim.qpos)
    timed("body_quat_sim (batched, direct)",
          lambda q: fklib.body_quat_sim(model.spec, q), st.sim.qpos)
    timed("UHC MCP apply (batched, direct)",
          lambda o: env.cc_policy_apply(env.cc_policy_params, o),
          jnp.zeros((N, 784), st.sim.qpos.dtype))
    timed("policy GRU+MLP (batched, direct)",
          lambda g, o: policy.action_mean(params, g, o),
          carry.gru, carry.obs)

    # ---- the ledger -------------------------------------------------------
    ms = lambda t: t * 1e3
    print("\n=== subtractive ledger (full - ablated = in-context cost) ===")
    rows = [
        ("physics (control_step)", t_full - t_nophys, t_ctrl),
        ("reward", t_full - t_norw, None),
        ("get_obs (ar_obs)", t_full - t_noobs, None),
        ("UHC policy apply", t_full - t_nocc, None),
        ("cc_obs build", t_full - t_noccobs, None),
        ("target-frame tensors", t_full - t_notgt, None),
    ]
    for name, d, direct in rows:
        extra = f"   (direct: {ms(direct):8.2f} ms)" if direct else ""
        print(f"{name:28s} {ms(d):9.2f} ms{extra}")
    print(f"{'FULL env.step':28s} {ms(t_full):9.2f} ms")
    print(json.dumps({"n_envs": N, "backend": jax.default_backend(),
                      "stages_ms": RESULTS}), flush=True)


if __name__ == "__main__":
    main()
