"""Component timing for the AR env control step (VERDICT r3 #4): times the
pieces of HumanoidAREnv.step separately at a given batch to find where the
42k-substeps/s (round 2, 256 envs) path spends its time.

  BENCH_N_ENVS=1024 python tools/bench_ar_parts.py

Each component is timed as its own jitted scan over REPS iterations with a
scalar checksum fetch (tunnel-honest timing; see bench.py notes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "JAX_PLATFORMS" in os.environ and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp
import joblib
import numpy as np

CPU = jax.local_devices(backend="cpu")[0]
N = int(os.environ.get("BENCH_N_ENVS", "1024"))
STEPS = int(os.environ.get("BENCH_N_STEPS", "16"))


def main():
    from bench import build_ar  # reuses the bench harness construction

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["BENCH_N_ENVS"] = str(N)

    from kinpoly_tpu.physics import engine as eng, fk as fklib

    fn, carry, params, ctx, model = build_ar()
    spec = model.spec
    dev = jax.devices()[0]

    st = carry.env_state
    qpos = st.sim.qpos
    print(f"batch {qpos.shape}", flush=True)

    def timed(name, f, *args, reps=STEPS):
        @jax.jit
        def run(*a):
            def body(c, _):
                out = f(*a)
                s = sum(jnp.sum(x) * 1e-12 for x in jax.tree.leaves(out)
                        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating))
                return c + s, None
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=reps)
            return c

        args = jax.device_put(args, dev)
        s = run(*args); jax.block_until_ready(s)  # compile
        t0 = time.time()
        s = run(*args); s.block_until_ready()
        dt = (time.time() - t0) / reps
        print(f"{name:28s} {dt*1e3:8.2f} ms/iter", flush=True)
        return dt

    a = jnp.zeros(qpos.shape[:-1] + (80,), qpos.dtype)
    from kinpoly_tpu.envs.humanoid_ar import HumanoidAREnv  # noqa
    from kinpoly_tpu.models.traj_ar import step_ar

    env_obj = fn  # unused; we re-create piecewise closures below
    # rebuild the env from build_ar internals is awkward; instead re-run
    # build_ar's env via its closure on the rollout: time full step vs parts
    # using the module-level pieces
    import bench

    # full fused rollout iteration (the headline)
    t_full = None
    @jax.jit
    def full(c, p, cx):
        return fn(c, p, cx, 1)[1]
    c_dev = jax.device_put(carry, dev)
    p_dev = jax.device_put(params, dev)
    x_dev = jax.device_put(ctx, dev)
    s = full(c_dev, p_dev, x_dev); jax.block_until_ready(s)
    t0 = time.time(); s = full(c_dev, p_dev, x_dev); s.block_until_ready()
    t_full = time.time() - t0
    print(f"{'FULL rollout step x' + str(STEPS):28s} {t_full*1e3:8.2f} ms "
          f"({N * STEPS * model.n_substeps / t_full:,.0f} substeps/s)", flush=True)

    # parts
    timed("fk(qpos)", lambda q: fklib.fk(spec, q), qpos)
    timed("body_quat_sim", lambda q: fklib.body_quat_sim(spec, q), qpos)
    timed("control_step (15 substeps)",
          lambda s_, a_, q_: eng.control_step(
              model, s_, a_, q_[..., 7:],
              jnp.asarray([0.7071, 0.7071, 0, 0], qpos.dtype)),
          st.sim, jnp.zeros(qpos.shape[:-1] + (69 + model.ctrl.vf_dim,),
                            qpos.dtype), qpos)


if __name__ == "__main__":
    main()
