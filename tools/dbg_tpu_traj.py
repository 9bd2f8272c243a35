"""Deterministic standing control_step rollout: TPU f32 vs CPU f32 drift."""
import os, sys
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
import joblib

cpu = jax.local_devices(backend='cpu')[0]
tpu = jax.devices()[0]

with jax.default_device(cpu):
    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.defaults import BASE_ROT, uhc_control_params
    from kinpoly_tpu.physics import engine as eng
    spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
    model = eng.build_model(spec, uhc_control_params(spec))
    standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
    q0 = np.asarray(standing['qpos'], np.float32)
    v0 = np.asarray(standing['qvel'], np.float32)

base_rot = jnp.asarray(BASE_ROT, jnp.float32)
kin = jnp.asarray(q0[7:])
act = jnp.zeros(75, jnp.float32)

def roll(qp, qv, n):
    def body(c, _):
        s = eng.control_step(model, eng.SimState(c[0], c[1]), act, kin, base_rot)
        return (s.qpos, s.qvel), s.qpos
    (_, _), qs = jax.lax.scan(body, (qp, qv), None, length=n)
    return qs

out = {}
for dev, name in [(cpu, 'cpu'), (tpu, 'tpu')]:
    with jax.default_device(dev):
        qs = np.asarray(jax.jit(lambda a, b: roll(a, b, 30))(
            jax.device_put(jnp.asarray(q0), dev), jax.device_put(jnp.asarray(v0), dev)))
        out[name] = qs
        print(name, 'z traj:', np.round(qs[::5, 2], 4), 'finite:', np.isfinite(qs).all(), flush=True)

d = np.abs(out['cpu'] - out['tpu'])
print('max diff per step (every 5):', np.round(d.max(axis=1)[::5], 5))
