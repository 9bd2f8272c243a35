"""Narrow the index_clip+frame corruption."""
import os, sys
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
import joblib

cpu = jax.local_devices(backend='cpu')[0]
with jax.default_device(cpu):
    from kinpoly_tpu.anim.mjcf import parse_humanoid
    from kinpoly_tpu.config.defaults import uhc_control_params
    from kinpoly_tpu.data import expert as exlib
    from kinpoly_tpu.physics import engine as eng
    spec = parse_humanoid('/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh_all.xml')
    model = eng.build_model(spec, uhc_control_params(spec))
    standing = joblib.load('/root/reference/sample_data/standing_neutral.pkl')
    q = np.asarray(standing['qpos'], np.float32)
    clip = exlib.from_qpos(spec, np.repeat(q[None], 120, 0), dt=model.control_dt, pad_to=120)
    bank = exlib.stack_bank([clip])

Z = jnp.zeros(64, jnp.int32)

def rep(tag, x):
    x = np.asarray(x)
    print(tag, 'quat:', np.round(x[0, 3:7], 4), 'y:', round(float(x[0, 1]), 4), flush=True)

# a) no vmap, single env
@jax.jit
def a():
    c = exlib.index_clip(bank, jnp.asarray(0, jnp.int32))
    f = exlib.frame(c, jnp.asarray(0, jnp.int32))
    return f.qpos[None]
rep('a no-vmap      ', a())

# b) vmap, qpos only (manual)
@jax.jit
def b():
    def one(i):
        qc = bank.qpos[i]
        ln = bank.length[i]
        idx = jnp.minimum(jnp.asarray(0, jnp.int32), ln - 1)
        return qc[idx]
    return jax.vmap(one)(Z)
rep('b vmap-qpos    ', b())

# c) vmap, tree.map index_clip + static 0
@jax.jit
def c():
    def one(i):
        cc = exlib.index_clip(bank, i)
        return cc.qpos[0]
    return jax.vmap(one)(Z)
rep('c vmap-tree+0  ', c())

# d) vmap, full frame
@jax.jit
def d():
    def one(i):
        cc = exlib.index_clip(bank, i)
        f = exlib.frame(cc, jnp.asarray(0, jnp.int32))
        return f.qpos
    return jax.vmap(one)(Z)
rep('d vmap-frame   ', d())

# e) like d but return several fields
@jax.jit
def e():
    def one(i):
        cc = exlib.index_clip(bank, i)
        f = exlib.frame(cc, jnp.asarray(0, jnp.int32))
        return f.qpos, f.qvel, f.head_pose
    return jax.vmap(one)(Z)
qq, vv, hh = e()
rep('e multi-field  ', qq)
print('e qvel[0,:6]:', np.round(np.asarray(vv)[0, :6], 4), 'head:', np.round(np.asarray(hh)[0], 3), flush=True)
