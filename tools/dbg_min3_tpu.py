"""Find a safe two-level dynamic gather formulation on TPU."""
import os, sys
sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

x = np.zeros((2, 120, 76), np.float32)
ref = np.arange(76).astype(np.float32) + 1.0
x[:, :] = ref  # every row identical -> any valid gather must return `ref`
xb = jnp.asarray(x)
length = jnp.asarray([120, 120], jnp.int32)
Z = jnp.zeros(64, jnp.int32)

def check(tag, out):
    out = np.asarray(out)
    ok = np.allclose(out, ref)
    print(tag, 'OK' if ok else f'CORRUPT (row0={np.round(out[0,:8],1)})', flush=True)

@jax.jit
def f_combined():
    def one(i):
        j = jnp.minimum(jnp.asarray(0, jnp.int32), length[i] - 1)
        return xb[i, j]
    return jax.vmap(one)(Z)
check('f x[i,j] combined ', f_combined())

@jax.jit
def g_dynidx():
    def one(i):
        j = jnp.minimum(jnp.asarray(0, jnp.int32), length[i] - 1)
        row = jax.lax.dynamic_index_in_dim(xb, i, 0, keepdims=False)
        return jax.lax.dynamic_index_in_dim(row, j, 0, keepdims=False)
    return jax.vmap(one)(Z)
check('g dynamic_index x2', g_dynidx())

@jax.jit
def h_take():
    def one(i):
        j = jnp.minimum(jnp.asarray(0, jnp.int32), length[i] - 1)
        row = jnp.take(xb, i, axis=0)
        return jnp.take(row, j, axis=0)
    return jax.vmap(one)(Z)
check('h take twice      ', h_take())

@jax.jit
def i_chain():
    def one(i):
        j = jnp.minimum(jnp.asarray(0, jnp.int32), length[i] - 1)
        return xb[i][j]
    return jax.vmap(one)(Z)
check('i x[i][j] chained ', i_chain())

@jax.jit
def j_fixedj():
    def one(i):
        return xb[i][jnp.asarray(0, jnp.int32)]
    return jax.vmap(one)(Z)
check('j x[i][traced 0]  ', j_fixedj())
