#!/bin/bash
# Bounded TPU-availability probe (round-4): exits 0 iff the tunneled axon
# backend initializes and executes a matmul within the timeout.
# Usage: tools/tpu_probe.sh [timeout_s]
T=${1:-90}
timeout "$T" env PYTHONPATH=/root/.axon_site python -c "
import jax, time
t = time.time()
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((128, 128))
s = float((x @ x).sum())
print(f'TPU UP: {d[0]} init+matmul {time.time()-t:.1f}s checksum {s}')
"
rc=$?
if [ $rc -ne 0 ]; then echo "TPU DOWN (rc=$rc after ${T}s)"; fi
exit $rc
