"""Scaling study driver (VERDICT r3 #6): runs bench.py across env counts and
solver paths in sequential subprocesses (one TPU job at a time on the
tunnel), collecting the JSON rows.

  python tools/bench_scaling.py [out.json]

Configs: UHC env x {pallas_ltdl, ltdl(jnp)} x {2048, 4096, 8192} and the AR
env (pallas) x {256, 1024, 2048}.
"""

import json
import os
import subprocess
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_scaling.json"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# kernel path at 3 sizes (flat-to-4096 claimed in r2; 8192 unprofiled),
# jnp/XLA path at the cliff endpoints, AR env at production batch sizes.
# (each config = fresh remote compiles; keep the grid tight)
RUNS = [
    dict(env="ar", solver="pallas_ltdl", pgs="1", n=1024),
    dict(env="ar", solver="pallas_ltdl", pgs="1", n=2048),
    dict(env="uhc", solver="ltdl", pgs="0", n=2048),
    dict(env="uhc", solver="ltdl", pgs="0", n=8192),
]

rows = []
for r in RUNS:
    env = dict(os.environ, BENCH_ENV=r["env"], BENCH_N_ENVS=str(r["n"]),
               BENCH_SOLVER=r["solver"], BENCH_PALLAS_PGS=r["pgs"])
    t0 = time.time()
    print(f"== {r} ==", flush=True)
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, capture_output=True, text=True, timeout=2400)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if line:
        row = json.loads(line[-1])
        row["config"] = r
        rows.append(row)
        print(f"   {row['value']:.0f} {row['unit']}  "
              f"({time.time()-t0:.0f}s wall)", flush=True)
    else:
        print(f"   FAILED rc={p.returncode}\n{p.stdout[-500:]}\n{p.stderr[-800:]}",
              flush=True)
        rows.append(dict(config=r, error=p.returncode))
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=1)
print(f"wrote {OUT}")
