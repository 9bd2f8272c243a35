"""Merge qpos banks into one UHC training pickle.

  python tools/merge_banks.py OUT BANK1 BANK2 ...

Takes {name: {"qpos": ...}} pickles (clips24 / hard12 / action_takes — extra
keys like obj_pose/action pass through untouched; train_uhc only reads qpos).
"""

import sys

import joblib

out, banks = sys.argv[1], sys.argv[2:]
merged = {}
for path in banks:
    for name, take in joblib.load(path).items():
        assert name not in merged, f"duplicate take {name}"
        merged[name] = take
joblib.dump(merged, out)
print(f"wrote {len(merged)} takes to {out}")
