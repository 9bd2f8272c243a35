#!/usr/bin/env python
"""Summarize the PPO-liveness A/B (VERDICT r3 #5).

Reads the metrics JSONL of two train_ar_policy arms (rl_update on vs off)
started from the SAME checkpoint, and prints a per-window comparison of the
quantities that distinguish "PPO contributes" from "training is BC-only":

  reward_mean / fail_frac   — the outcome metrics
  ratio_dev                 — mean |ratio - 1| over PPO minibatches (0 would
                              mean the surrogate cannot produce a gradient)
  ppo_grad_norm             — norm of d(surrogate)/d(params) alone
  adv_std                   — GAE advantage spread entering the surrogate

Reference behaviour being tested: kin_poly/core/agent_ar.py:682-792 collects
mean-action rollouts (:545-547), so the FIRST-pass surrogate is ~0 by
construction; liveness shows up in the later PPO epochs once the policy
moves (ratio_dev > 0) and in the outcome curves diverging between arms.

Usage: python tools/ppo_ab_report.py <on.jsonl> <off.jsonl> [window]
"""

import json
import sys

import numpy as np


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def windows(rows, keys, w):
    out = []
    for s in range(0, len(rows), w):
        chunk = rows[s:s + w]
        out.append({k: float(np.mean([r.get(k, 0.0) for r in chunk]))
                    for k in keys} | {"epochs": f"{chunk[0]['step']}-{chunk[-1]['step']}"})
    return out


def main():
    on_path, off_path = sys.argv[1], sys.argv[2]
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    keys = ["reward_mean", "fail_frac", "bc_loss",
            "ratio_dev", "ppo_grad_norm", "adv_std"]
    on, off = load(on_path), load(off_path)
    n = min(len(on), len(off))
    if n == 0:
        print("no overlapping epochs yet"); return
    print(f"{'epochs':>12} | {'arm':>3} | " + " | ".join(f"{k:>13}" for k in keys))
    for win_on, win_off in zip(windows(on[:n], keys, w), windows(off[:n], keys, w)):
        for tag, win in (("on", win_on), ("off", win_off)):
            print(f"{win['epochs']:>12} | {tag:>3} | "
                  + " | ".join(f"{win[k]:13.4f}" for k in keys))

    # liveness verdict: the PPO term is alive iff its gradient pathway is
    # nonzero where enabled, and dead-by-construction where disabled
    on_g = float(np.mean([r.get("ppo_grad_norm", 0.0) for r in on[:n]]))
    on_rd = float(np.mean([r.get("ratio_dev", 0.0) for r in on[:n]]))
    dr = (np.mean([r["reward_mean"] for r in on[:n][-max(1, n // 4):]])
          - np.mean([r["reward_mean"] for r in off[:n][-max(1, n // 4):]]))
    df = (np.mean([r["fail_frac"] for r in on[:n][-max(1, n // 4):]])
          - np.mean([r["fail_frac"] for r in off[:n][-max(1, n // 4):]]))
    print(f"\nover {n} shared epochs:")
    print(f"  PPO pathway (on-arm): mean ppo_grad_norm {on_g:.4f}, mean |ratio-1| {on_rd:.5f}"
          f" -> {'ALIVE' if on_g > 1e-4 and on_rd > 1e-5 else 'DEAD'}")
    print(f"  outcome delta (on - off, last quarter): reward {dr:+.4f}, fail_frac {df:+.4f}")


if __name__ == "__main__":
    main()
