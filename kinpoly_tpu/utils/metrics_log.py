"""Training observability — the reference uses TensorBoard for UHC
(scripts/train_uhc.py:14,66-70) and wandb for kin-poly
(kin_poly/core/agent_ar.py:243-265). Both trainers here log through this
one sink: scalars go to (a) a JSONL stream (always; machine-readable,
zero deps) and (b) TensorBoard event files when `torch.utils.tensorboard`
is importable (it is in this image). wandb is hooked the same way when the
package + WANDB_API_KEY exist; otherwise silently skipped.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, out_dir: str, run_name: str = "run",
                 use_tensorboard: bool = True, use_wandb: bool = False,
                 config: dict | None = None):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._jsonl = open(os.path.join(out_dir, f"{run_name}_metrics.jsonl"),
                           "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(out_dir, "tb", run_name))
            except Exception:
                self._tb = None
        self._wandb = None
        if use_wandb and os.environ.get("WANDB_API_KEY"):
            try:
                import wandb
                self._wandb = wandb.init(project="kinpoly_tpu", name=run_name,
                                         config=config or {}, dir=out_dir)
            except Exception:
                self._wandb = None

    def log(self, step: int, scalars: dict, prefix: str = ""):
        flat = {}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            try:
                if hasattr(v, "__len__") and not isinstance(v, str):
                    for i, vi in enumerate(v):
                        flat[f"{key}/{i}"] = float(vi)
                else:
                    flat[key] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(
            dict(step=step, time=time.time(), **flat)) + "\n")
        if self._tb is not None:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(flat, step=step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
