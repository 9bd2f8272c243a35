"""Training-liveness guards against the silent-freeze failure class.

Round 4's root cause (commit c5e5efd): acos-based angle extraction produced
NaN cotangents at |w|=1, ``optax.zero_nans()`` in the supervised optimizer
chain silently zeroed the poisoned updates, and full-rollout supervised
training "ran" for two rounds while learning nothing. The reference's only
equivalent guard is a human watching a wandb loss curve
(kin_poly/core/agent_ar.py:243-265). These utilities make that failure mode
loud at the point it happens:

- :func:`grad_nonfinite_fraction` — jit-safe counter of how many gradient
  leaves ``zero_nans`` would zero this step (any non-finite entry in the
  leaf). Logged per update into the metrics JSONL.
- :func:`check_supervised_liveness` — host-side watchdog: a supervised
  phase whose loss does not drop is aborted with a diagnostic instead of
  silently continuing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# above this per-step fraction of zeroed gradient leaves, training is
# effectively frozen (round-4 incident: ~all leaves of the full-AR loss)
NAN_FRAC_WARN = 0.05


def grad_nonfinite_fraction(grads) -> jnp.ndarray:
    """Fraction of gradient leaves containing any non-finite value.

    Matches optax.zero_nans() granularity: that transform zeroes a whole
    leaf when any of its entries is NaN, so "fraction of leaves hit" is
    exactly the fraction of the parameter tree whose update this step
    silently became a no-op.
    """
    leaves = jax.tree_util.tree_leaves(grads)
    if not leaves:
        return jnp.asarray(0.0, jnp.float32)
    flags = [jnp.any(~jnp.isfinite(l)).astype(jnp.float32) for l in leaves]
    return sum(flags) / len(flags)


class LivenessError(RuntimeError):
    """A supervised training phase failed to learn (flat/rising loss)."""


def check_supervised_liveness(losses, phase: str = "supervised",
                              nan_fracs=None, min_drop: float = 0.10,
                              floor: float = 1.0, head: int = 5) -> None:
    """Abort if a supervised phase's loss curve is flat.

    losses: sampled losses in step order (the train_init yield stream).
    Requires median(last `head`) <= (1 - min_drop) * median(first `head`)
    UNLESS the phase started already converged (first median <= `floor`,
    e.g. a resumed checkpoint). Raises LivenessError with a diagnostic that
    names the likely cause when the zeroed-gradient counter was hot.
    """
    losses = [float(l) for l in losses]
    if len(losses) < 2 * head:
        return  # too short to judge (smoke runs, tests)
    first = float(np.median(losses[:head]))
    last = float(np.median(losses[-head:]))
    if not np.isfinite(first) or not np.isfinite(last):
        raise LivenessError(
            f"{phase}: non-finite loss (first-median {first}, last-median "
            f"{last}) — training diverged")
    if first <= floor:
        return  # started converged (warm resume); nothing to prove
    if last > (1.0 - min_drop) * first:
        hot = ""
        if nan_fracs is not None:
            nf = [float(x) for x in nan_fracs]
            if nf and float(np.mean(nf)) > NAN_FRAC_WARN:
                hot = (f" — zero_nans zeroed {np.mean(nf):.0%} of gradient "
                       f"leaves on average: the updates were silently "
                       f"discarded (round-4 NaN-gradient class; check the "
                       f"rotation-math VJPs, core/tmath.py)")
        raise LivenessError(
            f"{phase}: loss did not drop ({first:.4g} -> {last:.4g}, "
            f"needed -{min_drop:.0%}) over {len(losses)} samples{hot}")
