"""Silent-freeze detection (VERDICT r4 #5): the round-4 incident class —
NaN gradients silently zeroed by optax.zero_nans — must be visible in the
metrics stream and must abort flat supervised phases.

The reference has no equivalent guard: its failure detector was a human
watching wandb (kin_poly/core/agent_ar.py:243-265)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinpoly_tpu.utils.liveness import (LivenessError,
                                        check_supervised_liveness,
                                        grad_nonfinite_fraction)


def test_grad_nonfinite_fraction_counts_leaves():
    g = {
        "a": jnp.ones((3, 2)),
        "b": jnp.array([1.0, jnp.nan]),
        "c": {"d": jnp.array([jnp.inf]), "e": jnp.zeros(4)},
    }
    # 2 of 4 leaves poisoned
    assert float(grad_nonfinite_fraction(g)) == pytest.approx(0.5)
    assert float(grad_nonfinite_fraction({"a": jnp.ones(3)})) == 0.0


def test_nan_cotangent_fires_counter_and_zero_nans_protects_params():
    """Inject a NaN into the batch -> NaN gradients. The counter must fire
    (grad_nan_frac ~ 1) while zero_nans keeps the params finite — exactly
    the silently-frozen state that must now be loud."""
    from tests.test_agent_ar import make_setup

    agent = make_setup()
    batch = agent._get_batch(agent.cfg.batch_size)
    qp = np.array(batch.qpos)
    qp[0, 0, 0] = np.nan
    poisoned = batch._replace(qpos=qp)
    params_before = agent.params
    rng = jax.random.PRNGKey(0)
    params, _, loss, info = agent._jit_full_sup(
        agent.params, agent.sup_opt_state, poisoned, rng, 0.3)
    # one poisoned frame hits the subset of leaves whose forward touches
    # it (~46% in this tiny setup) — what matters is that the counter
    # fires far above the warn threshold
    from kinpoly_tpu.utils.liveness import NAN_FRAC_WARN
    assert float(info["grad_nan_frac"]) > 4 * NAN_FRAC_WARN, \
        float(info["grad_nan_frac"])
    # zero_nans did its (dangerous) job: params stayed finite...
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(params))
    # ...and a clean batch reports a cold counter
    _, _, _, info2 = agent._jit_full_sup(
        params_before, agent.sup_opt_state, batch, rng, 0.3)
    assert float(info2["grad_nan_frac"]) == 0.0


def test_liveness_aborts_flat_loss_and_names_nan_cause():
    flat = [347.0] * 20
    with pytest.raises(LivenessError, match="did not drop"):
        check_supervised_liveness(flat, phase="full")
    # with a hot nan counter the diagnostic names the failure class
    with pytest.raises(LivenessError, match="zero_nans"):
        check_supervised_liveness(flat, phase="full",
                                  nan_fracs=[1.0] * 20)


def test_liveness_passes_learning_and_converged_curves():
    # healthy: 347 -> 0.7 (the post-fix r4 curve shape)
    losses = list(np.geomspace(347.0, 0.7, 30))
    check_supervised_liveness(losses, phase="full")
    # resumed-converged: starts below the floor, flat is fine
    check_supervised_liveness([0.5] * 20, phase="full")
    # too short to judge (smoke runs): no-op
    check_supervised_liveness([5.0, 5.0], phase="init")
    # non-finite loss is always fatal
    with pytest.raises(LivenessError, match="non-finite"):
        check_supervised_liveness([347.0] * 10 + [float("nan")] * 10)
