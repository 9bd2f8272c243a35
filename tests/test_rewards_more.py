"""dynamic_supervision v2/v3 reward formulas: identity -> max reward."""

import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.rl import rewards
from tests.mj_oracle import get_spec


def _unit_quats(rng, n):
    q = rng.randn(n, 4)
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).reshape(-1)


def _inputs(rng, spec, perfect=True):
    from kinpoly_tpu.config.defaults import b_diff_weights_pose

    bq = _unit_quats(rng, 24)
    wb = rng.randn(72)
    hp = np.concatenate([rng.randn(3), _unit_quats(rng, 1)])
    bang = rng.randn(72) * 0.1
    if perfect:
        tgt_bq, tgt_wb, tgt_hp = bq, wb, hp
        gt_bq, gt_wb, gt_bang = bq, wb, bang
    else:
        tgt_bq, tgt_wb = _unit_quats(rng, 24), wb + 0.5
        tgt_hp = np.concatenate([hp[:3] + 1.0, _unit_quats(rng, 1)])
        gt_bq, gt_wb, gt_bang = _unit_quats(rng, 24), wb + 0.5, bang + 1.0
    return rewards.ARRewardInputs(
        head_pose=jnp.asarray(hp), tgt_head_pose=jnp.asarray(tgt_hp),
        bquat=jnp.asarray(bq), wbpos=jnp.asarray(wb),
        tgt_bquat=jnp.asarray(tgt_bq), tgt_wbpos=jnp.asarray(tgt_wb),
        gt_bquat=jnp.asarray(gt_bq), gt_prev_bquat=jnp.asarray(gt_bq),
        gt_wbpos=jnp.asarray(gt_wb), gt_bangvel=jnp.asarray(gt_bang),
        bangvel=jnp.asarray(bang),
        b_diffw=jnp.asarray(b_diff_weights_pose(spec)),
    )


def test_dynamic_supervision_v2_identity_is_max():
    spec = get_spec()
    rng = np.random.RandomState(0)
    perfect = rewards.dynamic_supervision_v2(_inputs(rng, spec, True), {}, 1 / 30)
    rng = np.random.RandomState(0)
    off = rewards.dynamic_supervision_v2(_inputs(rng, spec, False), {}, 1 / 30)
    assert float(perfect[0]) > float(off[0])
    # perfect tracking: every component at its maximum (1.0)
    np.testing.assert_allclose(np.asarray(perfect[1]), 1.0, atol=1e-5)


def test_dynamic_supervision_v3_identity_is_max():
    spec = get_spec()
    rng = np.random.RandomState(1)
    perfect = rewards.dynamic_supervision_v3(_inputs(rng, spec, True), {}, 1 / 30)
    np.testing.assert_allclose(np.asarray(perfect[1]), 1.0, atol=1e-5)
    rng = np.random.RandomState(1)
    off = rewards.dynamic_supervision_v3(_inputs(rng, spec, False), {}, 1 / 30)
    assert float(perfect[0]) > float(off[0])
