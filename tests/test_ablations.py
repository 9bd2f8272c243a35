"""Ablation-config paths (VERDICT r1 item 7): use_context/use_of feature
threading, policy_v=2 residual policy, obs_dim consistency for all flag
combos (reference configs config/statear/{kin_only,use_of}.yml)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinpoly_tpu.models import policy_ar, traj_ar
from tests.mj_oracle import get_spec
from tests.test_traj_ar import make_dataset


@pytest.mark.parametrize("use_context,use_of,use_vel", [
    (False, False, False),
    (True, False, False),
    (False, True, False),
    (False, False, True),
    (True, False, True),
])
def test_obs_dim_consistency(use_context, use_of, use_vel):
    """ar_obs must produce exactly obs_dim(cfg) features for every flag
    combo (the round-1 gap: use_context/use_of produced an obs that
    disagreed with obs_dim)."""
    spec = get_spec()
    ds = make_dataset()
    rng = np.random.RandomState(2)
    cfg = traj_ar.TrajARConfig(rnn_hdim=32, mlp_hsize=(32,), of_dim=16,
                               use_context=use_context, use_of=use_of,
                               use_vel=use_vel)
    batch = ds.get_batch(rng, 2)
    if use_of:
        batch = batch._replace(of=np.zeros(batch.qpos.shape[:2] + (16,),
                                           np.float64))
    net = traj_ar.TrajARNet(spec=spec, cfg=cfg, as_policy=True)
    params = net.init(jax.random.PRNGKey(0), batch, 0.0, jax.random.PRNGKey(1))

    # the training rollout threads per-step context features
    feats = net.apply(params, batch, 0.0, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(feats["qpos"])).all()

    # direct obs builder with context feature
    ctx_t = (jnp.zeros((2, cfg.rnn_hdim)) if (use_context or use_of) else None)
    of_t = jnp.zeros((2, 16)) if use_of else None
    obs, _ = traj_ar.ar_obs(
        spec, cfg, batch.qpos[:, 0], batch.qvel[:, 0],
        batch.head_pose[:, 0], batch.head_vels[:, 0],
        batch.obj_pose[:, 0], batch.obj_head_relative_poses[:, 0],
        batch.action_one_hot[:, 0], of_t=of_t, context_feat_t=ctx_t,
        as_policy=True)
    assert obs.shape[-1] == traj_ar.obs_dim(cfg, as_policy=True), (
        obs.shape, traj_ar.obs_dim(cfg, as_policy=True))


def test_policy_v2_residual():
    """policy_v=2: action = delta + ar_qpos appended to the obs; 76-d."""
    spec = get_spec()
    ds = make_dataset()
    rng = np.random.RandomState(3)
    cfg = traj_ar.TrajARConfig(rnn_hdim=32, mlp_hsize=(32,))
    batch = ds.get_batch(rng, 2)
    pol = policy_ar.PolicyAR(spec, cfg, policy_v=2)
    assert pol.action_dim == 76
    params = pol.init_params(jax.random.PRNGKey(0), batch)
    assert set(params) == {"arnet", "delta"}

    d = traj_ar.obs_dim(cfg, as_policy=True) + 76
    ar_qpos = np.asarray(batch.qpos[:, 5])
    obs = jnp.concatenate(
        [jnp.zeros((2, d - 76)), jnp.asarray(ar_qpos)], axis=-1)
    carry = pol.init_carry((2,))
    carry2, mean = pol.action_mean(params, carry, obs)
    assert mean.shape == (2, 76)
    # residual structure: the mean stays near the appended AR pose at init
    assert float(jnp.abs(mean - ar_qpos).max()) < 5.0
    # init_context still runs through the arnet branch
    ctx = pol.init_context(params, batch)
    assert ctx["ar_qpos"].shape == batch.qpos.shape


def test_adaptive_window_sampling():
    """freq-dict-driven sampling prefers failing takes
    (statear_smpl_dataset.py:295)."""
    ds = make_dataset()
    rng = np.random.RandomState(0)
    # take 0 always succeeds, take 1 always fails
    freq = {0: [1.0] * 20, 1: [0.0] * 20}
    picks = [ds.sample_window(rng, freq_dict=freq, sampling_temp=0.1,
                              sampling_freq=1.0)[0] for _ in range(200)]
    counts = np.bincount(picks, minlength=2)
    assert counts[1] > counts[0] * 3, counts


def test_batch_true_lengths():
    ds = make_dataset()
    rng = np.random.RandomState(1)
    batch = ds.get_batch(rng, 8)
    assert batch.length is not None and batch.take_idx is not None
    assert (np.asarray(batch.length) <= ds.fr_num).all()
    assert (np.asarray(batch.length) >= 1).all()
