"""TrajARNet: shapes, rollout scan, loss decrease on a tiny overfit problem."""

import functools

import jax
import jax.numpy as jnp
import joblib
import numpy as np
import optax

from kinpoly_tpu.data import statear
from kinpoly_tpu.models import traj_ar
from tests.mj_oracle import get_spec

STANDING = "/root/reference/sample_data/standing_neutral.pkl"


@functools.lru_cache(maxsize=None)
def make_dataset():
    spec = get_spec()
    standing = joblib.load(STANDING)
    qpos = np.asarray(standing["qpos"])
    rng = np.random.RandomState(0)
    takes = []
    for k in range(2):
        T = 60
        seq = np.repeat(qpos[None], T, axis=0)
        seq[:, :2] += np.cumsum(rng.uniform(-0.004, 0.004, (T, 2)), axis=0)
        seq[:, 7:] += np.cumsum(rng.uniform(-0.01, 0.01, (T, 69)), axis=0)
        obj = np.zeros((T, 7))
        obj[:, :3] = [1.0, 0.5, 0.4]
        obj[:, 3] = 1.0
        takes.append(statear.derive_features(spec, seq, obj, action="sit"))
    return statear.StateARDataset(takes, fr_num=24)


def test_derive_features_shapes():
    ds = make_dataset()
    t = ds.takes[0]
    T = t["qpos"].shape[0]
    assert t["head_vels"].shape == (T, 6)
    assert t["obj_head_relative_poses"].shape == (T, 7)
    assert t["target"].shape == (T, 80)
    assert np.isfinite(t["target"]).all()


def test_forward_rollout_shapes_and_finite():
    spec = get_spec()
    ds = make_dataset()
    rng = np.random.RandomState(1)
    batch = ds.get_batch(rng, 2)
    cfg = traj_ar.TrajARConfig(rnn_hdim=64, mlp_hsize=(64, 32))
    net = traj_ar.TrajARNet(spec=spec, cfg=cfg)
    params = net.init(jax.random.PRNGKey(0), batch, 0.0, jax.random.PRNGKey(1))
    feats = jax.jit(lambda p, b: net.apply(p, b, 0.0, jax.random.PRNGKey(2)))(params, batch)
    B, T = batch.qpos.shape[:2]
    assert feats["qpos"].shape == (B, T, 76)
    assert feats["action"].shape == (B, T, 80)
    assert feats["pred_wbpos"].shape == (B, T, 72)
    for v in feats.values():
        assert np.isfinite(np.asarray(v)).all()
    loss, info = traj_ar.compute_loss(cfg, feats, batch)
    assert np.isfinite(float(loss))


def test_step_ar_integrates_gt_velocity():
    """Feeding the dataset's own target as the action must reproduce the next
    GT frame (the reference's 'Debugging GT' pathway, traj_ar_smpl_net:361)."""
    spec = get_spec()
    ds = make_dataset()
    cfg = traj_ar.TrajARConfig()
    take = ds.takes[0]
    qpos = jnp.asarray(take["qpos"])
    target = jnp.asarray(take["target"])
    nxt = traj_ar.step_ar(qpos[:-1], target[:-1], cfg)
    err_xy = np.abs(np.asarray(nxt[..., :2] - qpos[1:, :2]))
    # xy comes from integrating the heading-frame linear velocity
    assert err_xy.max() < 1e-6, err_xy.max()
    # root quat from integrating angular velocity
    dots = np.abs(np.sum(np.asarray(nxt[:, 3:7]) * np.asarray(qpos[1:, 3:7]), axis=-1))
    # acos-based axis extraction loses ~sqrt(eps) precision for tiny rotations
    np.testing.assert_allclose(dots, 1.0, atol=1e-6)
    # body pose / z are copied from the action; the has_z target carries the
    # *current* frame's pose (the reference leaves the AR shift commented out,
    # statear_smpl_dataset.py:160-170), so step(target[t]) lands on pose[t]
    np.testing.assert_allclose(np.asarray(nxt[:, 7:]), np.asarray(qpos[:-1, 7:]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(nxt[:, 2]), np.asarray(qpos[:-1, 2]), atol=1e-10)


def test_overfit_tiny():
    """A few Adam steps on one batch must reduce the supervised loss."""
    spec = get_spec()
    ds = make_dataset()
    rng = np.random.RandomState(2)
    batch = ds.get_batch(rng, 2)
    cfg = traj_ar.TrajARConfig(rnn_hdim=32, mlp_hsize=(32,), add_noise=False)
    net = traj_ar.TrajARNet(spec=spec, cfg=cfg)
    params = net.init(jax.random.PRNGKey(0), batch, 0.0, jax.random.PRNGKey(1))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            feats = net.apply(p, batch, 0.0, key)
            loss, _ = traj_ar.compute_loss(cfg, feats, batch)
            return loss
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(12):
        params, opt_state, loss = step(params, opt_state, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses
