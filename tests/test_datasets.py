"""AMASS dataset sampling + occupancy maps + reward registry."""

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.anim import occupancy
from kinpoly_tpu.data.amass_dataset import AMASSDataset
from kinpoly_tpu.physics import contact as ct
from kinpoly_tpu.rl import rewards
from tests.mj_oracle import get_spec
from tests.test_traj_ar import make_dataset


def _takes():
    ds = make_dataset()
    return {f"take_{i}": {"qpos": t["qpos"]} for i, t in enumerate(ds.takes)}


def test_amass_dataset_sampling():
    ds = AMASSDataset(_takes(), t_min=10, t_max=40)
    rng = np.random.RandomState(0)
    w = ds.sample_seq(rng)
    assert 10 <= w["qpos"].shape[0] <= 40
    # adaptive: failing take_0 makes it MORE likely
    p0 = ds.sampling_probs()
    np.testing.assert_allclose(p0, [0.5, 0.5])
    ds.record_result("take_0", 0.1)
    ds.record_result("take_1", 1.0)
    p1 = ds.sampling_probs()
    assert p1[0] > p1[1]


def test_amass_dataset_bank():
    spec = get_spec()
    ds = AMASSDataset(_takes())
    bank = ds.to_bank(spec, dt=1 / 30)
    assert bank.qpos.shape[0] == 2
    assert np.isfinite(np.asarray(bank.qpos)).all()


def test_occupancy_map():
    spec = get_spec()
    scene = ct.scene_from_spec(spec)
    ds = make_dataset()
    qpos = jnp.asarray(ds.takes[0]["qpos"][0])

    n_obj = len(spec.objects)
    obj_qpos = np.zeros((n_obj, 7))
    obj_qpos[:, 3] = 1
    obj_qpos[0, :3] = [float(qpos[0]), float(qpos[1]), 0.5]  # chair at pelvis xy

    body_idx = np.asarray([spec.body_index("Pelvis")], np.int32)
    occ = occupancy.body_occupancy(spec, scene, qpos, jnp.asarray(obj_qpos),
                                   body_idx, obj_index=0, voxel_num=8)
    assert occ.shape == (1, 8, 8, 8)
    assert bool(occ.any())  # the chair overlaps the pelvis-local grid

    obj_qpos[0, :3] = [100, 100, 0.5]  # far away
    occ2 = occupancy.body_occupancy(spec, scene, qpos, jnp.asarray(obj_qpos),
                                    body_idx, obj_index=0, voxel_num=8)
    assert not bool(occ2.any())


def test_uhc_reward_registry():
    spec = get_spec()
    rng = np.random.RandomState(0)
    from kinpoly_tpu.config.defaults import b_diff_weights_pose, body_diff_weights

    def rand_quats(n):
        q = rng.randn(n, 4)
        return (q / np.linalg.norm(q, axis=-1, keepdims=True)).reshape(-1)

    inp = rewards.RewardInputs(
        bquat=jnp.asarray(rand_quats(24)), wbquat=jnp.asarray(rand_quats(24)),
        wbpos=jnp.asarray(rng.randn(72)), body_com=jnp.asarray(rng.randn(72)),
        com=jnp.asarray(rng.randn(3)), ee_wpos=jnp.asarray(rng.randn(15)),
        bangvel=jnp.asarray(rng.randn(72)), head_pose=jnp.asarray(rand_quats(1)[0:4]),
        e_bquat=jnp.asarray(rand_quats(24)), e_wbquat=jnp.asarray(rand_quats(24)),
        e_wbpos=jnp.asarray(rng.randn(72)), e_body_com=jnp.asarray(rng.randn(72)),
        e_com=jnp.asarray(rng.randn(3)), e_ee_wpos=jnp.asarray(rng.randn(15)),
        e_bangvel=jnp.asarray(rng.randn(72)),
        vf=jnp.asarray(rng.randn(6)),
        b_diffw=jnp.asarray(b_diff_weights_pose(spec)),
        jpos_diffw=jnp.asarray(body_diff_weights(spec)),
    )
    for name in ["world_rfc_implicit", "world_rfc_implicit_v1_mul",
                 "world_rfc_implicit_v2", "world_rfc_implicit_v3"]:
        fn = rewards.get_uhc_reward(name)
        r, comps = fn(inp, {})
        assert np.isfinite(float(r)), name
        assert np.isfinite(np.asarray(comps)).all(), name


def test_person_feature_extractor():
    """SPIN-pipeline-shaped frame features (data/video.py): bbox smoothing,
    square crop, ResNet encode."""
    import numpy as np
    from kinpoly_tpu.data import video

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (6, 96, 128, 3), np.uint8)
    boxes = np.tile([64.0, 48.0, 40.0, 60.0], (6, 1))
    boxes[3] += [30, 0, 0, 0]            # an outlier detection
    sm = video.smooth_bboxes(boxes, window=5)
    assert abs(sm[3, 0] - 64.0) < 1e-9   # median filter rejects the jump

    ex = video.PersonFeatureExtractor(feature_dim=32, crop_size=32)
    feats = ex(frames, boxes, batch=4)
    assert feats.shape == (6, 32)
    assert np.isfinite(feats).all()
    crop = video.crop_person(frames[0], boxes[0], out_size=32)
    assert crop.shape == (32, 32, 3)
    assert crop.min() >= -1.0 and crop.max() <= 1.0
