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
    # v3 gained the reference's AR action-supervision terms (rp/rq/act_p,
    # kin_poly/core/reward_function.py:1090-1111) in round 2; covered with
    # the other variants in test_dynamic_supervision_v3_v6_identity_and_order.
    pass


def _ar_inputs_full(rng, spec, perfect=True):
    base = _inputs(rng, spec, perfect)
    q = rng.randn(76); q[3:7] /= np.linalg.norm(q[3:7])
    tgt_q = q if perfect else q + 0.3
    ar_bq = base.tgt_bquat if perfect else jnp.asarray(_unit_quats(rng, 24))
    return base._replace(
        tgt_qpos=jnp.asarray(tgt_q), ar_qpos=jnp.asarray(q),
        ar_bquat=ar_bq, ar_prev_bquat=ar_bq, prev_bquat=base.bquat)


def test_dynamic_supervision_v3_v6_identity_and_order():
    spec = get_spec()
    for name in ("dynamic_supervision_v3", "dynamic_supervision_v4",
                 "dynamic_supervision_v5", "dynamic_supervision_v6"):
        fn = rewards.get_kin_poly_reward(name)
        rng = np.random.RandomState(7)
        r_perfect, comps = fn(_ar_inputs_full(rng, spec, True), {}, 1 / 30)
        rng = np.random.RandomState(7)
        r_off, _ = fn(_ar_inputs_full(rng, spec, False), {}, 1 / 30)
        assert np.isfinite(float(r_perfect)) and np.isfinite(float(r_off))
        assert float(r_perfect) > float(r_off), name
        # v4's hv component is pinned to 0 in the reference
        keep = np.asarray(comps)
        if name == "dynamic_supervision_v4":
            keep = np.delete(keep, 2)
        np.testing.assert_allclose(keep, 1.0, atol=1e-5, err_msg=name)


def test_legacy_kin_poly_ids_raise():
    import pytest
    for rid in ("deep_mimic", "quat_v2"):
        with pytest.raises(KeyError):
            rewards.get_kin_poly_reward(rid)
    with pytest.raises(KeyError):
        rewards.get_kin_poly_reward("not_a_reward")


def _fine_tune_inputs(rng, perfect=True, dt=1.0 / 30.0):
    """FineTuneInputs with consistent head-velocity features: e_head_vel is
    the fd velocity of the (prev -> cur) head pair, so perfect tracking
    means every kernel sees zero distance."""
    from kinpoly_tpu.core import tmath as tm

    def q(n):
        x = rng.randn(n, 4)
        return (x / np.linalg.norm(x, axis=-1, keepdims=True)).reshape(-1)

    prev_h = np.concatenate([rng.randn(3), q(1)]).astype(np.float64)
    cur_h = np.concatenate([prev_h[:3] + 0.01 * rng.randn(3), q(1)])
    hvel = np.concatenate([
        (cur_h[:3] - prev_h[:3]) / dt,
        np.asarray(tm.angvel_fd(jnp.asarray(prev_h[3:]),
                                jnp.asarray(cur_h[3:]), dt)),
    ])
    bq = q(23)
    act = rng.randn(75)
    if perfect:
        e_h, e_hvel, e_bq, old = cur_h, hvel, bq, act
    else:
        e_h = np.concatenate([cur_h[:3] + 0.3, q(1)])
        e_hvel = hvel + 1.0
        e_bq, old = q(23), act + 0.5
    j = jnp.asarray
    return rewards.FineTuneInputs(
        head_pose=j(cur_h), prev_head_pose=j(prev_h), e_head_pose=j(e_h),
        e_head_vel=j(e_hvel), bquat=j(bq), e_bquat=j(e_bq),
        action=j(act), old_action=j(old),
        end_reward=jnp.asarray(2.0), is_end=jnp.asarray(False))


def test_fine_tune_rewards_identity_and_ordering():
    """fine_tune trio (reference kin_poly/core/reward_function.py:740-930):
    perfect head/pose/action tracking scores ~1 per component and beats
    imperfect tracking; the end bonus applies additively (kin/action) or
    multiplicatively (fine_tune_reward)."""
    dt = 1.0 / 30.0
    for rid, fn in rewards.FINE_TUNE_REWARDS.items():
        inp_p = _fine_tune_inputs(np.random.RandomState(5), True, dt)
        inp_o = _fine_tune_inputs(np.random.RandomState(5), False, dt)
        r_perf, comps = fn(inp_p, {}, dt)
        r_off, _ = fn(inp_o, {}, dt)
        assert float(r_perf) > float(r_off), rid
        np.testing.assert_allclose(np.asarray(comps), 1.0, atol=1e-4,
                                   err_msg=rid)
        assert callable(rewards.get_kin_poly_reward(rid))
        # end-of-episode bonus semantics
        inp_end = inp_p._replace(is_end=jnp.asarray(True))
        r_end, _ = fn(inp_end, {}, dt)
        if rid == "fine_tune_kin_action_reward":   # w_end defaults to 0
            np.testing.assert_allclose(float(r_end), float(r_perf), atol=1e-6)
        else:
            assert float(r_end) > float(r_perf), rid


def _uhc_inputs(rng, spec, perfect=True):
    from kinpoly_tpu.config.defaults import b_diff_weights_pose, body_diff_weights

    bq = _unit_quats(rng, 24)
    wq = _unit_quats(rng, 24)
    wb, bc = rng.randn(72), rng.randn(72)
    com, ee = rng.randn(3), rng.randn(15)
    bang = rng.randn(72) * 0.1
    q = rng.randn(76); q[3:7] /= np.linalg.norm(q[3:7])
    rq = rng.randn(4); rq /= np.linalg.norm(rq)
    rl, ra, eep = rng.randn(3), rng.randn(3), rng.randn(15)
    d = 0.0 if perfect else 0.4
    dq = lambda n: _unit_quats(rng, n) if not perfect else None
    return rewards.RewardInputs(
        bquat=jnp.asarray(bq), wbquat=jnp.asarray(wq), wbpos=jnp.asarray(wb),
        body_com=jnp.asarray(bc), com=jnp.asarray(com), ee_wpos=jnp.asarray(ee),
        bangvel=jnp.asarray(bang), head_pose=None,
        e_bquat=jnp.asarray(dq(24) if not perfect else bq),
        e_wbquat=jnp.asarray(dq(24) if not perfect else wq),
        e_wbpos=jnp.asarray(wb + d), e_body_com=jnp.asarray(bc + d),
        e_com=jnp.asarray(com + d), e_ee_wpos=jnp.asarray(ee + d),
        e_bangvel=jnp.asarray(bang + d),
        vf=jnp.zeros(6),
        vf_cp=jnp.zeros((24, 3)), vf_force=jnp.zeros((24, 6)),
        qpos=jnp.asarray(q), rq_rmh=jnp.asarray(rq),
        rlinv_local=jnp.asarray(rl), rangv=jnp.asarray(ra),
        ee_pos=jnp.asarray(eep),
        e_qpos=jnp.asarray(q + d), e_rq_rmh=jnp.asarray(
            dq(1) if not perfect else rq),
        e_rlinv_local=jnp.asarray(rl + d), e_rangv=jnp.asarray(ra + d),
        e_ee_pos=jnp.asarray(eep + d),
        b_diffw=jnp.asarray(b_diff_weights_pose(spec)),
        jpos_diffw=jnp.asarray(body_diff_weights(spec)),
    )


def test_uhc_registry_matches_reference_ids():
    ref_ids = {"local_rfc_implicit", "local_rfc_explicit", "world_rfc_implicit",
               "world_rfc_implicit_v1_mul", "world_rfc_explicit",
               "world_rfc_implicit_v2", "world_rfc_implicit_v3"}
    assert set(rewards.UHC_REWARDS) == ref_ids
    # no silent aliases: every entry must be a distinct function object
    # except genuinely shared math
    assert rewards.UHC_REWARDS["local_rfc_implicit"] is not rewards.UHC_REWARDS["world_rfc_implicit"]
    assert rewards.UHC_REWARDS["local_rfc_explicit"] is not rewards.UHC_REWARDS["local_rfc_implicit"]
    assert rewards.UHC_REWARDS["world_rfc_explicit"] is not rewards.UHC_REWARDS["world_rfc_implicit"]


def test_uhc_rewards_identity_and_order():
    spec = get_spec()
    for rid, fn in rewards.UHC_REWARDS.items():
        rng = np.random.RandomState(3)
        r1, comps = fn(_uhc_inputs(rng, spec, True), {})
        rng = np.random.RandomState(3)
        r0, _ = fn(_uhc_inputs(rng, spec, False), {})
        assert np.isfinite(float(r1)), rid
        assert float(r1) > float(r0), rid
        # identity inputs -> every active component at its max
        c = np.asarray(comps)
        assert c.max() <= 1.0 + 1e-6, rid
        assert c[0] > 1 - 1e-5, rid  # pose term maxed


def test_local_vs_world_distinct():
    """local_rfc_implicit must respond to root-frame features that
    world_rfc_implicit ignores (the round-1 alias trap)."""
    spec = get_spec()
    rng = np.random.RandomState(5)
    inp = _uhc_inputs(rng, spec, True)
    # perturb only the local root-velocity feature
    inp2 = inp._replace(e_rlinv_local=inp.e_rlinv_local + 2.0)
    w = rewards.UHC_REWARDS["world_rfc_implicit"]
    l = rewards.UHC_REWARDS["local_rfc_implicit"]
    assert float(w(inp, {})[0]) == float(w(inp2, {})[0])
    assert float(l(inp, {})[0]) != float(l(inp2, {})[0])


def _im_inputs(rng, spec, perfect=True):
    """UHC-env-style RewardInputs with every field the legacy imitation
    rewards read (kin_poly/core/reward_function.py:5-739)."""
    from kinpoly_tpu.config.defaults import b_diff_weights_pose
    from kinpoly_tpu.core import tmath

    bq = _unit_quats(rng, 24)
    wbq = _unit_quats(rng, 24)
    wb, bcom = rng.randn(72), rng.randn(72)
    com, ee_w, ee_l = rng.randn(3), rng.randn(15), rng.randn(15)
    bang = rng.randn(72) * 0.1
    qpos = np.concatenate([rng.randn(3), _unit_quats(rng, 1), rng.randn(69) * 0.2])
    rlinv, rangv = rng.randn(3), rng.randn(3)
    if perfect:
        e = dict(bq=bq, wbq=wbq, wb=wb, bcom=bcom, com=com, ee_w=ee_w,
                 ee_l=ee_l, bang=bang, qpos=qpos, rlinv=rlinv, rangv=rangv)
    else:
        e = dict(bq=_unit_quats(rng, 24), wbq=_unit_quats(rng, 24),
                 wb=wb + 0.4, bcom=bcom + 0.4, com=com + 0.3, ee_w=ee_w + 0.4,
                 ee_l=ee_l + 0.4, bang=bang + 0.5,
                 qpos=np.concatenate([qpos[:3] + 0.5, _unit_quats(rng, 1),
                                      qpos[7:] + 0.3]),
                 rlinv=rlinv + 0.6, rangv=rangv + 0.6)
    j = jnp.asarray
    rq_rmh = tmath.de_heading(j(qpos[3:7]))
    e_rq_rmh = tmath.de_heading(j(e["qpos"][3:7]))
    return rewards.RewardInputs(
        bquat=j(bq), wbquat=j(wbq), wbpos=j(wb), body_com=j(bcom), com=j(com),
        ee_wpos=j(ee_w), bangvel=j(bang), head_pose=None,
        e_bquat=j(e["bq"]), e_wbquat=j(e["wbq"]), e_wbpos=j(e["wb"]),
        e_body_com=j(e["bcom"]), e_com=j(e["com"]), e_ee_wpos=j(e["ee_w"]),
        e_bangvel=j(e["bang"]),
        vf=j(rng.randn(6) * 0.01),
        qpos=j(qpos), rq_rmh=rq_rmh, rlinv=j(rlinv),
        rlinv_local=j(rlinv), rangv=j(rangv), ee_pos=j(ee_l),
        e_qpos=j(e["qpos"]), e_rq_rmh=e_rq_rmh, e_rlinv=j(e["rlinv"]),
        e_rlinv_local=j(e["rlinv"]), e_rangv=j(e["rangv"]), e_ee_pos=j(e["ee_l"]),
        b_diffw=jnp.asarray(b_diff_weights_pose(spec)),
    )


def test_legacy_imitation_rewards_identity_and_ordering():
    """Every ported legacy id: perfect tracking scores ~1 per component
    (except the residual-force kernel, which sees a small nonzero vf) and
    beats imperfect tracking."""
    spec = get_spec()
    for rid, fn in rewards.LEGACY_IMITATION_REWARDS.items():
        r_perf, comps = fn(_im_inputs(np.random.RandomState(3), spec, True), {})
        r_off, _ = fn(_im_inputs(np.random.RandomState(3), spec, False), {})
        assert float(r_perf) > float(r_off), rid
        c = np.asarray(comps)
        if rid == "deep_mimic_reward_v2_vf":
            c = c[..., :-1]   # vf kernel is < 1 by construction
        np.testing.assert_allclose(c, 1.0, atol=1e-3, err_msg=rid)


def test_legacy_ids_dispatch():
    """Registry semantics: imitation ids resolve via the UHC registry, the
    AR registry redirects them, and the fine_tune trio resolves directly."""
    import pytest

    for rid in rewards.LEGACY_IMITATION_REWARDS:
        assert callable(rewards.get_uhc_reward(rid))
        with pytest.raises(KeyError, match="imitation"):
            rewards.get_kin_poly_reward(rid)
    for rid in rewards.FINE_TUNE_REWARDS:
        assert callable(rewards.get_kin_poly_reward(rid))


def test_legacy_reward_through_env_dispatch():
    """A full env.step with reward_id='quat_v2' (NEEDS_LOCAL id that is not
    'local_'-prefixed) builds the local features and returns finite reward."""
    import jax

    from tests.test_env_uhc import make_env

    env = make_env()
    import dataclasses
    env2 = type(env).__new__(type(env))
    env2.__dict__.update(env.__dict__)
    env2.cfg = dataclasses.replace(env.cfg, reward_id="quat_v2")
    st, obs = env2.reset(jax.random.PRNGKey(0), jnp.asarray(0))
    a = jnp.zeros(env2.action_dim)
    st2, obs2, r, d, info = jax.jit(env2.step)(st, a)
    assert np.isfinite(float(r)) and 0.0 <= float(r) <= 1.1
