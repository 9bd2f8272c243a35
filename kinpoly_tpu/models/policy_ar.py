"""PolicyAR — TrajARNet wrapped as a recurrent Gaussian RL policy
(port of ``kin_poly/models/policy_ar.py``, policy_v=1).

The reference keeps a stateful step-GRU inside the policy and, during PPO
updates, scatters the flat step batch into an [episode x max_len] grid to
re-run it sequentially (policy_ar.py:104-122, 216-234). Here rollouts are
already (T, N)-shaped, so the train-time re-run is a single `lax.scan` over
the time axis with the GRU carry masked to zero at episode boundaries — the
scatter/gather machinery disappears.

`init_context` reproduces the eval-time preprocessing: full-window AR
rollout -> gaussian smoothing (sigma=1) of the poses -> feet-height fix
(policy_ar.py:124-182).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kinpoly_tpu.models import nets
from kinpoly_tpu.models.traj_ar import (ClipData, TrajARConfig, TrajARNet,
                                        compute_loss_lite, step_ar_with_vel)
from kinpoly_tpu.physics import fk as fklib


def gaussian_filter1d_time(x: jax.Array, sigma: float = 1.0) -> jax.Array:
    """scipy.ndimage.gaussian_filter1d along axis -2 (time), reflect mode."""
    radius = int(4.0 * sigma + 0.5)
    t = np.arange(-radius, radius + 1)
    w = np.exp(-0.5 * (t / sigma) ** 2)
    w = jnp.asarray(w / w.sum(), x.dtype)
    xp = jnp.concatenate(
        [x[..., radius - 1::-1, :] if radius > 0 else x[..., :0, :],
         x,
         x[..., :-radius - 1:-1, :]], axis=-2)
    # depthwise conv over time via dot with shifted windows
    T = x.shape[-2]
    idx = jnp.arange(T)[:, None] + jnp.arange(2 * radius + 1)[None, :]
    windows = xp[..., idx, :]                      # (..., T, K, D)
    return jnp.einsum("...tkd,k->...td", windows, w)


class ActionDeltaNet(nets.nn.Module):
    """policy_v=2 head (reference policy_ar.py:39-52, 190-198): a separate
    GRU+MLP predicting a residual on the AR rollout pose appended to the obs;
    action = action_delta + action_ar, action_dim = 76 (full qpos)."""
    rnn_hdim: int = 512
    mlp_hsize: tuple = (512, 256)
    htype: str = "relu"
    action_dim: int = 76

    def setup(self):
        self.rnn = nets.nn.GRUCell(features=self.rnn_hdim)
        self.mlp = nets.MLP(self.mlp_hsize, self.htype)
        # zero-init the residual head: at the warm start the policy is then
        # exactly the supervised AR rollout instead of AR + lecun noise on a
        # 76-dim qpos (the reference uses a default-init Linear and relies on
        # the noise being small; zero is the residual-policy standard)
        self.fc = nets.nn.Dense(
            self.action_dim, kernel_init=nets.nn.initializers.zeros_init())

    def __call__(self, carry, obs):
        action_ar = obs[..., -self.action_dim:]
        carry, x = self.rnn(carry, obs)
        delta = self.fc(self.mlp(x))
        return carry, delta + action_ar


class PolicyAR:
    """Host-side bundle: TrajARNet module + Gaussian head constants.

    policy_v=1: the TrajARNet step-GRU is the policy (action 80-d kinematic
    update). policy_v=2: a residual GRU head on the AR rollout pose (action
    76-d qpos, env integrates it verbatim); the TrajARNet ('old arnet') is
    only used for init_context. Reference kin_poly/models/policy_ar.py:33-52.
    """

    def __init__(self, spec, kin_cfg: TrajARConfig, log_std: float = -3.2,
                 policy_v: int = 1):
        self.spec = spec
        self.cfg = kin_cfg
        self.policy_v = policy_v
        self.net = TrajARNet(spec=spec, cfg=kin_cfg, as_policy=True)
        self.log_std = log_std
        if policy_v == 2:
            self.delta_net = ActionDeltaNet()
            self.action_dim = 76
            self.carry_dim = self.delta_net.rnn_hdim
        else:
            self.action_dim = kin_cfg.action_dim
            self.carry_dim = kin_cfg.rnn_hdim

    def init_params(self, rng, example_data: ClipData):
        k1, k2 = jax.random.split(rng)
        arnet = self.net.init(k1, example_data, 0.0, jax.random.PRNGKey(0))
        if self.policy_v == 2:
            from kinpoly_tpu.models.traj_ar import obs_dim
            d = obs_dim(self.cfg, as_policy=True) + 76
            delta = self.delta_net.init(
                k2, jnp.zeros((1, self.carry_dim)), jnp.zeros((1, d)))
            return {"arnet": arnet, "delta": delta}
        return arnet

    def _arnet_params(self, params):
        return params["arnet"] if self.policy_v == 2 else params

    # -- acting ---------------------------------------------------------------

    def init_carry(self, batch_shape=(), dtype=jnp.float32):
        return jnp.zeros(batch_shape + (self.carry_dim,), dtype)

    def action_mean(self, params, gru_carry, obs):
        """One recurrent policy step -> (new_carry, action mean)."""
        if self.policy_v == 2:
            return self.delta_net.apply(params["delta"], gru_carry, obs)
        return self.net.apply(params, gru_carry, obs, method=TrajARNet.action)

    def distribution(self, params, gru_carry, obs):
        carry, mean = self.action_mean(params, gru_carry, obs)
        log_std = jnp.full_like(mean, self.log_std)
        return carry, mean, log_std

    # -- train-time sequence re-run (replaces episode scatter/gather) ---------

    def action_means_over_time(self, params, obs_tn: jax.Array,
                               prev_masks_tn: jax.Array):
        """Re-run the step GRU over a (T, N, obs) grid; the carry is zeroed
        where the previous step ended an episode (mask==0), reproducing the
        reference's per-episode rnn initialization."""
        N = obs_tn.shape[1]
        carry0 = self.init_carry((N,), obs_tn.dtype)

        def step(carry, xs):
            obs, prev_mask = xs
            carry = carry * prev_mask[:, None]
            carry, mean = self.action_mean(params, carry, obs)
            return carry, mean

        _, means = jax.lax.scan(step, carry0, (obs_tn, prev_masks_tn))
        return means

    # -- init_context (policy_ar.py:124-182) ----------------------------------

    def init_context(self, params, data: ClipData, smooth: bool = True,
                     fix_height: bool = True, rng=None):
        """Full-window AR rollout + smoothing + feet fix. Returns a dict of
        (B, T, ...) arrays: ar_qpos, ar_qvel, ar_wbpos, ar_wbquat, ar_bquat,
        init_qpos, init_qvel."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        ap = self._arnet_params(params)
        feats = self.net.apply(ap, data, 0.0, rng, False)
        qpos0, qvel0, ctx_feat = self.net.apply(
            ap, data, method=TrajARNet.init_states)

        ar_qpos = feats["qpos"]
        ar_qvel = feats["qvel"]
        toe_l = self.spec.body_index("L_Toe")
        toe_r = self.spec.body_index("R_Toe")
        offset = 0.01

        init_qpos = qpos0
        if smooth:
            if fix_height:
                fk0 = fklib.fk(self.spec, init_qpos)
                feet = jnp.minimum(fk0.xpos[..., toe_l, 2], fk0.xpos[..., toe_r, 2]) - offset
                init_qpos = init_qpos.at[..., 2].add(-feet)

            body = gaussian_filter1d_time(ar_qpos[..., 7:], 1.0)
            ar_qpos = jnp.concatenate([ar_qpos[..., :7], body], axis=-1)
            if fix_height:
                fk_first = fklib.fk(self.spec, ar_qpos[:, 0])
                feet = jnp.minimum(fk_first.xpos[..., toe_l, 2],
                                   fk_first.xpos[..., toe_r, 2]) - offset
                ar_qpos = ar_qpos.at[..., 2].add(-feet[:, None])

        fk_res = fklib.fk(self.spec, ar_qpos)
        B, T = ar_qpos.shape[:2]
        return dict(
            ar_qpos=ar_qpos,
            ar_qvel=ar_qvel,
            ar_wbpos=fk_res.xpos.reshape(B, T, -1),
            ar_wbquat=fk_res.xquat.reshape(B, T, -1),
            ar_bquat=fklib.body_quat_sim(self.spec, ar_qpos),
            init_qpos=init_qpos,
            init_qvel=qvel0,
            # per-step context features for use_context/use_of obs
            # (reference ar_context['context_feat_rnn'])
            context_feat=(ctx_feat if (self.cfg.use_context or self.cfg.use_of)
                          else None),
        )

    # -- supervised losses reused by the agent ---------------------------------

    def step_update_loss(self, params, obs_tn, prev_masks_tn, curr_qpos,
                         gt_qpos, masks_valid=None):
        """Per-step BC: re-run GRU for means, kinematically integrate from the
        recorded sim qpos, and supervise toward the GT next qpos
        (policy_ar.update_supervised_step :277-287)."""
        from kinpoly_tpu.models.traj_ar import step_ar

        means = self.action_means_over_time(params, obs_tn, prev_masks_tn)
        if self.policy_v == 2:
            next_qpos = means          # the action is the next qpos itself
        else:
            next_qpos = step_ar(curr_qpos, means, self.cfg)
        loss, info = compute_loss_lite(self.spec, self.cfg, next_qpos, gt_qpos,
                                       reduce_mean=False)
        if masks_valid is not None:
            loss = (loss * masks_valid).sum() / jnp.maximum(masks_valid.sum(), 1.0)
        else:
            loss = loss.mean()
        return loss, info
