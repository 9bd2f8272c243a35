"""AgentAR — the dynamics-regulated kinematic-policy trainer
(port of ``kin_poly/core/agent_ar.py`` + ``scripts/train_ar_policy.py``).

Composite update per epoch (kin_poly.yml policy_specs: rl_update +
step_update):

1. context build: sample N windows (host, freq-weighted), run the batched
   AR-net rollout once to create per-window contexts (init_context)
2. on-device rollout: N recurrent-policy envs x T steps with the frozen UHC
   controller in-loop
3. rl_update: PPO on the kinematic policy, recomputing action means by
   re-running the step-GRU over the (T, N) grid with mask-reset carries
4. step_update: `num_step_update` supervised epochs of per-step BC toward
   the GT next pose through the kinematic integrator

The supervised pretraining (train_init: init-state regression then full-AR
supervised with scheduled sampling) mirrors agent_ar.train_init:366.
"""

from __future__ import annotations

import pickle
import time
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kinpoly_tpu.data.statear import StateARDataset
from kinpoly_tpu.envs.humanoid_ar import ARContext, HumanoidAREnv
from kinpoly_tpu.models import nets
from kinpoly_tpu.models.policy_ar import PolicyAR
from kinpoly_tpu.models.traj_ar import (ClipData, TrajARNet, compute_loss,
                                        compute_loss_init)
from kinpoly_tpu.rl import gae, rollout_ar as roa
from kinpoly_tpu.physics import fk as fklib
from kinpoly_tpu.utils.liveness import grad_nonfinite_fraction


@dataclass
class ARTrainConfig:
    # supervised phase (kin_poly.yml root level)
    lr: float = 5e-4
    batch_size: int = 32           # per supervised step (ref 256; scaled for windows)
    fr_num: int = 100
    # RL phase (policy_specs)
    policy_lr: float = 1e-5
    value_lr: float = 3e-4
    clip_epsilon: float = 0.2
    gamma: float = 0.95
    tau: float = 0.95
    num_optim_epoch: int = 10
    num_step_update: int = 20
    num_init_update: int = 3
    log_std: float = -3.2
    # Training rollouts SAMPLE actions (reference agents/agent.py:22,53:
    # noise_rate=1.0 and mean_action=False in training, so select_action
    # always draws from the Gaussian). mean_action rollouts make the PPO
    # surrogate gradient EXACTLY zero on TPU: action == mean gives
    # d log p / d mean = (a - m)/sigma^2 = 0 and the over-time recompute is
    # bitwise identical to the rollout under XLA, so ratio == 1 with a zero
    # cotangent — three rounds of "dead PPO" traced to this one flag.
    mean_action_rollout: bool = False
    n_envs: int = 64
    rollout_steps: int = 156       # n_envs * steps ~ min_batch_size 10000
    max_grad_norm: float = 40.0
    sampling_temp: float = 0.3
    sampling_freq: float = 0.5
    seed: int = 4
    save_model_interval: int = 50
    # update-mode switches (policy_specs, kin_poly.yml:62-66)
    rl_update: bool = True
    step_update: bool = True
    step_update_dyna: bool = False
    init_update: bool = False
    full_update: bool = False
    # grad_joint: one optimizer step per PPO epoch on the COMBINED loss
    # loss_step*10 + surr (reference update_policy_joint:794-850);
    # grad_alternate alternates pure-PPO / pure-BC epochs instead
    grad_joint: bool = False
    grad_alternate: bool = False
    # fine-tune the UHC controller jointly with the kinematic policy
    # (kin_poly/core/agent_ar.py:749 update_controller:774-792)
    joint_controller: bool = False
    # set inside shard_map for data-parallel training (tests/test_multichip.py)
    axis_name: str | None = None
    cc_lr: float = 1e-5


class AgentAR:
    def __init__(self, env: HumanoidAREnv, dataset: StateARDataset,
                 cfg: ARTrainConfig, out_dir: str | None = None):
        self.env = env
        self.dataset = dataset
        self.cfg = cfg
        self.out_dir = Path(out_dir) if out_dir else None
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.np_rng = np.random.RandomState(cfg.seed)
        self.epoch = 0

        self.policy = PolicyAR(env.model.spec, env.kin_cfg, cfg.log_std,
                               policy_v=getattr(env, "policy_v", 1))
        # use_of configs need the raw flow features threaded through every
        # batch (context GRU input + per-step policy obs)
        self._use_of = bool(getattr(env.kin_cfg, "use_of", False))
        example = self._get_batch(1)
        self.rng, k = jax.random.split(self.rng)
        self.params = self.policy.init_params(k, example)

        from kinpoly_tpu.models.traj_ar import obs_dim as ar_obs_dim
        obs_dim = ar_obs_dim(env.kin_cfg, as_policy=True)
        if getattr(env, "policy_v", 1) == 2:
            obs_dim += 76  # residual policy obs appends the AR pose
        self.value = nets.Value(hidden=(512, 256))
        self.rng, k = jax.random.split(self.rng)
        self.value_params = self.value.init(k, jnp.zeros((1, obs_dim)))

        # clip the supervised gradients too: the full-AR loss backprops
        # through a 100-step scan and explodes within a few steps otherwise
        # (the reference's grad clip at 40, agent.py clip_policy_grad,
        # applies to all its updates)
        self.sup_opt = optax.chain(
            optax.zero_nans(),      # an inf loss would NaN the clip scale
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr))
        self.sup_opt_state = self.sup_opt.init(self.params)
        self.pol_opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                                   optax.adam(cfg.policy_lr))
        self.pol_opt_state = self.pol_opt.init(self.params)
        self.val_opt = optax.adam(cfg.value_lr)
        self.val_opt_state = self.val_opt.init(self.value_params)

        self._rollout = roa.make_ar_rollout(env, self.policy, cfg.rollout_steps)
        # joint_controller: live copy of the UHC weights, fine-tuned by PPO
        # on the recorded cc transitions (reference update_controller)
        self.cc_params = env.cc_policy_params
        self.cc_opt = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.cc_lr))
        self.cc_opt_state = self.cc_opt.init(self.cc_params)
        self._jit_full_sup = jax.jit(self._full_sup_step)
        self._jit_init_sup = jax.jit(self._init_sup_step)
        self._jit_build_ctx = jax.jit(self._build_context, static_argnums=(2,))
        self._jit_rl = jax.jit(self._rl_and_step_update)

        # per-take success tracking for adaptive window sampling
        self.freq = {}

    def _get_batch(self, batch_size, **kw):
        return self.dataset.get_batch(self.np_rng, batch_size,
                                      use_of=self._use_of, **kw)

    # ------------------------------------------------------------------
    # supervised pretraining (train_init)
    # ------------------------------------------------------------------

    def _full_sup_step(self, params, opt_state, batch: ClipData, rng, gt_rate):
        def loss_fn(p):
            # policy_v=2 wraps the AR net params as {"arnet","delta"}; the
            # supervised phases train only the AR net (delta grads are zero)
            feats = self.policy.net.apply(
                self.policy._arnet_params(p), batch, gt_rate, rng, True)
            loss, info = compute_loss(self.env.kin_cfg, feats, batch)
            return loss, info

        (loss, info), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # silent-freeze guard: zero_nans in sup_opt discards whole leaves on
        # NaN; count them so the metrics stream shows a frozen update as a
        # hot nan_frac instead of a quietly flat loss (round-4 c5e5efd class)
        info = dict(info, grad_nan_frac=grad_nonfinite_fraction(g))
        updates, opt_state = self.sup_opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, info

    def _init_sup_step(self, params, opt_state, batch: ClipData):
        def loss_fn(p):
            qpos0, qvel0, _ = self.policy.net.apply(
                self.policy._arnet_params(p), batch,
                method=TrajARNet.init_states)
            loss, info = compute_loss_init(
                self.env.model.spec, self.env.kin_cfg, qpos0,
                batch.qpos[:, 0], qvel0, batch.qvel[:, 0])
            return loss, info

        (loss, info), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        info = dict(info, grad_nan_frac=grad_nonfinite_fraction(g))
        updates, opt_state = self.sup_opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, info

    def train_init(self, init_steps: int = 500, full_steps: int = 50,
                   gt_rate: float = 0.3, log_every: int = 50):
        """Supervised warm start (agent_ar.train_init:366). Yields
        (phase, step, loss, grad_nan_frac) as it goes (on tunneled TPUs each
        step pays a host->device batch upload, so live progress matters).
        grad_nan_frac is the fraction of gradient leaves zero_nans discarded
        this step — the silent-freeze detector (utils/liveness.py)."""
        for i in range(init_steps):
            batch = self._get_batch(self.cfg.batch_size)
            self.params, self.sup_opt_state, loss, info = self._jit_init_sup(
                self.params, self.sup_opt_state, batch)
            if i % log_every == 0:
                yield ("init", i, float(loss), float(info["grad_nan_frac"]))
        for i in range(full_steps):
            batch = self._get_batch(self.cfg.batch_size)
            self.rng, k = jax.random.split(self.rng)
            self.params, self.sup_opt_state, loss, info = self._jit_full_sup(
                self.params, self.sup_opt_state, batch, k, gt_rate)
            if i % log_every == 0:
                yield ("full", i, float(loss), float(info["grad_nan_frac"]))

    # ------------------------------------------------------------------
    # context building
    # ------------------------------------------------------------------

    def _build_context(self, params, batch: ClipData, fix_height: bool = False) -> ARContext:
        ar = self.policy.init_context(params, batch, smooth=True,
                                      fix_height=fix_height)
        spec = self.env.model.spec
        gt_fk = fklib.fk(spec, batch.qpos)
        B, T = batch.qpos.shape[:2]
        return ARContext(
            qpos=batch.qpos, qvel=batch.qvel,
            bquat=fklib.body_quat_sim(spec, batch.qpos),
            gt_wbpos=gt_fk.xpos.reshape(B, T, -1),
            head_pose=batch.head_pose, head_vels=batch.head_vels,
            obj_pose=batch.obj_pose,
            obj_head_relative_poses=batch.obj_head_relative_poses,
            action_one_hot=batch.action_one_hot,
            ar_qpos=ar["ar_qpos"], ar_qvel=ar["ar_qvel"],
            ar_wbpos=ar["ar_wbpos"],
            init_qpos=ar["init_qpos"], init_qvel=ar["init_qvel"],
            # true window lengths: padded frames must not count as tracked
            # (round-1 coverage-inflation fix)
            length=(batch.length - 1 if batch.length is not None
                    else jnp.full((B,), T - 1, jnp.int32)),
            context_feat=ar.get("context_feat"),
            of=batch.of,
        )

    # ------------------------------------------------------------------
    # composite RL + supervised update
    # ------------------------------------------------------------------

    def _rl_and_step_update(self, params, value_params, pol_opt_state,
                            val_opt_state, sup_opt_state, carry, ctx, rng,
                            cc_params=None, cc_opt_state=None,
                            w_ppo=1.0, w_bc=1.0):
        cfg = self.cfg

        # data-parallel: when run inside shard_map over cfg.axis_name, each
        # shard rolls out its own env slice and the gradients are pmean'd so
        # replicated params/optimizer state stay bitwise identical
        def _pg(g):
            return jax.lax.pmean(g, cfg.axis_name) if cfg.axis_name else g
        carry, traj = self._rollout(carry, params, ctx,
                                    mean_action=cfg.mean_action_rollout,
                                    cc_params=cc_params)
        T, N = traj.rewards.shape

        values = self.value.apply(value_params, traj.obs)
        bootstrap = self.value.apply(value_params, carry.obs)
        adv, ret = gae.estimate_advantages(
            traj.rewards, traj.masks, values, cfg.gamma, cfg.tau, bootstrap)

        prev_masks = jnp.concatenate(
            [jnp.ones((1, N), traj.masks.dtype), traj.masks[:-1]], axis=0)

        flat = lambda x: x.reshape((T * N,) + x.shape[2:])
        log_std = self.policy.log_std

        def ppo_epoch(ts, key):
            params, pol_state, value_params, val_state = ts

            def v_loss(vp):
                return jnp.mean((self.value.apply(vp, flat(traj.obs)) - flat(ret)) ** 2)

            vl, vg = jax.value_and_grad(v_loss)(value_params)
            vg = _pg(vg)
            vu, val_state = self.val_opt.update(vg, val_state)
            value_params = optax.apply_updates(value_params, vu)

            def p_loss(p):
                means = self.policy.action_means_over_time(p, traj.obs, prev_masks)
                lp = nets.gaussian_log_prob(
                    flat(traj.actions), flat(means),
                    jnp.full_like(flat(means), log_std))
                ratio = jnp.exp(lp - flat(traj.log_probs))
                a = flat(adv)
                surr = -jnp.mean(jnp.minimum(
                    ratio * a,
                    jnp.clip(ratio, 1 - cfg.clip_epsilon, 1 + cfg.clip_epsilon) * a))
                return surr, jnp.mean(jnp.abs(ratio - 1.0))

            (pl, ratio_dev), pg = jax.value_and_grad(p_loss, has_aux=True)(params)
            pg = _pg(pg)
            pgnorm = optax.global_norm(pg)
            pu, pol_state = self.pol_opt.update(pg, pol_state, params)
            params = optax.apply_updates(params, pu)
            return (params, pol_state, value_params, val_state), (pl, vl, ratio_dev, pgnorm)

        def joint_epoch(ts, key):
            """Combined PPO + per-step BC loss in ONE optimizer step
            (reference update_policy_joint: loss = loss_step*10 + surr);
            w_ppo/w_bc gate the two terms (grad_alternate sets one to 0)."""
            params, pol_state, value_params, val_state = ts

            def v_loss(vp):
                return jnp.mean((self.value.apply(vp, flat(traj.obs)) - flat(ret)) ** 2)

            vl, vg = jax.value_and_grad(v_loss)(value_params)
            vg = _pg(vg)
            vu, val_state = self.val_opt.update(vg, val_state)
            value_params = optax.apply_updates(value_params, vu)

            def p_loss(p):
                means = self.policy.action_means_over_time(p, traj.obs, prev_masks)
                lp = nets.gaussian_log_prob(
                    flat(traj.actions), flat(means),
                    jnp.full_like(flat(means), log_std))
                ratio = jnp.exp(lp - flat(traj.log_probs))
                a = flat(adv)
                surr = -jnp.mean(jnp.minimum(
                    ratio * a,
                    jnp.clip(ratio, 1 - cfg.clip_epsilon, 1 + cfg.clip_epsilon) * a))
                bc, _ = self.policy.step_update_loss(
                    p, traj.obs, prev_masks, traj.curr_qpos, traj.gt_qpos)
                return w_ppo * surr + w_bc * bc * 10.0, jnp.mean(jnp.abs(ratio - 1.0))

            (pl, ratio_dev), pg = jax.value_and_grad(p_loss, has_aux=True)(params)
            pg = _pg(pg)
            pgnorm = optax.global_norm(pg)
            pu, pol_state = self.pol_opt.update(pg, pol_state, params)
            params = optax.apply_updates(params, pu)
            return (params, pol_state, value_params, val_state), (pl, vl, ratio_dev, pgnorm)

        if cfg.grad_joint:
            ts = (params, pol_opt_state, value_params, val_opt_state)
            ts, (pls, vls, ratio_devs, pgnorms) = jax.lax.scan(
                joint_epoch, ts, jax.random.split(rng, cfg.num_optim_epoch))
            params, pol_opt_state, value_params, val_opt_state = ts
        elif cfg.rl_update:
            ts = (params, pol_opt_state, value_params, val_opt_state)
            ts, (pls, vls, ratio_devs, pgnorms) = jax.lax.scan(
                ppo_epoch, ts, jax.random.split(rng, cfg.num_optim_epoch))
            params, pol_opt_state, value_params, val_opt_state = ts
        else:
            pls = vls = ratio_devs = pgnorms = jnp.zeros((1,))

        # step_update: supervised BC epochs through the kinematic integrator
        # toward the GT next pose (agent_ar.py:720-726); the 'dyna' variant
        # supervises toward the *simulated* result pose instead
        def make_bc_epoch(target_qpos):
            def bc_epoch(carry2, _):
                params, opt_state = carry2

                def loss_fn(p):
                    loss, _ = self.policy.step_update_loss(
                        p, traj.obs, prev_masks, traj.curr_qpos, target_qpos)
                    return loss

                loss, g = jax.value_and_grad(loss_fn)(params)
                g = _pg(g)
                nan_frac = grad_nonfinite_fraction(g)
                updates, opt_state = self.sup_opt.update(g, opt_state)
                return ((optax.apply_updates(params, updates), opt_state),
                        (loss, nan_frac))

            return bc_epoch

        sup_state = sup_opt_state
        bc_losses = jnp.zeros((1,))
        bc_nan_fracs = jnp.zeros((1,))
        if cfg.step_update and not cfg.grad_joint:
            (params, sup_state), (bc_losses, bc_nan_fracs) = jax.lax.scan(
                make_bc_epoch(traj.gt_qpos), (params, sup_state), None,
                length=cfg.num_step_update)
        if cfg.step_update_dyna:
            (params, sup_state), (dyna_losses, dyna_nf) = jax.lax.scan(
                make_bc_epoch(traj.res_qpos), (params, sup_state), None,
                length=cfg.num_step_update)
            bc_losses = jnp.concatenate([bc_losses, dyna_losses])
            bc_nan_fracs = jnp.concatenate([bc_nan_fracs, dyna_nf])

        # joint_controller: PPO surrogate on the UHC policy over the recorded
        # (cc_state, cc_action) transitions with the same advantages
        # (reference update_controller:774-792; fixed log-probs computed from
        # the pre-update controller)
        cc_losses = jnp.zeros((1,))
        if cfg.joint_controller and cc_params is not None:
            cc_mean0, cc_ls0 = self.env.cc_policy_apply(
                cc_params, flat(traj.cc_state))
            cc_fixed_lp = nets.gaussian_log_prob(
                flat(traj.cc_action), cc_mean0, cc_ls0)

            def cc_epoch(ts, _):
                cp, cs = ts

                def cc_loss(p):
                    m, ls = self.env.cc_policy_apply(p, flat(traj.cc_state))
                    lp = nets.gaussian_log_prob(flat(traj.cc_action), m, ls)
                    ratio = jnp.exp(lp - cc_fixed_lp)
                    a = flat(adv)
                    return -jnp.mean(jnp.minimum(
                        ratio * a,
                        jnp.clip(ratio, 1 - cfg.clip_epsilon,
                                 1 + cfg.clip_epsilon) * a))

                l, g = jax.value_and_grad(cc_loss)(cp)
                g = _pg(g)
                u, cs = self.cc_opt.update(g, cs, cp)
                return (optax.apply_updates(cp, u), cs), l

            (cc_params, cc_opt_state), cc_losses = jax.lax.scan(
                cc_epoch, (cc_params, cc_opt_state), None,
                length=cfg.num_optim_epoch)

        metrics = dict(
            reward_mean=traj.rewards.mean(),
            ppo_loss=pls.mean(), value_loss=vls.mean(),
            bc_loss=bc_losses.mean(),
            cc_loss=cc_losses.mean(),
            fail_frac=traj.fails.mean(),
            # PPO-liveness diagnostics (round-4): ~0 surrogate is expected by
            # construction with mean-action rollouts; these distinguish "PPO
            # contributes" from "training is BC-only"
            ratio_dev=ratio_devs.mean(),       # mean |ratio - 1| over epochs
            ppo_grad_norm=pgnorms.mean(),
            adv_std=adv.std(),
            # silent-freeze detector: fraction of BC gradient leaves that
            # zero_nans discarded (mean over the supervised epochs)
            bc_nan_frac=bc_nan_fracs.mean(),
        )
        return (params, value_params, pol_opt_state, val_opt_state, sup_state,
                carry, metrics, traj.percents, traj.clips, traj.masks == 0,
                cc_params, cc_opt_state)

    def optimize_policy(self):
        """One full training epoch (agent_ar.optimize_policy:271)."""
        t0 = time.time()
        cfg = self.cfg
        batch = self._get_batch(
            cfg.n_envs, freq_dict=self.freq or None,
            sampling_temp=cfg.sampling_temp, sampling_freq=cfg.sampling_freq)
        self._batch_take_idx = np.asarray(batch.take_idx)
        ctx = self._jit_build_ctx(self.params, batch)

        self.rng, k_init, k_rl = jax.random.split(self.rng, 3)
        carry = roa.init_ar_rollout_state(
            self.env, self.policy, k_init,
            jnp.arange(cfg.n_envs, dtype=jnp.int32), ctx)

        (self.params, self.value_params, self.pol_opt_state,
         self.val_opt_state, self.sup_opt_state, _, metrics,
         percents, clips, dones, self.cc_params, self.cc_opt_state) = self._jit_rl(
            self.params, self.value_params, self.pol_opt_state,
            self.val_opt_state, self.sup_opt_state, carry, ctx, k_rl,
            self.cc_params, self.cc_opt_state,
            # grad_alternate: odd epochs pure PPO, even epochs pure BC
            # (reference update_policy_joint grad_alternate branch)
            jnp.asarray(1.0 if (not cfg.grad_alternate or self.epoch % 2 == 1)
                        else 0.0),
            jnp.asarray(1.0 if (not cfg.grad_alternate or self.epoch % 2 == 0)
                        else 0.0))
        metrics, percents, clips, dones = jax.device_get(
            (metrics, percents, clips, dones))

        # per-take success history for adaptive window sampling
        # (statear_smpl_dataset.py:295; the reference records (success, start)
        # per finished episode into freq_dict)
        T_r, N_r = np.asarray(dones).shape
        for t in range(T_r):
            for n in np.nonzero(np.asarray(dones)[t])[0]:
                take = int(self._batch_take_idx[int(np.asarray(clips)[t, n])])
                succ = 1.0 if float(np.asarray(percents)[t, n]) >= 1.0 else 0.0
                self.freq.setdefault(take, []).append(succ)
                self.freq[take] = self.freq[take][-50:]

        # host-side supervised extras (agent_ar.update_params:682 dispatch)
        if cfg.init_update:
            for _ in range(cfg.num_init_update):
                b = self._get_batch(cfg.batch_size)
                self.params, self.sup_opt_state, _, _ = self._jit_init_sup(
                    self.params, self.sup_opt_state, b)
        if cfg.full_update:
            b = self._get_batch(cfg.batch_size)
            self.rng, k = jax.random.split(self.rng)
            self.params, self.sup_opt_state, _, _ = self._jit_full_sup(
                self.params, self.sup_opt_state, b, k, 0.3)

        self.epoch += 1
        out = {k: float(v) for k, v in metrics.items()}
        out["T_iter"] = time.time() - t0
        if self.out_dir and self.epoch % cfg.save_model_interval == 0:
            self.save_checkpoint()
        return out

    # ------------------------------------------------------------------

    def save_checkpoint(self, path=None):
        path = path or (self.out_dir / f"iter_{self.epoch:04d}.p")
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(dict(
                params=jax.device_get(self.params),
                value_params=jax.device_get(self.value_params),
                epoch=self.epoch,
                # cc_dict analogue (reference agent_ar.py:341-364): the
                # jointly fine-tuned UHC controller weights
                cc_params=(jax.device_get(self.cc_params)
                           if self.cfg.joint_controller else None),
                freq=self.freq,
            ), f)
        return str(path)

    def load_checkpoint(self, path):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.params = blob["params"]
        self.value_params = blob["value_params"]
        self.epoch = blob["epoch"]
        if blob.get("cc_params") is not None:
            self.cc_params = blob["cc_params"]
            self.cc_opt_state = self.cc_opt.init(self.cc_params)
        self.freq = blob.get("freq", {}) or {}
