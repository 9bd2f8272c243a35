"""UHC training driver — the TPU-native ``Agentuhc``
(``uhc/core/agent_copycat.py`` + ``scripts/train_uhc.py``).

One training iteration = one jitted program: N envs x T steps rollout
(policy + physics fused), running-norm update, GAE, and the full PPO update
(epochs x minibatches) — zero host round-trips inside an iteration. The
host loop only handles adaptive clip-sampling probabilities, logging, and
checkpoints.

Adaptive hard-sequence mining (reference ``dataset_amass_single.py:162-181``):
per-clip success history (episode completion fraction) -> sampling prob
proportional to exp(-ewma(success) / temp), refreshed each iteration.
"""

from __future__ import annotations

import pickle
import time
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kinpoly_tpu.models import nets
from kinpoly_tpu.rl import gae, ppo, rollout as ro, running_norm as rn


@dataclass
class UHCTrainConfig:
    n_envs: int = 256
    rollout_steps: int = 196          # n_envs * rollout_steps = batch (ref: 50000)
    gamma: float = 0.95
    tau: float = 0.95
    clip_epsilon: float = 0.2
    num_optim_epoch: int = 10
    mini_batch_size: int = 32768
    policy_lr: float = 5e-5
    value_lr: float = 3e-4
    log_std: float = -2.3
    fix_std: bool = True
    actor_type: str = "mcp"           # 'mcp' | 'gauss'
    num_primitive: int = 8
    policy_hsize: tuple = (512, 256)
    value_hsize: tuple = (512, 256)
    policy_htype: str = "relu"
    noise_rate: float = 1.0
    sampling_temp: float = 2.0
    sampling_freq: float = 0.75       # ewma alpha on success history
    max_grad_norm: float = 40.0
    seed: int = 1
    save_model_interval: int = 100
    dtype: str = "float32"


class UHCAgent:
    def __init__(self, env, cfg: UHCTrainConfig, out_dir: str | None = None):
        self.env = env
        self.cfg = cfg
        self.out_dir = Path(out_dir) if out_dir else None
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.n_clips = int(env.bank.length.shape[0])

        obs_dim = self._probe_obs_dim()
        act_dim = env.action_dim
        if cfg.actor_type == "mcp":
            self.policy = nets.PolicyMCP(
                action_dim=act_dim, num_primitive=cfg.num_primitive,
                hidden=cfg.policy_hsize, activation=cfg.policy_htype,
                log_std_init=cfg.log_std, fix_std=cfg.fix_std)
        else:
            self.policy = nets.PolicyGaussian(
                action_dim=act_dim, hidden=cfg.policy_hsize,
                activation=cfg.policy_htype, log_std_init=cfg.log_std,
                fix_std=cfg.fix_std)
        self.value = nets.Value(hidden=cfg.value_hsize)

        self.rng, k1, k2 = jax.random.split(self.rng, 3)
        dummy = jnp.zeros((1, obs_dim))
        policy_params = self.policy.init(k1, dummy)
        value_params = self.value.init(k2, dummy)

        self.ppo_cfg = ppo.PPOConfig(
            clip_epsilon=cfg.clip_epsilon, num_optim_epoch=cfg.num_optim_epoch,
            mini_batch_size=cfg.mini_batch_size, policy_lr=cfg.policy_lr,
            value_lr=cfg.value_lr, gamma=cfg.gamma, tau=cfg.tau,
            max_grad_norm=cfg.max_grad_norm)
        self.policy_opt, self.value_opt = ppo.make_optimizers(self.ppo_cfg)
        self.train_state = ppo.TrainState(
            policy_params=policy_params, value_params=value_params,
            policy_opt=self.policy_opt.init(policy_params),
            value_opt=self.value_opt.init(value_params))

        self.norm = rn.init(obs_dim)
        self.success_ewma = np.full(self.n_clips, 0.0)
        self.seen = np.zeros(self.n_clips, bool)
        self.epoch = 0

        self._rollout = ro.make_rollout(env, self.policy.apply,
                                        cfg.rollout_steps, cfg.noise_rate)
        self._train_iter = jax.jit(self._make_train_iter())
        self._carry = None

    def _probe_obs_dim(self):
        state, obs = jax.eval_shape(
            lambda k: self.env.reset(k, jnp.asarray(0, jnp.int32)),
            jax.random.PRNGKey(0),
        )
        return obs.shape[-1]

    # ------------------------------------------------------------------

    def _make_train_iter(self):
        value_apply = self.value.apply
        policy_apply = self.policy.apply
        cfg = self.cfg

        def train_iter(carry, ts: ppo.TrainState, norm, clip_probs, rng,
                       noise_rate):
            carry, traj = self._rollout(carry, ts.policy_params, norm,
                                        clip_probs, noise_rate_t=noise_rate)
            # running-norm update from raw obs (stats frozen during rollout)
            new_norm = rn.update_batch(norm, traj.raw_obs)

            T, N = traj.rewards.shape
            values = value_apply(ts.value_params, traj.obs)
            # bootstrap truncated tails with V of the carried obs
            last_obs_n = rn.apply(norm, carry.obs)
            bootstrap = value_apply(ts.value_params, last_obs_n)
            adv, ret = gae.estimate_advantages(
                traj.rewards, traj.masks, values, cfg.gamma, cfg.tau, bootstrap)

            flat = lambda x: x.reshape((T * N,) + x.shape[2:])
            rng, k = jax.random.split(rng)
            ts, metrics = ppo.ppo_update(
                policy_apply, value_apply, self.ppo_cfg, ts, k,
                flat(traj.obs), flat(traj.actions), flat(adv), flat(ret),
                flat(traj.log_probs), self.policy_opt, self.value_opt)

            metrics = dict(
                metrics,
                reward_mean=traj.rewards.mean(),
                episode_done=traj.masks.size - traj.masks.sum(),
                fail_frac=traj.fails.mean(),
                # LoggerRL-style per-component decomposition (avg_c_info):
                # [pose, vel, ee, com, vf] for world_rfc_implicit
                reward_components=traj.reward_info.mean(axis=(0, 1)),
            )
            return carry, ts, new_norm, metrics, traj.percents, traj.clips, (traj.masks == 0)

        return train_iter

    # ------------------------------------------------------------------

    def clip_probs(self) -> np.ndarray:
        """Sampling prob per clip ∝ exp(-success / temp) for seen clips,
        uniform mass for unseen (reference freq-dict semantics)."""
        logits = np.where(self.seen, -self.success_ewma / self.cfg.sampling_temp, 0.0)
        p = np.exp(logits - logits.max())
        p /= p.sum()
        return p

    def _set_log_std(self, params, v: float):
        """Overwrite every 'log_std' parameter leaf (adaptive schedule sets
        the exploration std directly, copycat_config.py:158)."""
        def walk(d):
            if isinstance(d, dict):
                return {k: (jnp.full_like(x, v) if k == "log_std" else walk(x))
                        for k, x in d.items()}
            return d
        return walk(params)

    def train_epoch(self, adaptive: dict | None = None):
        """One PPO iteration. `adaptive` = cfg.adaptive_params(i_iter):
        {noise_rate, log_std, policy_lr} interpolated schedules
        (reference train_uhc.pre_iter_update -> update_adaptive_params).

        Note: the log_std schedule needs fix_std=False (a log_std param
        leaf); with fix_std=True the std is baked into the apply fn as a
        compile-time constant and only noise_rate/policy_lr apply."""
        t0 = time.time()
        cfg = self.cfg
        noise_rate = cfg.noise_rate
        if adaptive is not None:
            noise_rate = adaptive.get("noise_rate", noise_rate)
            if not cfg.fix_std and "log_std" in adaptive:
                self.train_state = self.train_state._replace(
                    policy_params=self._set_log_std(
                        self.train_state.policy_params, adaptive["log_std"]))
            if "policy_lr" in adaptive:
                self.train_state = self.train_state._replace(
                    policy_opt=ppo.set_policy_lr(self.train_state.policy_opt,
                                                 adaptive["policy_lr"]))
        probs = jnp.asarray(self.clip_probs())
        if self._carry is None:
            self.rng, k = jax.random.split(self.rng)
            self._carry = ro.init_rollout_state(self.env, k, cfg.n_envs, probs)
        self.rng, k = jax.random.split(self.rng)
        (self._carry, self.train_state, self.norm, metrics,
         percents, clips, dones) = self._train_iter(
            self._carry, self.train_state, self.norm, probs, k,
            jnp.asarray(noise_rate, jnp.float32))

        # ONE bulk host fetch: per-array device_get round-trips dominate the
        # iteration wall time on tunneled TPUs
        metrics, percents, clips, dones = jax.device_get(
            (metrics, percents, clips, dones))
        for c, p in zip(clips[dones], percents[dones]):
            a = cfg.sampling_freq
            self.success_ewma[c] = (
                p if not self.seen[c] else a * self.success_ewma[c] + (1 - a) * p
            )
            self.seen[c] = True

        self.epoch += 1
        out = {k: (np.asarray(v).tolist() if np.asarray(v).ndim else float(v))
               for k, v in metrics.items()}
        out["T_iter"] = time.time() - t0
        if self.out_dir and self.epoch % cfg.save_model_interval == 0:
            self.save_checkpoint()
        return out

    # ------------------------------------------------------------------

    def save_checkpoint(self, path: str | None = None):
        path = path or (self.out_dir / f"iter_{self.epoch:04d}.p")
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        blob = dict(
            policy_params=jax.device_get(self.train_state.policy_params),
            value_params=jax.device_get(self.train_state.value_params),
            norm=jax.device_get(self.norm),
            success_ewma=self.success_ewma,
            seen=self.seen,
            epoch=self.epoch,
            cfg=self.cfg.__dict__,
        )
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        return str(path)

    def load_checkpoint(self, path: str):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.train_state = self.train_state._replace(
            policy_params=blob["policy_params"], value_params=blob["value_params"])
        self.norm = rn.RunningNorm(*blob["norm"])
        if len(blob["success_ewma"]) == self.n_clips:
            self.success_ewma = blob["success_ewma"]
            self.seen = blob["seen"]
        else:
            # warm start onto a different clip bank: keep the policy/norm,
            # restart the per-clip hard-mining history
            self.success_ewma = np.full(self.n_clips, 0.0)
            self.seen = np.zeros(self.n_clips, bool)
        self.epoch = blob["epoch"]

    # ------------------------------------------------------------------

    def eval_coverage(self, n_envs: int | None = None, max_steps: int = 512,
                      stochastic_seeds: int = 0):
        """Fraction of clips tracked to completion with deterministic actions
        (reference eval_uhc test_coverage, eval_uhc.py:202-234).

        With ``stochastic_seeds=N`` the info dict additionally carries a
        ``coverage_mean``/``coverage_std`` band over N exploration-noise
        seeds, so the headline number has an uncertainty estimate instead of
        being a single stochastic draw (round-2 evals swung 0.79<->0.96)."""
        env = self.env
        n = self.n_clips
        keys = jax.random.split(jax.random.PRNGKey(7), n)
        clips = jnp.arange(n)

        @partial(jax.jit, static_argnames=("sample",))
        def run(ts, norm, act_rng, sample=False):
            state, obs = jax.vmap(
                lambda k, i: env.reset(k, i, deterministic=True))(keys, clips)

            def step(carry, rng_t):
                state, obs, running = carry
                obs_n = rn.apply(norm, obs)
                mean, log_std = self.policy.apply(ts.policy_params, obs_n)
                if sample:
                    mean = mean + jnp.exp(log_std) * jax.random.normal(
                        rng_t, mean.shape, mean.dtype)
                state2, obs2, reward, done, info = jax.vmap(env.step)(state, mean)
                # freeze envs that finished
                state3 = jax.tree.map(
                    lambda a, b: jnp.where(
                        running.reshape((-1,) + (1,) * (a.ndim - 1)), b, a),
                    state, state2)
                obs3 = jnp.where(running[:, None], obs2, obs)
                still = running & ~done
                succ_now = running & info["end"] & ~info["fail"]
                pct_now = jnp.where(running, info["percent"], 0.0)
                return (state3, obs3, still), (succ_now, pct_now)

            (_, _, _), (succs, pcts) = jax.lax.scan(
                step, (state, obs, jnp.ones(n, bool)),
                jax.random.split(act_rng, max_steps))
            return succs.any(axis=0), pcts.max(axis=0)

        succ, pct = run(self.train_state, self.norm, jax.random.PRNGKey(0))
        succ = np.asarray(succ)
        info = dict(succ=succ, percent=np.asarray(pct))
        if stochastic_seeds > 0:
            covs = []
            for s in range(stochastic_seeds):
                s_succ, _ = run(self.train_state, self.norm,
                                jax.random.PRNGKey(1000 + s), sample=True)
                covs.append(float(np.asarray(s_succ).mean()))
            info["coverage_mean"] = float(np.mean(covs))
            info["coverage_std"] = float(np.std(covs))
            info["coverage_seeds"] = covs
        return float(succ.mean()), info
