"""Config system — YAML -> typed config objects + argparse overrides.

Mirrors the reference's two config families
(``uhc/utils/config_utils/copycat_config.py`` and
``kin_poly/utils/statear_smpl_config.py``) with the same knobs, adaptive
schedules, and update-from-args semantics, but emitting the framework's
dataclasses (EnvConfig / TrajARConfig / train configs) instead of an
attribute bag.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import yaml

CONFIG_DIR = Path(__file__).parent / "yaml"


def load_yaml(cfg_id: str) -> dict:
    path = cfg_id if os.path.exists(cfg_id) else str(CONFIG_DIR / f"{cfg_id}.yml")
    with open(path) as f:
        return yaml.safe_load(f)


class UHCConfig:
    """UHC training config (reference Config('uhc'))."""

    def __init__(self, cfg_id: str = "uhc", out_root: str = "results"):
        self.id = os.path.splitext(os.path.basename(cfg_id))[0]
        d = self.cfg_dict = load_yaml(cfg_id)
        self.out_dir = os.path.join(out_root, "motion_im", self.id)
        self.model_dir = os.path.join(self.out_dir, "models")

        g = d.get
        self.gamma = g("gamma", 0.95)
        self.tau = g("tau", 0.95)
        self.policy_hsize = tuple(g("policy_hsize", [512, 256]))
        self.policy_htype = g("policy_htype", "relu")
        self.value_hsize = tuple(g("value_hsize", [512, 256]))
        self.policy_lr = g("policy_lr", 5e-5)
        self.value_lr = g("value_lr", 3e-4)
        self.clip_epsilon = g("clip_epsilon", 0.2)
        self.min_batch_size = g("min_batch_size", 50000)
        self.mini_batch_size = g("mini_batch_size", 32768)
        self.num_optim_epoch = g("num_optim_epoch", 10)
        self.log_std = g("log_std", -2.3)
        self.fix_std = g("fix_std", True)
        self.max_iter_num = g("max_iter_num", 30000)
        self.seed = g("seed", 1)
        self.save_model_interval = g("save_model_interval", 100)
        self.reward_id = g("reward_id", "world_rfc_implicit")
        self.actor_type = g("actor_type", "mcp")
        self.num_primitive = g("num_primitive", 8)
        self.action_v = g("action_v", 1)
        self.obs_v = g("obs_v", 1)
        self.reactive_v = g("reactive_v", 1)
        self.reactive_rate = g("reactive_rate", 0.3)
        self.sampling_temp = g("sampling_temp", 2.0)
        self.env_term_body = g("env_term_body", "body")
        self.env_episode_len = g("env_episode_len", 100000)
        self.env_expert_trail_steps = g("env_expert_trail_steps", 0)
        self.env_init_noise = g("env_init_noise", 0.0)
        self.obs_coord = g("obs_coord", "root")
        self.obs_vel = g("obs_vel", "full")
        self.residual_force = g("residual_force", True)
        self.residual_force_scale = g("residual_force_scale", 100.0)
        self.residual_force_lim = g("residual_force_lim", 100.0)
        self.residual_force_mode = g("residual_force_mode", "implicit")
        self.residual_force_bodies = g("residual_force_bodies", "all")
        self.residual_force_torque = g("residual_force_torque", True)
        self.meta_pd = g("meta_pd", False)
        self.base_rot = tuple(g("base_rot", [0.7071, 0.7071, 0.0, 0.0]))
        self.reward_weights = g("reward_weights", {})
        self.n_envs = g("n_envs", 1024)
        self.rollout_steps = g("rollout_steps", 48)
        # adaptive schedules (copycat_config.py:149-166)
        self.adp_iter_cp = np.asarray(g("adp_iter_cp", [0]))
        self.adp_noise_rate_cp = np.asarray(g("adp_noise_rate_cp", [1.0]))
        self.adp_log_std_cp = np.asarray(g("adp_log_std_cp", [self.log_std]))
        self.adp_policy_lr_cp = np.asarray(g("adp_policy_lr_cp", [self.policy_lr]))

    def adaptive_params(self, i_iter: int):
        """Linear interpolation between checkpointed schedule values
        (copycat_config.update_adaptive_params)."""
        cp = self.adp_iter_cp
        idx = int(np.searchsorted(cp, i_iter, side="right") - 1)
        nxt = min(idx + 1, len(cp) - 1)
        t = 0.0 if cp[nxt] == cp[idx] else (i_iter - cp[idx]) / (cp[nxt] - cp[idx])

        def lerp(arr):
            return float(arr[idx] * (1 - t) + arr[nxt] * t)

        return dict(
            noise_rate=lerp(self.adp_noise_rate_cp),
            log_std=lerp(self.adp_log_std_cp),
            policy_lr=lerp(self.adp_policy_lr_cp),
        )

    def control_params(self, spec):
        """ControlParams with every residual-force knob threaded through
        (reference humanoid_im.py:71-89 builds vf_dim/vf_bodies from these)."""
        from kinpoly_tpu.config.defaults import uhc_control_params

        vb = self.residual_force_bodies
        return uhc_control_params(
            spec,
            rfc_scale=self.residual_force_scale if self.residual_force else 0.0,
            meta_pd=self.meta_pd,
            rfc_mode=self.residual_force_mode,
            rfc_lim=self.residual_force_lim,
            vf_bodies=vb if vb == "all" else tuple(vb),
            residual_force_torque=self.residual_force_torque,
        )

    def env_config(self):
        from kinpoly_tpu.envs.humanoid_im import EnvConfig

        rw = self.reward_weights
        return EnvConfig(
            obs_v=self.obs_v, obs_coord=self.obs_coord, obs_vel=self.obs_vel,
            env_term_body=self.env_term_body,
            env_episode_len=self.env_episode_len,
            env_expert_trail_steps=self.env_expert_trail_steps,
            env_init_noise=self.env_init_noise,
            reactive_v=self.reactive_v, reactive_rate=self.reactive_rate,
            base_rot=self.base_rot,
            reward_id=self.reward_id,
            w_p=rw.get("w_p", 0.3), w_v=rw.get("w_v", 0.1),
            w_e=rw.get("w_e", 0.45), w_c=rw.get("w_c", 0.1),
            w_vf=rw.get("w_vf", 0.05),
            k_p=rw.get("k_p", 2.0), k_v=rw.get("k_v", 0.005),
            k_e=rw.get("k_e", 5.0), k_c=rw.get("k_c", 100.0),
            k_vf=rw.get("k_vf", 1.0),
            w_rp=rw.get("w_rp", 0.1), w_rv=rw.get("w_rv", 0.1),
            k_rh=rw.get("k_rh", 300.0), k_rq=rw.get("k_rq", 300.0),
            k_rl=rw.get("k_rl", 5.0), k_ra=rw.get("k_ra", 0.5),
            w_cp=rw.get("w_cp", 0.0), k_cp=rw.get("k_cp", 1.0),
            w_wp=rw.get("w_wp", 0.4), w_j=rw.get("w_j", 100.0),
            k_wp=rw.get("k_wp", 0.4), k_j=rw.get("k_j", 100.0),
        )

    def train_config(self):
        from kinpoly_tpu.rl.agent_uhc import UHCTrainConfig

        return UHCTrainConfig(
            n_envs=self.n_envs, rollout_steps=self.rollout_steps,
            gamma=self.gamma, tau=self.tau, clip_epsilon=self.clip_epsilon,
            num_optim_epoch=self.num_optim_epoch,
            mini_batch_size=self.mini_batch_size,
            policy_lr=self.policy_lr, value_lr=self.value_lr,
            log_std=self.log_std, fix_std=self.fix_std,
            actor_type=self.actor_type, num_primitive=self.num_primitive,
            policy_hsize=self.policy_hsize, value_hsize=self.value_hsize,
            policy_htype=self.policy_htype,
            sampling_temp=self.sampling_temp, seed=self.seed,
            save_model_interval=self.save_model_interval,
        )

    def update(self, args):
        """argparse override merge (statear_smpl_config.py:159)."""
        for k, v in vars(args).items():
            if v is not None:
                setattr(self, k, v)
        return self


class KinPolyConfig:
    """Kinematic-policy config (reference statear_smpl_config.Config)."""

    def __init__(self, cfg_id: str = "kin_poly", out_root: str = "results"):
        self.id = os.path.splitext(os.path.basename(cfg_id))[0]
        d = self.cfg_dict = load_yaml(cfg_id)
        self.out_dir = os.path.join(out_root, "statear", self.id)
        self.model_dir = os.path.join(self.out_dir, "models")

        g = d.get
        self.seed = g("seed", 4)
        self.fr_num = g("fr_num", 100)
        self.use_of = g("use_of", False)
        self.use_head = g("use_head", True)
        self.use_action = g("use_action", True)
        self.use_vel = g("use_vel", False)
        self.use_context = g("use_context", False)
        self.use_obj = g("use_obj", True)
        self.smooth = g("smooth", True)
        self.has_z = g("has_z", True)
        self.add_noise = g("add_noise", True)
        self.noise_std = g("noise_std", 0.01)
        self.lr = g("lr", 5e-4)
        self.num_epoch = g("num_epoch", 10000)
        self.batch_size = g("batch_size", 256)
        self.model_specs = g("model_specs", {})
        self.policy_specs = g("policy_specs", {})
        self.n_envs = g("n_envs", 64)
        self.rollout_steps = g("rollout_steps", 156)

    def traj_ar_config(self):
        from kinpoly_tpu.models.traj_ar import TrajARConfig

        ms = self.model_specs
        return TrajARConfig(
            use_of=self.use_of, use_head=self.use_head,
            use_action=self.use_action, use_vel=self.use_vel,
            use_context=self.use_context, has_z=self.has_z,
            pose_delta=ms.get("pose_delta", False),
            add_noise=self.add_noise, noise_std=self.noise_std,
            model_v=ms.get("model_v", 1),
            rnn_hdim=ms.get("rnn_hdim", 1024),
            of_dim=ms.get("cnn_fdim", 512),
            mlp_hsize=tuple(ms.get("mlp_hsize", [1024, 512, 256])),
            mlp_htype=ms.get("mlp_htype", "relu"),
            w_rp=ms.get("w_rp", 50.0), w_rr=ms.get("w_rr", 50.0),
            w_p=ms.get("w_p", 1.0), w_v=ms.get("w_v", 1.0),
            w_ee=ms.get("w_ee", 10.0), w_op=ms.get("w_op", 1.0),
            w_or=ms.get("w_or", 10.0),
        )

    def reward_weights(self):
        from kinpoly_tpu.envs.humanoid_ar import ARRewardWeights

        rw = self.policy_specs.get("reward_weights", {})
        return ARRewardWeights(
            reward_id=self.policy_specs.get("reward_id",
                                            "dynamic_supervision_v1"),
            w_hp=rw.get("w_hp", 0.15), w_hq=rw.get("w_hq", 0.15),
            w_p=rw.get("w_p", 0.2), w_jp=rw.get("w_jp", 0.2),
            w_act_p=rw.get("w_act_p", 0.2), w_act_v=rw.get("w_act_v", 0.1),
            w_hv=rw.get("w_hv", 0.05),
            k_hp=rw.get("k_hp", 45.0), k_hq=rw.get("k_hq", 45.0),
            k_p=rw.get("k_p", 50.0), k_jp=rw.get("k_jp", 50.0),
            k_act_p=rw.get("k_act_p", 5.0), k_act_v=rw.get("k_act_v", 0.005),
            k_rp=rw.get("k_rp", 0.1), k_rq=rw.get("k_rq", 0.1),
        )

    def train_config(self):
        from kinpoly_tpu.rl.agent_ar import ARTrainConfig

        ps = self.policy_specs
        return ARTrainConfig(
            lr=self.lr, batch_size=self.batch_size, fr_num=self.fr_num,
            policy_lr=ps.get("policy_lr", 1e-5),
            value_lr=ps.get("value_lr", 3e-4),
            clip_epsilon=ps.get("clip_epsilon", 0.2),
            gamma=ps.get("gamma", 0.95), tau=ps.get("tau", 0.95),
            num_optim_epoch=ps.get("num_optim_epoch", 10),
            num_step_update=ps.get("num_step_update", 20),
            num_init_update=ps.get("num_init_update", 3),
            log_std=ps.get("log_std", -3.2),
            n_envs=self.n_envs, rollout_steps=self.rollout_steps,
            sampling_temp=ps.get("sampling_temp", 0.3),
            sampling_freq=ps.get("sampling_freq", 0.5),
            seed=self.seed,
            save_model_interval=ps.get("save_model_interval", 50),
            rl_update=ps.get("rl_update", True),
            step_update=ps.get("step_update", True),
            step_update_dyna=ps.get("step_update_dyna", False),
            init_update=ps.get("init_update", False),
            full_update=ps.get("full_update", False),
            joint_controller=ps.get("joint_controller", False),
            cc_lr=ps.get("cc_lr", 1e-5),
        )

    def update(self, args):
        for k, v in vars(args).items():
            if v is not None:
                setattr(self, k, v)
        return self
