"""kinpoly_tpu — TPU-native dynamics-regulated kinematic policy framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of KinPoly
("Dynamics-Regulated Kinematic Policy for Egocentric Pose Estimation",
NeurIPS 2021). The CPU MuJoCo simulation + fork-based rollout workers of the
reference become a pure-functional, vmapped, sharded simulation stack:

- ``core``     : quaternion / transform math (single source of truth)
- ``physics``  : articulated rigid-body dynamics (CRBA/RNEA), stable-PD,
                 residual force control, soft contacts, semi-implicit Euler
- ``anim``     : MJCF skeleton parsing, forward kinematics, SMPL <-> qpos
- ``envs``     : pure `(state, action) -> (state, obs, reward, done)` envs
- ``models``   : MLP / GRU / Gaussian & MCP policies / value / TrajARNet
- ``rl``       : GAE, PPO, on-device rollout scan, running obs-norm
- ``data``     : expert clip preprocessing + adaptive samplers
- ``metrics``  : eval_pose metric suite (MPJPE, sliding, penetration, ...)
- ``parallel`` : device-mesh sharding helpers (pjit / shard_map)
"""

__version__ = "0.1.0"
