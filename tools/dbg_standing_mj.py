"""MuJoCo oracle: same standing PD rollout for comparison."""
import sys
sys.path.insert(0, '/root/repo')
import joblib
import numpy as np
from tests.test_engine import mujoco_pd_rollout, get_phys_model, STANDING

standing = joblib.load(STANDING)
q0 = standing['qpos'].copy()
v0 = standing['qvel'].copy()
kin_pose = q0[7:].copy()
action = np.zeros(75)
traj = mujoco_pd_rollout(q0, v0, action, kin_pose, 60, get_phys_model())
print('q0 z:', q0[2])
for i in range(0, 60, 4):
    qp, qv = traj[i]
    print(i, 'z=%.4f' % qp[2], 'vz=%.3f' % qv[2],
          'maxv=%.2f' % np.abs(qv).max(),
          'pose_err=%.3f' % np.abs(qp[7:] - kin_pose).max())
