"""BVH parsing + skeleton->MJCF export."""

import numpy as np

from kinpoly_tpu.anim import bvh as bvhlib

TINY_BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT Spine
  {
    OFFSET 0.0 10.0 0.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    End Site
    {
      OFFSET 0.0 10.0 0.0
    }
  }
  JOINT LeftLeg
  {
    OFFSET 5.0 -10.0 0.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    End Site
    {
      OFFSET 0.0 -40.0 0.0
    }
  }
}
MOTION
Frames: 2
Frame Time: 0.033333
0 90 0 0 0 0 10 0 0 0 0 0
1 91 0 5 0 0 15 0 0 0 0 0
"""


def test_parse_bvh(tmp_path):
    p = tmp_path / "t.bvh"
    p.write_text(TINY_BVH)
    data = bvhlib.parse_bvh(str(p))
    names = [j.name for j in data.joints if not j.is_end]
    assert names == ["Hips", "Spine", "LeftLeg"]
    assert data.frames.shape == (2, 12)
    assert abs(data.fps - 30.0) < 0.1

    pos, quats = bvhlib.bvh_to_pose(data, scale=0.01)
    assert pos.shape == (2, 3)
    assert quats.shape == (2, 3, 4)
    np.testing.assert_allclose(pos[0], [0, 0.9, 0], atol=1e-9)
    # frame 1 root: Zrotation 5 degrees
    ang = 2 * np.arccos(np.clip(abs(quats[1, 0, 0]), -1, 1))
    assert abs(np.rad2deg(ang) - 5.0) < 1e-6


def test_skeleton_to_mjcf(tmp_path):
    import mujoco

    p = tmp_path / "t.bvh"
    p.write_text(TINY_BVH)
    data = bvhlib.parse_bvh(str(p))
    xml = bvhlib.skeleton_to_mjcf(data)
    m = mujoco.MjModel.from_xml_string(xml)
    assert m.nq == 7 + 3 * 2   # free root + 2 joints x 3 hinges
    assert m.nu == 6
