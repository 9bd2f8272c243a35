"""Offline visualisation — replay qpos trajectories through MuJoCo's
renderer (the reference's GLFW viewer stack, ``uhc/khrylib/rl/utils/
visualizer.py`` + ``mjviewer.py``, replaced by headless frame rendering;
interactive windows don't exist on TPU pods).

Renders the converted local-coordinate model; falls back gracefully when
MuJoCo or an offscreen GL context is unavailable.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


class Visualizer:
    def __init__(self, spec, with_objects: bool = False,
                 width: int = 640, height: int = 480):
        import mujoco

        from kinpoly_tpu.anim.mjcf import export_local_mjcf

        out = os.path.join(tempfile.gettempdir(), "kp_vis_model")
        xml = export_local_mjcf(spec, out, with_objects=with_objects)
        self.model = mujoco.MjModel.from_xml_path(xml)
        self.data = mujoco.MjData(self.model)
        self.mujoco = mujoco
        self.width, self.height = width, height
        self._renderer = None

    def _get_renderer(self):
        if self._renderer is None:
            self._renderer = self.mujoco.Renderer(
                self.model, height=self.height, width=self.width)
        return self._renderer

    def render_qpos(self, qpos: np.ndarray) -> np.ndarray:
        """One frame (H, W, 3) uint8 from a (nq,) qpos."""
        self.data.qpos[: len(qpos)] = qpos
        self.mujoco.mj_forward(self.model, self.data)
        r = self._get_renderer()
        r.update_scene(self.data)
        return r.render()

    def render_trajectory(self, qpos_traj: np.ndarray, out_path: str,
                          fps: int = 30, stride: int = 1) -> str:
        """Replay a (T, nq) trajectory to an .npz stack of frames (and .mp4
        when imageio/ffmpeg is available)."""
        frames = [self.render_qpos(q) for q in qpos_traj[::stride]]
        frames = np.stack(frames)
        base, ext = os.path.splitext(out_path)
        if ext == ".mp4":
            try:
                import imageio

                imageio.mimwrite(out_path, frames, fps=fps)
                return out_path
            except Exception:
                out_path = base + ".npz"
        np.savez_compressed(out_path, frames=frames, fps=fps)
        return out_path
