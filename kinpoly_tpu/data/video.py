"""Egocentric video feature pipeline — the host-side replacement for the
reference's ``kin_poly/data_process/{PWCNet,compute_of_feat,
feature_extractor}.py`` chain (PWC-Net optical flow needs an external CUDA
``correlation_package``; the shipped datasets already contain the extracted
``*_img_feats.p`` features, which remain the supported eval path).

This module provides:
- a pure-numpy coarse-to-fine optical flow (Horn-Schunck pyramid) usable
  without OpenCV/CUDA,
- a torch-free image-feature encoder built on the framework's own flax
  ResNet-18 (kinpoly_tpu.models.aux_nets.ResNet18),
- batch helpers mirroring ``compute_of_feat.py`` (flow -> per-frame feature
  vectors saved per take).
"""

from __future__ import annotations

import numpy as np


def _resize_half(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    return img[: h // 2 * 2, : w // 2 * 2].reshape(
        h // 2, 2, w // 2, 2, *img.shape[2:]).mean(axis=(1, 3))


def _warp(img: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w]
    xs = np.clip(xx + u, 0, w - 1)
    ys = np.clip(yy + v, 0, h - 1)
    x0, y0 = xs.astype(int), ys.astype(int)
    x1, y1 = np.minimum(x0 + 1, w - 1), np.minimum(y0 + 1, h - 1)
    fx, fy = xs - x0, ys - y0
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
            + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)


def horn_schunck(im1: np.ndarray, im2: np.ndarray, alpha: float = 15.0,
                 iters: int = 32) -> np.ndarray:
    """Single-level Horn-Schunck flow; inputs (H, W) grayscale float."""
    Ix = np.gradient(im1, axis=1)
    Iy = np.gradient(im1, axis=0)
    It = im2 - im1
    u = np.zeros_like(im1)
    v = np.zeros_like(im1)
    k = np.array([[1 / 12, 1 / 6, 1 / 12], [1 / 6, 0, 1 / 6],
                  [1 / 12, 1 / 6, 1 / 12]])

    def avg(x):
        from numpy.lib.stride_tricks import sliding_window_view

        p = np.pad(x, 1, mode="edge")
        win = sliding_window_view(p, (3, 3))
        return np.einsum("hwij,ij->hw", win, k)

    for _ in range(iters):
        ubar, vbar = avg(u), avg(v)
        num = Ix * ubar + Iy * vbar + It
        den = alpha**2 + Ix**2 + Iy**2
        u = ubar - Ix * num / den
        v = vbar - Iy * num / den
    return np.stack([u, v], axis=-1)


def pyramid_flow(im1: np.ndarray, im2: np.ndarray, levels: int = 3,
                 **kw) -> np.ndarray:
    """Coarse-to-fine optical flow (the PWC-Net slot in the pipeline)."""
    pyr1, pyr2 = [im1], [im2]
    for _ in range(levels - 1):
        pyr1.append(_resize_half(pyr1[-1]))
        pyr2.append(_resize_half(pyr2[-1]))
    flow = None
    for l in reversed(range(levels)):
        a, b = pyr1[l], pyr2[l]
        if flow is None:
            flow = horn_schunck(a, b, **kw)
        else:
            h, w = a.shape
            up = np.repeat(np.repeat(flow, 2, 0), 2, 1)[:h, :w] * 2.0
            warped = _warp(a, up[..., 0], up[..., 1])
            flow = up + horn_schunck(warped, b, **kw)
    return flow


class FlowFeatureEncoder:
    """Flow field -> feature vector via the flax ResNet-18 (the reference
    encodes PWC flow with a torchvision ResNet, compute_of_feat.py)."""

    # params trained on synthetic egomotion flow (tools/train_of_encoder.py)
    PRETRAINED = "/root/repo/data_bank/of_encoder.pkl"

    def __init__(self, feature_dim: int = 512, rng_seed: int = 0,
                 params=None):
        import os
        import pickle

        import jax
        import jax.numpy as jnp

        from kinpoly_tpu.models.aux_nets import ResNet18

        self.net = ResNet18(out_dim=feature_dim)
        if params is None and feature_dim == 512 and os.path.exists(self.PRETRAINED):
            # the artifact is joblib-written (may be compressed — plain
            # pickle.load chokes on the zlib header); joblib reads both
            import joblib
            params = joblib.load(self.PRETRAINED)["params"]
        dummy = jnp.zeros((1, 64, 64, 2), jnp.float32)
        self.params = params or self.net.init(jax.random.PRNGKey(rng_seed), dummy)
        self._apply = jax.jit(lambda p, x: self.net.apply(p, x))

    def __call__(self, flows: np.ndarray) -> np.ndarray:
        """(N, H, W, 2) flow fields -> (N, feature_dim) features."""
        return np.asarray(self._apply(self.params, flows.astype(np.float32)))


def compute_of_features(frames: np.ndarray, encoder: FlowFeatureEncoder,
                        levels: int = 3) -> np.ndarray:
    """(T, H, W) grayscale video -> (T, D) flow features (first frame
    duplicated, mirroring the reference's alignment)."""
    flows = [pyramid_flow(frames[i], frames[i + 1], levels)
             for i in range(len(frames) - 1)]
    flows = np.stack([flows[0]] + flows)
    return encoder(flows)


# ---------------------------------------------------------------------------
# person-crop RGB feature extraction (reference kin_poly/data_process/
# feature_extractor.py: SPIN-backbone features of the smoothed person bbox;
# + smooth_bbox.py's temporal box smoothing). The SPIN weights are MPG-
# licensed and not redistributable, so the backbone here is the framework's
# own flax ResNet-18 — the pipeline shape (bbox smoothing -> square crop ->
# normalize -> backbone -> per-frame feature vector) is identical and
# pretrained parameters can be loaded via `params=`.
# ---------------------------------------------------------------------------


def smooth_bboxes(boxes: np.ndarray, window: int = 11) -> np.ndarray:
    """Temporal moving-average smoothing of per-frame person boxes
    (T, 4) [cx, cy, w, h] (reference smooth_bbox.py kalman/median filter)."""
    T = len(boxes)
    out = np.empty_like(boxes, dtype=np.float64)
    r = window // 2
    for t in range(T):
        lo, hi = max(0, t - r), min(T, t + r + 1)
        out[t] = np.median(boxes[lo:hi], axis=0)
    return out


def crop_person(frame: np.ndarray, box, out_size: int = 224,
                scale: float = 1.2) -> np.ndarray:
    """Square crop around [cx, cy, w, h] with margin, bilinear-resized to
    (out_size, out_size, C) and normalized to [-1, 1] (reference
    img_utils crop + SPIN constants)."""
    cx, cy, w, h = box
    s = max(w, h) * scale
    x0, y0 = cx - s / 2, cy - s / 2
    ys = np.clip(np.linspace(y0, y0 + s, out_size), 0, frame.shape[0] - 1)
    xs = np.clip(np.linspace(x0, x0 + s, out_size), 0, frame.shape[1] - 1)
    yi0 = np.floor(ys).astype(int)
    xi0 = np.floor(xs).astype(int)
    yi1 = np.minimum(yi0 + 1, frame.shape[0] - 1)
    xi1 = np.minimum(xi0 + 1, frame.shape[1] - 1)
    fy = (ys - yi0)[:, None, None] if frame.ndim == 3 else (ys - yi0)[:, None]
    fx = (xs - xi0)[None, :, None] if frame.ndim == 3 else (xs - xi0)[None, :]
    f = frame.astype(np.float64)
    top = f[yi0][:, xi0] * (1 - fx) + f[yi0][:, xi1] * fx
    bot = f[yi1][:, xi0] * (1 - fx) + f[yi1][:, xi1] * fx
    crop = top * (1 - fy) + bot * fy
    return (crop / 127.5 - 1.0).astype(np.float32)


class PersonFeatureExtractor:
    """Per-frame person features: smoothed bbox -> square crop -> ResNet-18
    encode (the reference's SPIN feature_extractor.py pipeline)."""

    def __init__(self, feature_dim: int = 2048, rng_seed: int = 0,
                 params=None, crop_size: int = 224):
        import jax
        import jax.numpy as jnp

        from kinpoly_tpu.models.aux_nets import ResNet18

        self.crop_size = crop_size
        self.net = ResNet18(out_dim=feature_dim)
        dummy = jnp.zeros((1, crop_size, crop_size, 3), jnp.float32)
        self.params = params or self.net.init(jax.random.PRNGKey(rng_seed), dummy)
        self._apply = jax.jit(lambda p, x: self.net.apply(p, x))

    def __call__(self, frames: np.ndarray, boxes: np.ndarray,
                 batch: int = 32) -> np.ndarray:
        """frames (T, H, W, 3) uint8, boxes (T, 4) [cx, cy, w, h] ->
        (T, feature_dim)."""
        boxes = smooth_bboxes(np.asarray(boxes, np.float64))
        crops = np.stack([crop_person(f, b, self.crop_size)
                          for f, b in zip(frames, boxes)])
        feats = [np.asarray(self._apply(self.params, crops[i:i + batch]))
                 for i in range(0, len(crops), batch)]
        return np.concatenate(feats)
