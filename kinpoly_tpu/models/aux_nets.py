"""Auxiliary / legacy model zoo — flax ports of the reference's secondary
networks (SURVEY §2.3: ``kin_poly/models/`` + ``uhc/khrylib/models/``).
None are on the dynamics-regulated main path, but they complete the model
inventory: visual feature encoders, temporal baselines, the VAE occupancy
model, the GAIL discriminator, and the video-to-state nets.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from kinpoly_tpu.models.nets import MLP
from kinpoly_tpu.models.rnn import RNN


class ResBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False)(x)
        return nn.relu(x + y)


class ResNet18(nn.Module):
    """ResNet-18 feature encoder (reference kin_poly/models/resnet.py: torchvision
    resnet18 with a replaced fc head producing `out_dim` features)."""
    out_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for feats, stride in [(64, 1), (64, 1), (128, 2), (128, 1),
                              (256, 2), (256, 1), (512, 2), (512, 1)]:
            x = ResBlock(feats, stride)(x, train)
        x = x.mean(axis=(-3, -2))
        return nn.Dense(self.out_dim)(x)


class DWBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(x.shape[-1], (3, 3), strides=(self.stride, self.stride),
                    feature_group_count=x.shape[-1], use_bias=False)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train)(x))
        x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        return nn.relu(nn.BatchNorm(use_running_average=not train)(x))


class MobileNet(nn.Module):
    """Depthwise-separable CNN encoder (kin_poly/models/mobile_net.py)."""
    out_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), use_bias=False)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train)(x))
        for feats, stride in [(64, 1), (128, 2), (128, 1), (256, 2),
                              (256, 1), (512, 2)]:
            x = DWBlock(feats, stride)(x, train)
        x = x.mean(axis=(-3, -2))
        return nn.Dense(self.out_dim)(x)


class SimpleCNN(nn.Module):
    """Small conv encoder (kin_poly/models/simple_cnn.py)."""
    out_dim: int = 128

    @nn.compact
    def __call__(self, x):
        for feats in (32, 64, 128):
            x = nn.relu(nn.Conv(feats, (3, 3), strides=(2, 2))(x))
        x = x.mean(axis=(-3, -2))
        return nn.Dense(self.out_dim)(x)


class TCN(nn.Module):
    """Temporal conv net over (B, T, D) with dilated causal convs
    (kin_poly/models/tcn.py)."""
    channels: Sequence[int] = (64, 64, 64)
    kernel: int = 3
    out_dim: int = 64

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate(self.channels):
            d = 2**i
            pad = (self.kernel - 1) * d
            y = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            x = nn.relu(nn.Conv(ch, (self.kernel,), kernel_dilation=(d,),
                                padding="VALID")(y))
        return nn.Dense(self.out_dim)(x)


class ERDNet(nn.Module):
    """Encoder-recurrent-decoder baseline (kin_poly/models/erd_net.py)."""
    state_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x, time_axis: int = 1):
        x = MLP((self.hidden,), "relu")(x)
        x = RNN(self.hidden, "lstm")(x, time_axis)
        x = MLP((self.hidden,), "relu")(x)
        return nn.Dense(self.state_dim)(x)


class CMLP(nn.Module):
    """Conditional MLP (kin_poly/models/causal_mlp.py): per-step MLP over a
    window of concatenated frames."""
    out_dim: int
    window: int = 5
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        pads = jnp.pad(x, ((0, 0), (self.window - 1, 0), (0, 0)))
        idx = jnp.arange(T)[:, None] + jnp.arange(self.window)[None, :]
        win = pads[:, idx].reshape(B, T, self.window * D)
        return nn.Dense(self.out_dim)(MLP(self.hidden, "relu")(win))


class Discriminator(nn.Module):
    """GAIL-style discriminator head (uhc/khrylib/models/discriminator.py)."""
    hidden: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(MLP(self.hidden, "tanh")(x))[..., 0]


class VideoRegNet(nn.Module):
    """Video -> pose regression (kin_poly/models/video_reg_net.py): CNN
    features + bidirectional RNN + MLP head."""
    out_dim: int
    cnn_fdim: int = 128
    hidden: int = 256

    @nn.compact
    def __call__(self, frames, train: bool = False):
        B, T = frames.shape[:2]
        feats = ResNet18(self.cnn_fdim)(frames.reshape((B * T,) + frames.shape[2:]), train)
        feats = feats.reshape(B, T, self.cnn_fdim)
        h = RNN(self.hidden, "gru", bi_dir=True)(feats)
        return nn.Dense(self.out_dim)(MLP((self.hidden,), "relu")(h))


class VideoStateNet(nn.Module):
    """Video -> per-frame latent state (kin_poly/models/video_state_net.py)."""
    state_dim: int = 128
    hidden: int = 256

    @nn.compact
    def __call__(self, feats):
        h = RNN(self.hidden, "gru", bi_dir=True)(feats)
        return nn.Dense(self.state_dim)(h)


class VideoForecastNet(nn.Module):
    """Latent forecasting head (kin_poly/models/video_forecast_net.py)."""
    state_dim: int = 128
    hidden: int = 256
    horizon: int = 30

    @nn.compact
    def __call__(self, feats):
        h = RNN(self.hidden, "gru")(feats)
        last = h[:, -1]
        dec = nn.GRUCell(features=self.hidden)

        def step(mdl, carry, _):
            carry, out = mdl(carry, jnp.zeros_like(last[..., :1]))
            return carry, out

        scan = nn.transforms.scan(step, variable_broadcast="params",
                                  split_rngs={"params": False}, length=self.horizon)
        _, outs = scan(dec, last, None)
        outs = jnp.moveaxis(outs, 0, 1)
        return nn.Dense(self.state_dim)(outs)


class SpaceNet(nn.Module):
    """3D-conv VAE over voxel occupancy maps (kin_poly/models/space_net.py)."""
    latent_dim: int = 64

    @nn.compact
    def __call__(self, voxels, rng=None):
        x = voxels
        for feats in (16, 32, 64):
            x = nn.relu(nn.Conv(feats, (3, 3, 3), strides=(2, 2, 2))(x))
        flat = x.reshape(x.shape[0], -1)
        mu = nn.Dense(self.latent_dim)(flat)
        logvar = nn.Dense(self.latent_dim)(flat)
        if rng is not None:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        else:
            z = mu
        y = nn.Dense(flat.shape[-1])(z).reshape(x.shape)
        for feats in (32, 16, 1):
            y = nn.ConvTranspose(feats, (3, 3, 3), strides=(2, 2, 2))(y)
            if feats != 1:
                y = nn.relu(y)
        return y, mu, logvar


class PolicyDiscrete(nn.Module):
    """Categorical policy head (uhc/khrylib/rl/core/policy_disc.py)."""
    action_num: int
    hidden: Sequence[int] = (512, 256)

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.action_num)(MLP(self.hidden, "relu")(x))


def categorical_sample(rng, logits):
    return jax.random.categorical(rng, logits, axis=-1)


def categorical_log_prob(action, logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, action[..., None], axis=-1)[..., 0]
