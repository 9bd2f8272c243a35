"""Torch -> flax weight conversion parity, using live torch modules built to
the reference architectures (torch CPU is available in the image)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from kinpoly_tpu.models import nets, torch_import


class TorchMLP(tnn.Module):
    """Reference uhc/khrylib/models/mlp.py architecture."""

    def __init__(self, in_dim, hidden, act="relu"):
        super().__init__()
        self.affine_layers = tnn.ModuleList()
        last = in_dim
        for h in hidden:
            self.affine_layers.append(tnn.Linear(last, h))
            last = h
        self.act = torch.relu

    def forward(self, x):
        for l in self.affine_layers:
            x = self.act(l(x))
        return x


class TorchPolicyGaussian(tnn.Module):
    def __init__(self, state_dim, action_dim, hidden=(32, 16)):
        super().__init__()
        self.net = TorchMLP(state_dim, hidden)
        self.action_mean = tnn.Linear(hidden[-1], action_dim)

    def forward(self, x):
        return self.action_mean(self.net(x))


class TorchValue(tnn.Module):
    def __init__(self, state_dim, hidden=(32, 16)):
        super().__init__()
        self.net = TorchMLP(state_dim, hidden)
        self.value_head = tnn.Linear(hidden[-1], 1)

    def forward(self, x):
        return self.value_head(self.net(x))


def test_policy_gaussian_roundtrip():
    torch.manual_seed(0)
    tp = TorchPolicyGaussian(10, 4).double()
    sd = {k: v.numpy() for k, v in tp.state_dict().items()}
    params = torch_import.import_policy_gaussian(sd)

    fp = nets.PolicyGaussian(action_dim=4, hidden=(32, 16))
    x = np.random.RandomState(0).randn(7, 10)
    mean, _ = fp.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = tp(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(mean), ref, atol=1e-10)


def test_value_roundtrip():
    torch.manual_seed(1)
    tv = TorchValue(10).double()
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params = torch_import.import_value(sd)

    fv = nets.Value(hidden=(32, 16))
    x = np.random.RandomState(1).randn(5, 10)
    v = fv.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = tv(torch.from_numpy(x)).numpy()[:, 0]
    np.testing.assert_allclose(np.asarray(v), ref, atol=1e-10)


def test_gru_cell_roundtrip():
    import flax.linen as fnn

    torch.manual_seed(2)
    tg = tnn.GRUCell(6, 8).double()
    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    cell_params = torch_import.import_gru_cell(
        sd, "weight_ih", "weight_hh", "bias_ih", "bias_hh")

    fg = fnn.GRUCell(features=8)
    x = np.random.RandomState(2).randn(3, 6)
    h = np.random.RandomState(3).randn(3, 8)
    new_h, _ = fg.apply({"params": cell_params}, jnp.asarray(h), jnp.asarray(x))
    with torch.no_grad():
        ref = tg(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    np.testing.assert_allclose(np.asarray(new_h), ref, atol=1e-10)
