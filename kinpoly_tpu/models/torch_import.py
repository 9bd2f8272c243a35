"""Torch checkpoint importer — maps reference-architecture torch state dicts
onto this framework's flax parameter pytrees, so trained reference weights
(UHC PolicyGaussian/MCP + Value, TrajARNet) can be evaluated here directly
(SURVEY §7 'checkpoint compatibility' de-risking).

Mappings (torch -> flax):
- nn.Linear: weight (out, in) -> Dense kernel (in, out) transposed; bias as-is
- nn.GRUCell/GRU layer: torch gates ordered (r, z, n) with weight_ih (3H, I),
  weight_hh (3H, H); flax GRUCell uses separate ir/iz/in_ and hr/hz/hn Dense
  kernels ((I, H)/(H, H)) with `n` biases split between bi_n and bh_n.
"""

from __future__ import annotations

import numpy as np


def _lin(sd, prefix):
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def import_mlp(sd: dict, prefix: str, n_layers: int) -> dict:
    """Reference MLP (uhc/khrylib/models/mlp.py): affine_layers.{i}."""
    return {f"Dense_{i}": _lin(sd, f"{prefix}affine_layers.{i}")
            for i in range(n_layers)}


def import_gru_cell(sd: dict, w_ih_key: str, w_hh_key: str,
                    b_ih_key: str | None = None, b_hh_key: str | None = None) -> dict:
    """Torch GRU weights -> flax nn.GRUCell params."""
    w_ih = np.asarray(sd[w_ih_key])        # (3H, I), gates (r, z, n)
    w_hh = np.asarray(sd[w_hh_key])        # (3H, H)
    H = w_ih.shape[0] // 3
    ir, iz, in_ = w_ih[:H], w_ih[H:2 * H], w_ih[2 * H:]
    hr, hz, hn = w_hh[:H], w_hh[H:2 * H], w_hh[2 * H:]
    out = {
        "ir": {"kernel": ir.T}, "iz": {"kernel": iz.T}, "in": {"kernel": in_.T},
        "hr": {"kernel": hr.T}, "hz": {"kernel": hz.T}, "hn": {"kernel": hn.T},
    }
    if b_ih_key and b_ih_key in sd:
        b_ih = np.asarray(sd[b_ih_key])
        b_hh = np.asarray(sd[b_hh_key])
        out["ir"]["bias"] = b_ih[:H] + b_hh[:H]
        out["iz"]["bias"] = b_ih[H:2 * H] + b_hh[H:2 * H]
        out["in"]["bias"] = b_ih[2 * H:]
        out["hn"]["bias"] = b_hh[2 * H:]
    return out


def import_policy_gaussian(sd: dict, n_hidden: int = 2) -> dict:
    """Reference PolicyGaussian (net=MLP + action_mean Linear) -> flax
    nets.PolicyGaussian params."""
    params = {"MLP_0": import_mlp(sd, "net.", n_hidden)}
    params["Dense_0"] = _lin(sd, "action_mean")
    return {"params": params}


def import_value(sd: dict, n_hidden: int = 2) -> dict:
    """Reference Value (net=MLP + value_head Linear) -> nets.Value params."""
    params = {"MLP_0": import_mlp(sd, "net.", n_hidden)}
    params["Dense_0"] = _lin(sd, "value_head")
    return {"params": params}


def import_policy_mcp(sd: dict, num_primitive: int = 8,
                      n_hidden: int = 2, n_comp_hidden: int = 2) -> dict:
    """Reference PolicyMCP -> nets.PolicyMCP params.

    Reference layout (uhc/core/policy_mcp.py): per-primitive nets
    ``norm_mlps.{p}...`` + heads, composer ``composer...``. Exact key names
    vary across snapshots; this importer accepts the common
    (primitive MLP list + linear heads + composer MLP + linear) shape.
    """
    params = {}
    for p in range(num_primitive):
        params[f"MLP_{p}"] = import_mlp(sd, f"primitives.{p}.net.", n_hidden)
        params[f"Dense_{p}"] = _lin(sd, f"primitives.{p}.head")
    params[f"MLP_{num_primitive}"] = import_mlp(sd, "composer.net.", n_comp_hidden)
    params[f"Dense_{num_primitive}"] = _lin(sd, "composer.head")
    return {"params": params}


def verify_same_output(flax_module, flax_params, torch_module, x: np.ndarray,
                       atol: float = 1e-5) -> float:
    """Utility: max |flax(x) - torch(x)| for a converted module pair."""
    import torch

    with torch.no_grad():
        t_out = torch_module(torch.from_numpy(x)).numpy()
    f_out = np.asarray(flax_module.apply(flax_params, x))
    err = float(np.abs(f_out - t_out).max())
    assert err < atol, err
    return err
