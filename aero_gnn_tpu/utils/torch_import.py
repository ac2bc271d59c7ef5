"""Import trained reference checkpoints (torch ``model_weights.pt``).

Migration path for users of the reference framework: load a torch
state_dict produced by /root/reference/train.py:271 and convert it into
this framework's parameter pytrees, so trained models can be served on TPU
without retraining. Pure state_dict parsing — no torch module classes and
no torch_geometric/torch_scatter needed (torch CPU only, for deserializing
the .pt file).

Key layout of the reference modules (state_dict keys):
  MLP:           layers.<i>.weight/.bias, layer_norm.weight/.bias
  EdgeBlock:     edge_block.mlp.<MLP>
  EdgeBlockSum:  edge_block.edge_lin / src_lin / dst_lin / bias,
                 edge_block.mlp.<seq idx>.weight/.bias (Sequential)
  NodeBlock:     node_block.mlp.<MLP>
  MGN:           node_encoder.<MLP>, edge_encoder.<MLP>,
                 layers.<L>.<layer>, decoder.<MLP>
  poolMGN:       + global_encoder.<MLP>
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: _np(v) for k, v in sd.items()}


def _subdict(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_mlp_sd(sd: Dict[str, np.ndarray]) -> dict:
    """`layers.<i>.weight/.bias` (+ optional layer_norm) -> MLP params."""
    idxs = sorted({int(m.group(1)) for k in sd
                   if (m := re.match(r"layers\.(\d+)\.weight", k))})
    linears = [{"w": sd[f"layers.{i}.weight"].T.copy(),
                "b": sd[f"layers.{i}.bias"].copy()} for i in idxs]
    ln = None
    if "layer_norm.weight" in sd:
        ln = {"scale": sd["layer_norm.weight"].copy(),
              "bias": sd["layer_norm.bias"].copy()}
    return {"linears": linears, "ln": ln}


def convert_edge_block_sum_sd(sd: Dict[str, np.ndarray]) -> dict:
    """EdgeBlockSum: split linears + `mlp.<seq>` Sequential stack."""
    seq_idx = sorted({int(m.group(1)) for k in sd
                      if (m := re.match(r"mlp\.(\d+)\.weight", k))})
    stack, ln = [], None
    for i in seq_idx:
        w = sd[f"mlp.{i}.weight"]
        if w.ndim == 2:
            stack.append({"w": w.T.copy(), "b": sd[f"mlp.{i}.bias"].copy()})
        else:  # LayerNorm weight is 1-D
            ln = {"scale": w.copy(), "bias": sd[f"mlp.{i}.bias"].copy()}
    return {"w_e": sd["edge_lin"].T.copy(), "w_s": sd["src_lin"].T.copy(),
            "w_d": sd["dst_lin"].T.copy(), "b": sd["bias"].copy(),
            "stack": stack, "ln": ln}


def _convert_layer_sd(sd: Dict[str, np.ndarray]) -> dict:
    if "edge_block.edge_lin" in sd:
        edge = convert_edge_block_sum_sd(_subdict(sd, "edge_block."))
    else:
        edge = convert_mlp_sd(_subdict(sd, "edge_block.mlp."))
    node = convert_mlp_sd(_subdict(sd, "node_block.mlp."))
    return {"edge": edge, "node": node}


def convert_mgn_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference MeshGraphNet / poolMGN / FourierMGN state_dict -> params."""
    import jax
    import jax.numpy as jnp

    n_layers = max(int(m.group(1)) for k in sd
                   if (m := re.match(r"layers\.(\d+)\.", k))) + 1
    layers: List[dict] = [
        _convert_layer_sd(_subdict(sd, f"layers.{i}."))
        for i in range(n_layers)
    ]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layers)
    params: Dict[str, Any] = {
        "node_encoder": convert_mlp_sd(_subdict(sd, "node_encoder.")),
        "edge_encoder": convert_mlp_sd(_subdict(sd, "edge_encoder.")),
        "layers": stacked,
        "decoder": convert_mlp_sd(_subdict(sd, "decoder.")),
    }
    if any(k.startswith("global_encoder.") for k in sd):
        params["global_encoder"] = convert_mlp_sd(
            _subdict(sd, "global_encoder."))
    return params


def convert_mlpnet_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {"encoder": convert_mlp_sd(_subdict(sd, "mlp.")),
            "decoder": convert_mlp_sd(_subdict(sd, "decoder."))}


def import_reference_checkpoint(path: str, model_kind: str) -> Dict[str, Any]:
    """Load + convert a reference ``model_weights.pt`` for ``model_kind``
    in {"mgn", "poolmgn", "fouriermgn", "mlpnet"}."""
    sd = load_state_dict(path)
    if model_kind in ("mgn", "poolmgn", "fouriermgn"):
        return convert_mgn_state_dict(sd)
    if model_kind == "mlpnet":
        return convert_mlpnet_state_dict(sd)
    raise ValueError(f"Unsupported model kind for import: {model_kind}")
