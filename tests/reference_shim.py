"""Import harness for the read-only reference implementation.

Lets the parity tests run the ACTUAL reference model code
(/root/reference/models/*.py, torch CPU) by shimming its two external CUDA
dependencies with pure-torch equivalents:

  * torch_scatter.scatter_add / scatter_mean  -> index_add_ based
  * torch_geometric.nn.global_{mean,max,add}_pool -> segment ops

plus weight converters torch -> aero_gnn_tpu param pytrees, so per-layer
activation parity (BASELINE north star) is checked against the reference
itself, not against a re-implementation.
"""

import sys
import types

import numpy as np
import torch

REFERENCE_PATH = "/root/reference"


def _scatter_add(src, index, dim=0, dim_size=None):
    assert dim == 0
    n = dim_size if dim_size is not None else int(index.max()) + 1
    out = src.new_zeros((n,) + src.shape[1:])
    out.index_add_(0, index, src)
    return out


def _scatter_mean(src, index, dim=0, dim_size=None):
    s = _scatter_add(src, index, dim, dim_size)
    cnt = _scatter_add(torch.ones_like(src[:, :1]), index, dim, dim_size)
    return s / cnt.clamp(min=1.0)


def _global_pool(reduce):
    def pool(x, batch):
        n = int(batch.max()) + 1 if batch.numel() else 0
        if reduce == "mean":
            return _scatter_mean(x, batch, 0, n)
        if reduce == "add":
            return _scatter_add(x, batch, 0, n)
        out = x.new_full((n,) + x.shape[1:], float("-inf"))
        for g in range(n):
            out[g] = x[batch == g].max(dim=0).values
        return out
    return pool


def install_shims() -> None:
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")
        ts.scatter_add = _scatter_add
        ts.scatter_mean = _scatter_mean
        ts.scatter = _scatter_add
        sys.modules["torch_scatter"] = ts
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tg_nn = types.ModuleType("torch_geometric.nn")
        tg_nn.global_mean_pool = _global_pool("mean")
        tg_nn.global_max_pool = _global_pool("max")
        tg_nn.global_add_pool = _global_pool("add")
        # class stubs so `from torch_geometric.nn import ...` resolves
        # (trial1.py imports but never instantiates these)
        for name in ("MessagePassing", "GCNConv", "GINEConv", "GraphSAGE"):
            setattr(tg_nn, name, type(name, (), {}))
        tg.nn = tg_nn
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.nn"] = tg_nn
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


# ---------------------------------------------------------------------------
# weight converters: reference torch modules -> aero_gnn_tpu param pytrees
# ---------------------------------------------------------------------------

def _t(x: torch.Tensor) -> np.ndarray:
    return x.detach().cpu().numpy()


def convert_mlp(ref_mlp) -> dict:
    linears = [{"w": _t(l.weight).T.copy(), "b": _t(l.bias).copy()}
               for l in ref_mlp.layers]
    ln = None
    if ref_mlp.use_layer_norm:
        ln = {"scale": _t(ref_mlp.layer_norm.weight).copy(),
              "bias": _t(ref_mlp.layer_norm.bias).copy()}
    return {"linears": linears, "ln": ln}


def convert_edge_block_sum(ref) -> dict:
    stack, ln = [], None
    for mod in ref.mlp:
        if isinstance(mod, torch.nn.Linear):
            stack.append({"w": _t(mod.weight).T.copy(),
                          "b": _t(mod.bias).copy()})
        elif isinstance(mod, torch.nn.LayerNorm):
            ln = {"scale": _t(mod.weight).copy(),
                  "bias": _t(mod.bias).copy()}
    return {"w_e": _t(ref.edge_lin).T.copy(),
            "w_s": _t(ref.src_lin).T.copy(),
            "w_d": _t(ref.dst_lin).T.copy(),
            "b": _t(ref.bias).copy(),
            "stack": stack, "ln": ln}


def convert_mgn_layer(ref) -> dict:
    if type(ref.edge_block).__name__ == "EdgeBlockSum":
        edge = convert_edge_block_sum(ref.edge_block)
    else:
        edge = convert_mlp(ref.edge_block.mlp)
    return {"edge": edge, "node": convert_mlp(ref.node_block.mlp)}


def convert_mgn(ref) -> dict:
    import jax
    import jax.numpy as jnp
    layers = [convert_mgn_layer(l) for l in ref.layers]
    stacked = jax.tree.map(lambda *xs: jnp.stack(
        [jnp.asarray(x) for x in xs]), *layers)
    return {
        "node_encoder": convert_mlp(ref.node_encoder),
        "edge_encoder": convert_mlp(ref.edge_encoder),
        "layers": stacked,
        "decoder": convert_mlp(ref.decoder),
    }


def convert_bsms(ref) -> dict:
    import jax
    import jax.numpy as jnp

    def stack(layer_list):
        layers = [convert_mgn_layer(l) for l in layer_list]
        return jax.tree.map(lambda *xs: jnp.stack(
            [jnp.asarray(x) for x in xs]), *layers)

    return {
        "node_encoder": convert_mlp(ref.node_encoder),
        "edge_encoder": convert_mlp(ref.edge_encoder),
        "down": [stack(block) for block in ref.down_layers],
        "bottleneck": stack(ref.bottleneck_layers),
        "up": [stack(block) for block in ref.up_layers],
        "decoder": convert_mlp(ref.decoder),
    }
