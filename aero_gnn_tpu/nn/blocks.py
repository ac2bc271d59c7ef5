"""Message-passing blocks: Edge/Node updates and the residual MGN layer.

Pure-function re-design of the reference blocks
(/root/reference/models/mgnLayer.py):

  * ``edge_block``       — MLP over [e, x_src, x_dst] (EdgeBlock, :10-49)
  * ``edge_block_sum``   — the "concat trick": split the first linear into
    W_e/W_s/W_d, project nodes *before* the gather so only [N,h] -> [E,h]
    moves (EdgeBlockSum, :51-105). This is the SDDMM-shaped form that the
    Pallas fused kernel consumes. NOTE the reference hardcodes ReLU in this
    block regardless of the configured activation (:81); we reproduce that
    behind ``edge_sum_activation`` (default "relu") so parity holds while
    remaining configurable.
  * ``node_block``       — scatter-aggregate incoming messages by receiver
    (add | mean), concat with node state, MLP (NodeBlock, :111-153)
  * ``mgn_layer``        — edge update + residual, then node update +
    residual, in that order (:177-213)

All functions take explicit masks so pad edges/nodes contribute zeros.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from aero_gnn_tpu import ops
from aero_gnn_tpu.nn import mlp as M


@dataclasses.dataclass(frozen=True)
class MGNLayerConfig:
    node_dim: int
    edge_dim: int
    hidden_dim: int = 128
    num_hidden_layers_node: int = 1
    num_hidden_layers_edge: int = 1
    activation: str = "relu"
    use_layer_norm: bool = True
    aggregation: str = "add"
    do_concat_trick: bool = False
    # Reference quirk: EdgeBlockSum ignores the configured activation and
    # hardcodes ReLU (/root/reference/models/mgnLayer.py:81).
    edge_sum_activation: str = "relu"

    def ln_in_edge_block(self) -> bool:
        return self.use_layer_norm


# ---------------------------------------------------------------------------
# EdgeBlock (full concat form)
# ---------------------------------------------------------------------------

def edge_block_init(key: jax.Array, cfg: MGNLayerConfig, dtype=jnp.float32):
    input_dim = cfg.edge_dim + 2 * cfg.node_dim
    return M.mlp_init(
        key, input_dim, cfg.hidden_dim, cfg.edge_dim,
        num_hidden_layers=cfg.num_hidden_layers_edge,
        use_layer_norm=cfg.use_layer_norm, dtype=dtype,
    )


def edge_block_apply(
    params, cfg: MGNLayerConfig,
    edge_attr: jax.Array, node_attr: jax.Array,
    senders: jax.Array, receivers: jax.Array,
    sender_perm: Optional[jax.Array] = None,
    senders_sorted: Optional[jax.Array] = None,
    aligned: bool = False,
    sender_plan=None,
) -> jax.Array:
    x_src = ops.gather_senders(node_attr, senders, sender_perm,
                               senders_sorted, aligned, plan=sender_plan)
    x_dst = ops.gather_receivers(node_attr, receivers, aligned)
    edge_input = jnp.concatenate([edge_attr, x_src, x_dst], axis=-1)
    return M.mlp_apply(params, edge_input, activation=cfg.activation)


# ---------------------------------------------------------------------------
# EdgeBlockSum (concat trick / project-then-gather; the fusable form)
# ---------------------------------------------------------------------------

def edge_block_sum_init(key: jax.Array, cfg: MGNLayerConfig, dtype=jnp.float32):
    """Init by building one [De+2Dn, h] linear and splitting it, exactly the
    mathematical decomposition of EdgeBlock's first layer
    (/root/reference/models/mgnLayer.py:72-79)."""
    k0, krest = jax.random.split(key)
    full = M.linear_init(k0, cfg.edge_dim + 2 * cfg.node_dim, cfg.hidden_dim,
                         dtype)
    w_e = full["w"][: cfg.edge_dim]
    w_s = full["w"][cfg.edge_dim: cfg.edge_dim + cfg.node_dim]
    w_d = full["w"][cfg.edge_dim + cfg.node_dim:]
    # Post stack: ReLU, (Linear h->h, ReLU) * num_hidden, Linear h->edge_dim,
    # optional LN — i.e. an MLP whose *input* activation is applied first.
    dims = [(cfg.hidden_dim, cfg.hidden_dim)] * cfg.num_hidden_layers_edge
    dims += [(cfg.hidden_dim, cfg.edge_dim)]
    keys = jax.random.split(krest, len(dims))
    stack = [M.linear_init(k, fi, fo, dtype) for k, (fi, fo) in zip(keys, dims)]
    ln = M.layer_norm_init(cfg.edge_dim, dtype) if cfg.use_layer_norm else None
    return {"w_e": w_e, "w_s": w_s, "w_d": w_d, "b": full["b"],
            "stack": stack, "ln": ln}


def edge_block_sum_pre(
    params, edge_attr: jax.Array, node_attr: jax.Array,
    senders: jax.Array, receivers: jax.Array,
    sender_perm: Optional[jax.Array] = None,
    senders_sorted: Optional[jax.Array] = None,
    aligned: bool = False,
    sender_plan=None,
) -> jax.Array:
    """h0 = W_e e + (W_s x)[src] + (W_d x)[dst] + b — projections on [N,h]
    before the gather so the gather moves hidden-width rows only."""
    e_proj = edge_attr @ params["w_e"]
    s_proj = node_attr @ params["w_s"]
    d_proj = node_attr @ params["w_d"] + params["b"]
    return (e_proj
            + ops.gather_senders(s_proj, senders, sender_perm,
                                 senders_sorted, aligned,
                                 plan=sender_plan)
            + ops.gather_receivers(d_proj, receivers, aligned))


def edge_block_sum_post(params, h0: jax.Array, cfg: MGNLayerConfig) -> jax.Array:
    act = M.activation_fn(cfg.edge_sum_activation)
    z = act(h0)
    for lin in params["stack"][:-1]:
        z = act(z @ lin["w"] + lin["b"])
    lin = params["stack"][-1]
    z = z @ lin["w"] + lin["b"]
    if params["ln"] is not None:
        z = M.layer_norm_apply(params["ln"], z)
    return z


def edge_block_sum_apply(
    params, cfg: MGNLayerConfig,
    edge_attr: jax.Array, node_attr: jax.Array,
    senders: jax.Array, receivers: jax.Array,
    sender_perm: Optional[jax.Array] = None,
    senders_sorted: Optional[jax.Array] = None,
    aligned: bool = False,
    sender_plan=None,
) -> jax.Array:
    h0 = edge_block_sum_pre(params, edge_attr, node_attr, senders, receivers,
                            sender_perm, senders_sorted, aligned,
                            sender_plan=sender_plan)
    return edge_block_sum_post(params, h0, cfg)


# ---------------------------------------------------------------------------
# NodeBlock
# ---------------------------------------------------------------------------

def node_block_init(key: jax.Array, cfg: MGNLayerConfig, dtype=jnp.float32):
    input_dim = cfg.node_dim + cfg.edge_dim
    return M.mlp_init(
        key, input_dim, cfg.hidden_dim, cfg.node_dim,
        num_hidden_layers=cfg.num_hidden_layers_node,
        use_layer_norm=cfg.use_layer_norm, dtype=dtype,
    )


def node_block_post(params, cfg: MGNLayerConfig,
                    node_attr: jax.Array, edge_aggr: jax.Array) -> jax.Array:
    """Node MLP over [x, aggregated messages] (aggregation done by caller —
    lets the spatial-parallel path substitute its own local aggregation)."""
    node_input = jnp.concatenate([node_attr, edge_aggr], axis=-1)
    return M.mlp_apply(params, node_input, activation=cfg.activation)


def _fused_node_ok(params, cfg: MGNLayerConfig, node_attr) -> bool:
    """Gate for the fused node-block kernel: square ReLU+LN chain over
    row-block-divisible N (no edge-alignment requirement — dense only)."""
    import os

    from aero_gnn_tpu import ops as _ops

    if _ops.backend() != "pallas" or cfg.activation != "relu":
        return False
    if os.environ.get("AERO_GNN_FUSED_NODE", "1") != "1":
        return False
    n, h = node_attr.shape
    if n % 256 != 0:
        return False
    lins = params["linears"]
    if params["ln"] is None or len(lins) < 2:
        return False
    if lins[0]["w"].shape != (2 * h, h) or lins[-1]["w"].shape != (h, h):
        return False
    return all(lin["w"].shape == (h, h) for lin in lins[1:-1])


def _pack_node_split(params, h: int, dtype):
    """Split-concat packing of a NodeBlock MLP for the fused kernels:
    first linear split into W1x/W1a (rows [:h] / [h:]), hidden stack
    stacked, output linear + LN separate. Shared by the fused node kernel
    and the single-kernel mega layer."""
    lins = params["linears"]
    w1 = lins[0]["w"]
    hidden = lins[1:-1]
    ws = (jnp.stack([lin["w"] for lin in hidden]) if hidden
          else jnp.zeros((0, h, h), dtype))
    bs = (jnp.stack([lin["b"] for lin in hidden]) if hidden
          else jnp.zeros((0, h), dtype))
    return {"w1x": w1[:h], "w1a": w1[h:], "b1": lins[0]["b"],
            "ws": ws, "bs": bs,
            "w_out": lins[-1]["w"], "b_out": lins[-1]["b"],
            "ln_scale": params["ln"]["scale"],
            "ln_bias": params["ln"]["bias"]}


def node_block_post_residual(params, cfg: MGNLayerConfig,
                             node_attr: jax.Array,
                             edge_aggr: jax.Array) -> jax.Array:
    """x + NodeBlock(x, agg), routed to the fused Pallas kernel when legal."""
    if not _fused_node_ok(params, cfg, node_attr):
        return node_attr + node_block_post(params, cfg, node_attr, edge_aggr)
    from aero_gnn_tpu.ops.pallas_node import fused_node_layer

    p = _pack_node_split(params, node_attr.shape[1], node_attr.dtype)
    return fused_node_layer(
        node_attr, edge_aggr.astype(node_attr.dtype),
        p["w1x"], p["w1a"], p["b1"], p["ws"], p["bs"],
        p["w_out"], p["b_out"], p["ln_scale"], p["ln_bias"])


def node_block_apply(
    params, cfg: MGNLayerConfig,
    node_attr: jax.Array, edge_attr: jax.Array,
    receivers: jax.Array, edge_mask: Optional[jax.Array],
    aligned: bool = False,
) -> jax.Array:
    edge_aggr = ops.aggregate_edges(
        edge_attr, receivers, node_attr.shape[0],
        aggregation=cfg.aggregation, edge_mask=edge_mask, aligned=aligned,
    )
    return node_block_post(params, cfg, node_attr, edge_aggr)


# ---------------------------------------------------------------------------
# MGN layer (edge residual then node residual)
# ---------------------------------------------------------------------------

def mgn_layer_init(key: jax.Array, cfg: MGNLayerConfig, dtype=jnp.float32):
    ke, kn = jax.random.split(key)
    if cfg.do_concat_trick:
        edge = edge_block_sum_init(ke, cfg, dtype)
    else:
        edge = edge_block_init(ke, cfg, dtype)
    return {"edge": edge, "node": node_block_init(kn, cfg, dtype)}


def _fused_layer_ok(cfg: MGNLayerConfig, node_attr, receivers,
                    edge_mask, aligned: bool) -> bool:
    from aero_gnn_tpu import ops as _ops

    if not aligned or _ops.backend() != "pallas" or not cfg.do_concat_trick:
        return False
    if cfg.edge_sum_activation != "relu" or edge_mask is None:
        return False
    from aero_gnn_tpu.ops import pallas_segment as PS

    return (receivers.shape[0] % PS.ET == 0
            and node_attr.shape[0] % PS.NB == 0)


def _mega_layer_ok(params, cfg: MGNLayerConfig, node_attr) -> bool:
    """Gate for the single-kernel full-layer path (ops.pallas_mega): 'add'
    aggregation (no degree division between edge and node halves) plus the
    fused-node-kernel legality at the NB block size."""
    from aero_gnn_tpu.ops.pallas_mega import NB, mega_enabled

    if cfg.aggregation != "add" or not mega_enabled():
        return False
    if not _fused_node_ok(params["node"], cfg, node_attr):
        return False
    return node_attr.shape[0] % NB == 0


def _mgn_layer_fused(params, cfg: MGNLayerConfig, node_attr, edge_attr,
                     senders, receivers, edge_mask, sender_perm,
                     senders_sorted, sender_plan=None):
    # (only reached when _fused_layer_ok: the streams are block-aligned)
    """Pallas fused path: whole edge-MLP chain + residual + receiver-side
    gather + aggregation in one kernel (ops.pallas_fused); node update
    stays on XLA. Only the sender-side gather materializes [E, h].
    When legal (_mega_layer_ok) the node update fuses into the SAME kernel
    as a per-node-block epilogue (ops.pallas_mega)."""
    from aero_gnn_tpu import ops
    from aero_gnn_tpu.ops.pallas_fused import fused_edge_layer

    from jax.ad_checkpoint import checkpoint_name

    p = params["edge"]
    s_proj = node_attr @ p["w_s"]
    d_proj = checkpoint_name(node_attr @ p["w_d"] + p["b"], "mgn_dproj")
    sg = checkpoint_name(
        ops.gather_senders(s_proj, senders, sender_perm, senders_sorted,
                           aligned=True, plan=sender_plan),
        "mgn_sg")
    ws = (jnp.stack([s["w"] for s in p["stack"][:-1]])
          if len(p["stack"]) > 1
          else jnp.zeros((0, s_proj.shape[1], s_proj.shape[1]),
                         s_proj.dtype))
    bs = (jnp.stack([s["b"] for s in p["stack"][:-1]])
          if len(p["stack"]) > 1
          else jnp.zeros((0, s_proj.shape[1]), s_proj.dtype))
    if _mega_layer_ok(params, cfg, node_attr):
        from aero_gnn_tpu.ops.pallas_mega import fused_mgn_layer

        h = s_proj.shape[1]
        ep = {"w_e": p["w_e"], "ws": ws, "bs": bs,
              "w_out": p["stack"][-1]["w"], "b_out": p["stack"][-1]["b"],
              "ln_scale": p["ln"]["scale"], "ln_bias": p["ln"]["bias"]}
        npar = _pack_node_split(params["node"], h, node_attr.dtype)
        node_attr, edge_attr = fused_mgn_layer(
            edge_attr, sg, d_proj, node_attr, edge_mask, receivers,
            ep, npar, node_attr.shape[0])
        return node_attr, edge_attr
    edge_attr, agg = fused_edge_layer(
        edge_attr, sg, d_proj, edge_mask, receivers,
        p["w_e"], ws, bs, p["stack"][-1]["w"], p["stack"][-1]["b"],
        p["ln"]["scale"], p["ln"]["bias"],
        node_attr.shape[0], cfg.edge_sum_activation)
    agg = checkpoint_name(agg, "mgn_agg")
    if cfg.aggregation == "mean":
        deg = ops.degree(receivers, node_attr.shape[0], mask=edge_mask,
                         dtype=agg.dtype)
        agg = agg / jnp.maximum(deg, 1.0)[:, None]
    node_attr = node_block_post_residual(params["node"], cfg,
                                         node_attr, agg)
    return node_attr, edge_attr


def mgn_layer_apply(
    params, cfg: MGNLayerConfig,
    node_attr: jax.Array, edge_attr: jax.Array,
    senders: jax.Array, receivers: jax.Array,
    edge_mask: Optional[jax.Array] = None,
    sender_perm: Optional[jax.Array] = None,
    senders_sorted: Optional[jax.Array] = None,
    aligned: bool = False,
    sender_plan=None,
):
    """One processor step; returns (node_attr', edge_attr').

    ``aligned`` declares the edge streams block-aligned
    (build_graph_batch(align_edges=True)); it gates every Pallas dispatch.
    """
    if (cfg.do_concat_trick and cfg.ln_in_edge_block()
            and _fused_layer_ok(cfg, node_attr, receivers, edge_mask,
                                aligned)):
        return _mgn_layer_fused(params, cfg, node_attr, edge_attr,
                                senders, receivers, edge_mask,
                                sender_perm, senders_sorted, sender_plan)
    if cfg.do_concat_trick:
        delta_e = edge_block_sum_apply(
            params["edge"], cfg, edge_attr, node_attr, senders, receivers,
            sender_perm, senders_sorted, aligned, sender_plan=sender_plan)
    else:
        delta_e = edge_block_apply(
            params["edge"], cfg, edge_attr, node_attr, senders, receivers,
            sender_perm, senders_sorted, aligned, sender_plan=sender_plan)
    edge_attr = edge_attr + delta_e
    delta_n = node_block_apply(
        params["node"], cfg, node_attr, edge_attr, receivers, edge_mask,
        aligned)
    node_attr = node_attr + delta_n
    return node_attr, edge_attr
