"""MeshGraphNet_v2 ("trial1"): simplified MGN variant with global context.

Re-design of /root/reference/models/trial1.py:10-116. Differences from MGN:
  * its own MLP convention (``build_mlp``, trial1.py:10-16): Linear+ReLU,
    then (Linear+ReLU+Dropout) * num_hidden, final Linear, optional LN —
    note the activation also follows the FIRST linear.
  * the edge MLP sees ONLY edge features (no node gather, trial1.py:62-65).
  * node update aggregates with scatter_mean (trial1.py:68).
  * a global mean-pool context (GlobalEncoder: MLP no-LN + extra Linear +
    mean pool, trial1.py:36-51) concatenated onto raw node features.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from aero_gnn_tpu import ops
from aero_gnn_tpu.graph.padded import GraphBatch
from aero_gnn_tpu.nn import mlp as M


def build_mlp_init(key, input_dim, hidden_dim, output_dim,
                   num_hidden_layers=2, lay_norm=True, dtype=jnp.float32):
    dims = [(input_dim, hidden_dim)]
    dims += [(hidden_dim, hidden_dim)] * num_hidden_layers
    dims += [(hidden_dim, output_dim)]
    keys = jax.random.split(key, len(dims))
    linears = [M.linear_init(k, fi, fo, dtype) for k, (fi, fo) in zip(keys, dims)]
    ln = M.layer_norm_init(output_dim, dtype) if lay_norm else None
    return {"linears": linears, "ln": ln}


def build_mlp_apply(params, x, *, dropout: float = 0.0,
                    rng: Optional[jax.Array] = None):
    linears = params["linears"]
    # first linear + ReLU (no dropout), hidden linears + ReLU + dropout,
    # final linear, optional LN — trial1.py:10-16 exactly.
    x = jax.nn.relu(x @ linears[0]["w"] + linears[0]["b"])
    for i, lin in enumerate(linears[1:-1]):
        x = jax.nn.relu(x @ lin["w"] + lin["b"])
        if dropout > 0.0 and rng is not None:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    lin = linears[-1]
    x = x @ lin["w"] + lin["b"]
    if params["ln"] is not None:
        x = M.layer_norm_apply(params["ln"], x)
    return x


@dataclasses.dataclass(frozen=True)
class MGNv2Config:
    node_input_size: int
    edge_input_size: int
    hidden_channels: int
    out_channels: int
    num_graph_conv_layers: int
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dropout: float = 0.0
    # Python-unrolled conv loop (see models.mgn.scan_layers)
    unroll: bool = False

    def init(self, key: jax.Array, dtype=jnp.float32):
        kn, ke, kg, kgl, kl, kd = jax.random.split(key, 6)
        h = self.hidden_channels
        node_enc = build_mlp_init(kn, self.node_input_size + h, h, h,
                                  self.num_encoder_layers, True, dtype)
        edge_enc = build_mlp_init(ke, self.edge_input_size, h, h,
                                  self.num_encoder_layers, True, dtype)
        glob = build_mlp_init(kg, self.node_input_size, h, h,
                              self.num_encoder_layers, False, dtype)
        glob_lin = M.linear_init(kgl, h, h, dtype)
        layer_keys = jax.random.split(kl, self.num_graph_conv_layers)
        layers = []
        for k in layer_keys:
            k1, k2 = jax.random.split(k)
            layers.append({
                "edge_mlp": build_mlp_init(k1, h, h, h, 2, True, dtype),
                "node_mlp": build_mlp_init(k2, 2 * h, h, h, 2, True, dtype),
            })
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        dec = build_mlp_init(kd, h, h, self.out_channels,
                             self.num_decoder_layers - 1, False, dtype)
        return {"node_encoder": node_enc, "edge_encoder": edge_enc,
                "global_encoder": glob, "global_linout": glob_lin,
                "layers": stacked, "decoder": dec}

    def apply(self, params, graph: GraphBatch, *,
              rng: Optional[jax.Array] = None) -> jax.Array:
        g = build_mlp_apply(params["global_encoder"], graph.x)
        g = g @ params["global_linout"]["w"] + params["global_linout"]["b"]
        pooled = ops.graph_pool(g, graph.node_graph, graph.num_graphs_pad,
                                method="mean", node_mask=graph.node_mask)
        per_node = ops.graph_broadcast(pooled, graph.node_graph)
        x = jnp.concatenate([graph.x, per_node], axis=-1)

        x = build_mlp_apply(params["node_encoder"], x, dropout=self.dropout,
                            rng=rng)
        e = build_mlp_apply(params["edge_encoder"], graph.edge_attr,
                            dropout=self.dropout,
                            rng=None if rng is None else jax.random.fold_in(rng, 1))

        receivers, edge_mask = graph.receivers, graph.edge_mask
        num_nodes = x.shape[0]

        def body(carry, layer):
            x, e = carry
            e = e + build_mlp_apply(layer["edge_mlp"], e)
            agg = ops.aggregate_edges(e, receivers, num_nodes,
                                      aggregation="mean", edge_mask=edge_mask,
                                      aligned=graph.edges_aligned)
            x = x + build_mlp_apply(layer["node_mlp"],
                                    jnp.concatenate([x, agg], axis=-1))
            return (x, e), None

        from aero_gnn_tpu.models.mgn import scan_layers
        x, e = scan_layers(body, (x, e), params["layers"],
                           unroll=getattr(self, "unroll", False))
        return build_mlp_apply(params["decoder"], x, dropout=self.dropout,
                               rng=None if rng is None else jax.random.fold_in(rng, 2))
