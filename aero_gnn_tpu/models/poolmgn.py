"""poolMGN: MeshGraphNet with one-shot global-context injection.

Re-design of /root/reference/models/poolmgn.py:11-157: a global encoder MLP
(no LN) runs over the RAW node features, is pooled per graph
(mean | max | add), broadcast back to every node, and concatenated onto the
node-encoder input (input_node_dim + global_dim).

TPU-native: pooling is a masked segment reduction over the batch vector and
the broadcast is a gather by graph id — both static-shape
(vs repeat_interleave(bincount(batch)) in the reference, poolmgn.py:135).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from aero_gnn_tpu import ops
from aero_gnn_tpu.graph.padded import GraphBatch
from aero_gnn_tpu.models.mgn import MGNConfig, run_processor, _sub
from aero_gnn_tpu.nn import mlp as M


@dataclasses.dataclass(frozen=True)
class PoolMGNConfig(MGNConfig):
    global_pool_method: str = "mean"
    num_hidden_layers_global_encoder: int = 1
    global_dim: int = 128

    def init(self, key: jax.Array, dtype=jnp.float32):
        kg, kbase = jax.random.split(key)
        base = dataclasses.replace(
            _as_mgn(self),
            input_node_dim=self.input_node_dim + self.global_dim)
        params = MGNConfig.init(base, kbase, dtype)
        params["global_encoder"] = M.mlp_init(
            kg, self.input_node_dim, self.global_dim, self.global_dim,
            num_hidden_layers=self.num_hidden_layers_global_encoder,
            use_layer_norm=False, dtype=dtype)
        return params

    def apply(self, params, graph: GraphBatch, *,
              rng: Optional[jax.Array] = None) -> jax.Array:
        g = M.mlp_apply(params["global_encoder"], graph.x,
                        activation=self.activation, dropout=self.dropout,
                        rng=_sub(rng, 7))
        pooled = ops.graph_pool(
            g, graph.node_graph, graph.num_graphs_pad,
            method=self.global_pool_method, node_mask=graph.node_mask)
        per_node = ops.graph_broadcast(pooled, graph.node_graph)
        x_in = jnp.concatenate([graph.x, per_node], axis=-1)

        x = M.mlp_apply(params["node_encoder"], x_in,
                        activation=self.activation, dropout=self.dropout,
                        rng=_sub(rng, 0))
        e = M.mlp_apply(params["edge_encoder"], graph.edge_attr,
                        activation=self.activation, dropout=self.dropout,
                        rng=_sub(rng, 1))
        x, e = run_processor(
            params["layers"], self.layer_cfg, x, e,
            graph.senders, graph.receivers, graph.edge_mask,
            sender_perm=graph.sender_perm,
            senders_sorted=graph.senders_sorted,
            sender_plan=graph.sender_plan, remat=self.remat,
            remat_policy=self.remat_policy, aligned=graph.edges_aligned,
            unroll=self.unroll)
        return M.mlp_apply(params["decoder"], x, activation=self.activation)


def _as_mgn(cfg: "PoolMGNConfig") -> MGNConfig:
    fields = {f.name: getattr(cfg, f.name)
              for f in dataclasses.fields(MGNConfig)}
    return MGNConfig(**fields)
