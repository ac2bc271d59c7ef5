"""Pointwise MLP baseline (no message passing).

Re-design of /root/reference/models/mlpnet.py:8-42: encoder MLP then decoder
MLP over node features only; both LN-terminated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from aero_gnn_tpu.graph.padded import GraphBatch
from aero_gnn_tpu.nn import mlp as M


@dataclasses.dataclass(frozen=True)
class MLPNetConfig:
    input_node_dim: int
    output_node_dim: int
    hidden_dim: int = 128
    num_hidden_layers_encoder: int = 2
    num_hidden_layers_decoder: int = 2
    activation: str = "relu"
    dropout: float = 0.0

    def init(self, key: jax.Array, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        enc = M.mlp_init(k1, self.input_node_dim, self.hidden_dim,
                         self.hidden_dim,
                         num_hidden_layers=self.num_hidden_layers_encoder,
                         use_layer_norm=True, dtype=dtype)
        dec = M.mlp_init(k2, self.hidden_dim, self.hidden_dim,
                         self.output_node_dim,
                         num_hidden_layers=self.num_hidden_layers_decoder,
                         use_layer_norm=True, dtype=dtype)
        return {"encoder": enc, "decoder": dec}

    def apply(self, params, graph: GraphBatch, *,
              rng: Optional[jax.Array] = None) -> jax.Array:
        h = M.mlp_apply(params["encoder"], graph.x,
                        activation=self.activation, dropout=self.dropout,
                        rng=rng)
        return M.mlp_apply(params["decoder"], h,
                           activation=self.activation, dropout=self.dropout,
                           rng=None if rng is None else jax.random.fold_in(rng, 1))
