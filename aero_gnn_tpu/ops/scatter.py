"""Gather / segment-reduction primitives (XLA baseline path).

These are the TPU-native equivalents of the external CUDA kernels the
reference delegates to (torch_scatter / torch_geometric / ATen):

  * ``gather``            <- advanced-index node->edge gather
                             (/root/reference/models/mgnLayer.py:40-41, :103)
  * ``segment_sum/mean``  <- torch_scatter.scatter_add / scatter_mean
                             (/root/reference/models/mgnLayer.py:144-146)
  * ``graph_pool``        <- torch_geometric global_{mean,max,add}_pool
                             (/root/reference/models/poolmgn.py:37-44)
  * ``graph_broadcast``   <- repeat_interleave(bincount(batch))
                             (/root/reference/models/poolmgn.py:135)

All functions are shape-static and mask-aware: pad edges/nodes contribute
exact zeros, matching torch_scatter ``dim_size`` semantics (missing
destination rows are zeros). The Pallas fused versions live in
``aero_gnn_tpu.ops.pallas_segment`` and are selected via ``ops.dispatch``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gather(values: jax.Array, indices: jax.Array) -> jax.Array:
    """Row gather ``values[indices]`` with static shapes. [N, D] -> [E, D]."""
    return values.at[indices].get(mode="promise_in_bounds",
                                  indices_are_sorted=False,
                                  unique_indices=False)


def gather_sorted(values: jax.Array, indices: jax.Array) -> jax.Array:
    """Row gather where ``indices`` is ascending (receiver-sorted layout)."""
    return values.at[indices].get(mode="promise_in_bounds",
                                  indices_are_sorted=True,
                                  unique_indices=False)


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Masked segment sum: [E, D] -> [N, D]; zero rows for empty segments."""
    if mask is not None:
        data = data * mask[:, None]
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Masked segment mean; empty segments yield zeros (scatter_mean parity)."""
    summed = segment_sum(
        data, segment_ids, num_segments,
        mask=mask, indices_are_sorted=indices_are_sorted,
    )
    ones = jnp.ones(data.shape[0], dtype=data.dtype) if mask is None else mask
    counts = jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return summed / jnp.maximum(counts, 1.0)[:, None]


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Masked segment max; masked rows replaced by -inf, empty segments -> 0.

    Matches torch_geometric global_max_pool on real rows; the zero fill for
    empty segments only ever touches pad graphs, which are masked downstream.
    """
    if mask is not None:
        neg = jnp.finfo(data.dtype).min
        data = jnp.where(mask[:, None] > 0, data, neg)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return jnp.where(jnp.isfinite(out), out, 0.0)


def graph_pool(
    node_values: jax.Array,
    node_graph: jax.Array,
    num_graphs: int,
    *,
    method: str = "mean",
    node_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-graph pooling over the batch vector: [N, D] -> [G, D]."""
    if method == "mean":
        return segment_mean(node_values, node_graph, num_graphs,
                            mask=node_mask, indices_are_sorted=True)
    if method in ("add", "sum"):
        return segment_sum(node_values, node_graph, num_graphs,
                           mask=node_mask, indices_are_sorted=True)
    if method == "max":
        return segment_max(node_values, node_graph, num_graphs,
                           mask=node_mask, indices_are_sorted=True)
    raise ValueError(f"Unsupported global pooling method: {method}")


def graph_broadcast(graph_values: jax.Array, node_graph: jax.Array) -> jax.Array:
    """Broadcast per-graph rows back to nodes: [G, D] -> [N, D].

    The static-shape replacement for repeat_interleave(bincount(batch)).
    """
    return graph_values.at[node_graph].get(mode="promise_in_bounds",
                                           indices_are_sorted=True)


def degree(
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Per-segment counts (in-degree when fed receivers). [E] -> [N]."""
    ones = jnp.ones(segment_ids.shape[0], dtype=dtype)
    if mask is not None:
        ones = ones * mask.astype(dtype)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments,
                               indices_are_sorted=True)
