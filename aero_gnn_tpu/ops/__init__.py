"""Kernel substrate: gather / segment ops with a switchable backend.

``backend()`` returns "xla" (default) or "pallas". The Pallas backend fuses
the message-mask-scatter path into custom TPU kernels; the XLA backend is the
always-correct reference used by tests and CPU runs. Switch globally with
``set_backend("pallas")`` or scoped via ``use_backend("pallas")``.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax

from aero_gnn_tpu.ops.scatter import (  # noqa: F401
    BandedGatherPlan,
    PermGatherPlan,
    SenderPlans,
    banded_gather,
    banded_perm_gather,
    build_banded_gather_plan,
    build_perm_gather_plan,
    degree,
    gather,
    gather_receivers,
    gather_senders,
    gather_sorted,
    graph_broadcast,
    graph_pool,
    segment_max,
    segment_mean,
    segment_pool_sum,
    segment_sum,
    segment_sum_sorted,
)

_BACKEND = os.environ.get("AERO_GNN_OPS_BACKEND", "xla")


def backend() -> str:
    return _BACKEND


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"Unknown ops backend: {name}")
    _BACKEND = name


@contextlib.contextmanager
def use_backend(name: str):
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev


def aggregate_edges(
    messages: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    *,
    aggregation: str,
    edge_mask: Optional[jax.Array] = None,
    aligned: bool = False,
) -> jax.Array:
    """Aggregate edge messages to destination nodes ([E,D] -> [N,D]).

    The single entry point NodeBlock uses; torch_scatter.scatter_{add,mean}
    parity (/root/reference/models/mgnLayer.py:143-148) including the
    ValueError on unsupported modes.

    ``aligned`` must be True only for streams built with the block-aligned
    layout (build_graph_batch(align_edges=True)); it gates the Pallas
    kernel, which silently drops edges whose tile spans two node blocks on
    any other layout — divisible shapes alone are NOT sufficient.
    """
    if aggregation not in ("add", "mean"):
        raise ValueError(f"Unsupported aggregation method: {aggregation}")
    if _BACKEND == "pallas" and aligned:
        from aero_gnn_tpu.ops.pallas_segment import segment_agg_pallas

        return segment_agg_pallas(messages, receivers, num_nodes,
                                  aggregation=aggregation, mask=edge_mask)
    if edge_mask is not None:
        messages = messages * edge_mask[:, None]
    summed = segment_sum_sorted(messages, receivers, num_nodes)
    if aggregation == "mean":
        deg = degree(receivers, num_nodes, mask=edge_mask,
                     dtype=messages.dtype)
        summed = summed / jax.numpy.maximum(deg, 1.0)[:, None]
    return summed


def aggregate_edges_weighted(
    messages: jax.Array,
    weights: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    *,
    aligned: bool = False,
    mask: jax.Array = None,
) -> jax.Array:
    """out[n] = sum_{e: recv(e)=n} weights[e] * messages[e].

    On the Pallas backend with the block-aligned layout the per-edge
    weight is folded into the aggregation kernel's one-hot select — the
    weighted [E, h] stream never materializes in HBM (the WeightedEdgeConv
    hot path, models/bsms.py). Elsewhere: explicit multiply + sorted
    segment sum. Weights participate at ``messages.dtype`` precision on
    the fused path and are DIFFERENTIABLE on both paths (the Pallas
    custom VJP returns the same d_w = <ct[recv], msgs> the fallback's
    autodiff produces). Pad edges: pass ``mask``, or guarantee their
    weights are zero (the WEC hierarchy path does the latter)."""
    if _BACKEND == "pallas" and aligned:
        from aero_gnn_tpu.ops.pallas_segment import (
            segment_agg_weighted_pallas)

        return segment_agg_weighted_pallas(messages, weights, receivers,
                                           num_nodes, mask=mask)
    m = messages if mask is None else messages * mask[:, None].astype(
        messages.dtype)
    return segment_sum_sorted(
        m * weights[:, None].astype(messages.dtype),
        receivers, num_nodes)
