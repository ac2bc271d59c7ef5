"""Hybrid data x spatial parallel training over a 2-D device mesh.

Axes: ``data`` replicates the model and shards independent meshes (graph
batches); ``graph`` partitions each mesh spatially with per-layer halo
exchange (parallel.spatial). Gradients: psum over ``graph`` (partial
contributions of one mesh) then pmean over ``data`` (average across
meshes) — a single fused all-reduce over both axes in practice.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from aero_gnn_tpu.parallel.halo import (
    HaloSplitGraph,
    halo_split_mgn_forward,
)
from aero_gnn_tpu.parallel.spatial import SpatialGraph, spatial_mgn_forward
from aero_gnn_tpu.parallel.xla_flags import async_jit_options


def stack_spatial(graphs) -> SpatialGraph:
    """[D] SpatialGraphs (same shapes) -> leading data axis [D, P, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)


def stack_halo_split(graphs) -> HaloSplitGraph:
    """[D] HaloSplitGraphs (same shapes) -> leading data axis [D, P, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)


def make_hybrid_train_step(model_cfg, optimizer, mesh: Mesh) -> Callable:
    def per_device(params, opt_state, sg):
        sg_l = jax.tree.map(lambda a: a[0, 0], sg)  # strip (data, graph)

        def loss_fn(p):
            pred = spatial_mgn_forward(p, model_cfg, sg_l, axis="graph")
            m = sg_l.node_mask[:, None]
            # LOCAL numerator / global count: see parallel.spatial
            # make_spatial_train_step — a psum'd numerator would inflate
            # the grad seed by the graph-axis size
            se = jnp.sum(jnp.square(pred - sg_l.y) * m)
            cnt = jax.lax.psum(jnp.sum(m) * sg_l.y.shape[-1], "graph")
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(jax.lax.psum(grads, "graph"), "data")
        loss = jax.lax.pmean(jax.lax.psum(loss, "graph"), "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = shard_map(per_device, mesh=mesh,
                     in_specs=(P(), P(), P("data", "graph")),
                     out_specs=(P(), P(), P()),
                     check_vma=False)
    return jax.jit(step, donate_argnums=(0, 1),
                   compiler_options=async_jit_options(mesh))


def make_hybrid_halo_split_train_step(model_cfg, optimizer,
                                      mesh: Mesh) -> Callable:
    """Hybrid data x graph training with the FLAGSHIP spatial comm path:
    sparse overlapped halo exchange (parallel.halo.HaloSplitGraph) instead
    of the all_gather baseline — O(P*H*h) boundary rows per layer, issued
    before interior edge work so the collective hides under compute."""

    def per_device(params, opt_state, sg):
        sg_l = jax.tree.map(lambda a: a[0, 0], sg)  # strip (data, graph)

        def loss_fn(p):
            pred = halo_split_mgn_forward(p, model_cfg, sg_l, axis="graph")
            m = sg_l.node_mask[:, None]
            # LOCAL numerator / global count (see make_hybrid_train_step)
            se = jnp.sum(jnp.square(pred - sg_l.y) * m)
            cnt = jax.lax.psum(jnp.sum(m) * sg_l.y.shape[-1], "graph")
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(jax.lax.psum(grads, "graph"), "data")
        loss = jax.lax.pmean(jax.lax.psum(loss, "graph"), "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = shard_map(per_device, mesh=mesh,
                     in_specs=(P(), P(), P("data", "graph")),
                     out_specs=(P(), P(), P()),
                     check_vma=False)
    return jax.jit(step, donate_argnums=(0, 1),
                   compiler_options=async_jit_options(mesh))
