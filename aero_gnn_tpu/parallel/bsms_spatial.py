"""Spatially partitioned BSMS (multi-scale U-Net) training/inference.

BASELINE config[4]: "bsms_mgn on large edge-partitioned mesh, multi-host
halo exchange". Partition strategy:

  * the FINE level (the big one — most nodes, most edges, the down/up
    stacks) is edge-partitioned exactly like parallel.spatial: Morton node
    shards, receiver-owned edges, per-layer all_gather halo of projected
    sender features;
  * coarse levels are REPLICATED: the fine->coarse transfer is a local
    masked segment partial-sum into the full coarse index space followed
    by one psum (sum and count), after which every shard holds identical
    coarse features and runs the (much smaller) bottleneck identically;
  * unpooling is then a local gather of the replicated coarse features.

This trades bottleneck replication for simplicity — the bottleneck runs
on a mesh 1/stride^s the size, so for moderate shard counts the sharded
fine level dominates. Fully sharded coarse levels are the next step.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from aero_gnn_tpu.graph import hierarchy as H
from aero_gnn_tpu.graph.padded import _round_up, sort_edges_by_receiver
from aero_gnn_tpu.models.mgn import run_processor
from aero_gnn_tpu.nn import mlp as M
from aero_gnn_tpu.parallel.spatial import (
    SpatialGraph,
    _morton_order,
    _spatial_layer,
    partition_graph,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSMSSpatialGraph:
    """Fine level sharded ([P, ...]), coarse structure replicated."""

    fine: SpatialGraph
    # fine -> level-1 transfer, in SHARD-LOCAL fine order ([P, Nl]/[P, El])
    fine_to_coarse: jax.Array  # i32[P, Nl] global coarse node ids
    edge_to_coarse: jax.Array  # i32[P, El] global coarse edge ids
    # replicated coarse levels (standard padded arrays, same on all shards)
    coarse_senders: Tuple[jax.Array, ...]
    coarse_receivers: Tuple[jax.Array, ...]
    coarse_edge_mask: Tuple[jax.Array, ...]
    coarse_node_mask: Tuple[jax.Array, ...]
    # transitions between coarse levels s -> s+1 (replicated)
    coarse_f2c: Tuple[jax.Array, ...]
    coarse_e2c: Tuple[jax.Array, ...]


def partition_bsms(
    *,
    senders: np.ndarray,
    receivers: np.ndarray,
    x: np.ndarray,
    edge_attr: np.ndarray,
    pos: np.ndarray,
    y: Optional[np.ndarray],
    num_parts: int,
    num_scales: int,
    mode: str = "stride",
    stride: int = 2,
    edges_pad_multiple: int = 128,
    align_interior: bool = False,
) -> BSMSSpatialGraph:
    levels = H.build_hierarchy_real(
        senders=senders, receivers=receivers,
        node_graph=np.zeros(x.shape[0], np.int64), num_nodes=x.shape[0],
        pos=pos.astype(np.float64), num_scales=num_scales, mode=mode,
        stride=stride)

    fine = partition_graph(
        senders=senders, receivers=receivers, x=x, edge_attr=edge_attr,
        pos=pos, y=y, num_parts=num_parts,
        edges_pad_multiple=edges_pad_multiple,
        align_interior=align_interior)

    n = x.shape[0]
    order = _morton_order(pos)
    n_local = fine.nodes_per_part  # PADDED per-shard rows (node stride)
    n_chunk = -(-n // num_parts)   # real nodes assigned per shard
    el = fine.senders_global.shape[1]

    # hierarchy level-0 arrays are in receiver-sorted GLOBAL edge order;
    # map them into each shard's local edge order. Vectorized: receiver-
    # major lex order makes the composite key recv*n + send strictly
    # ascending, so the (recv, send) -> hierarchy-row lookup is one
    # searchsorted instead of an O(E) Python dict loop.
    lvl0 = levels[0]
    perm0 = sort_edges_by_receiver(senders, receivers)
    gkey = receivers[perm0].astype(np.int64) * n + senders[perm0]

    nc1 = _round_up(lvl0["num_nodes"] + 1, 128)
    ec1 = _round_up(max(lvl0["num_edges"], 1), 128)

    f2c = np.full((num_parts, n_local), nc1 - 1, dtype=np.int32)
    e2c = np.full((num_parts, el), ec1 - 1, dtype=np.int32)
    new_of_old = np.full(n, -1, dtype=np.int64)
    old_of_new = np.full(num_parts * n_local, -1, dtype=np.int64)
    for p in range(num_parts):
        chunk = order[p * n_chunk:(p + 1) * n_chunk]
        new_of_old[chunk] = p * n_local + np.arange(len(chunk))
        old_of_new[p * n_local: p * n_local + len(chunk)] = chunk
        f2c[p, : len(chunk)] = lvl0["fine_to_coarse"][chunk]
    sg = np.asarray(fine.senders_global)
    rl = np.asarray(fine.receivers_local)
    em = np.asarray(fine.edge_mask)
    part_of = np.repeat(np.arange(num_parts), el).reshape(num_parts, el)
    valid = em > 0
    old_s = old_of_new[sg[valid]]
    old_r = old_of_new[part_of[valid] * n_local + rl[valid]]
    rows = np.searchsorted(gkey, old_r * n + old_s)
    e2c[valid] = lvl0["edge_to_coarse"][rows]

    # replicated coarse-level arrays (levels 1..S-1 graphs + transitions)
    cs, cr, cem, cnm, cf2c, ce2c = [], [], [], [], [], []
    for s, lvl in enumerate(levels):
        nc = _round_up(lvl["num_nodes"] + 1, 128)
        ec = _round_up(max(lvl["num_edges"], 1), 128)
        s_p = np.full(ec, nc - 1, np.int32)
        r_p = np.full(ec, nc - 1, np.int32)
        s_p[: lvl["num_edges"]] = lvl["senders"]
        r_p[: lvl["num_edges"]] = lvl["receivers"]
        m = np.zeros(ec, np.float32)
        m[: lvl["num_edges"]] = 1.0
        nm = np.zeros(nc, np.float32)
        nm[: lvl["num_nodes"]] = 1.0
        cs.append(jnp.asarray(s_p))
        cr.append(jnp.asarray(r_p))
        cem.append(jnp.asarray(m))
        cnm.append(jnp.asarray(nm))
        if s + 1 < len(levels):
            nxt = levels[s + 1]
            nc2 = _round_up(nxt["num_nodes"] + 1, 128)
            ec2 = _round_up(max(nxt["num_edges"], 1), 128)
            f = np.full(nc, nc2 - 1, np.int32)
            f[: lvl["num_nodes"]] = nxt["fine_to_coarse"]
            e = np.full(ec, ec2 - 1, np.int32)
            e[: lvl["num_edges"]] = nxt["edge_to_coarse"]
            cf2c.append(jnp.asarray(f))
            ce2c.append(jnp.asarray(e))

    return BSMSSpatialGraph(
        fine=fine,
        fine_to_coarse=jnp.asarray(f2c), edge_to_coarse=jnp.asarray(e2c),
        coarse_senders=tuple(cs), coarse_receivers=tuple(cr),
        coarse_edge_mask=tuple(cem), coarse_node_mask=tuple(cnm),
        coarse_f2c=tuple(cf2c), coarse_e2c=tuple(ce2c),
    )


def _psum_segment_mean(vals, mask, ids, num_segments, axis):
    """Cross-shard segment mean: local masked partials + one psum."""
    w = mask.astype(vals.dtype)
    s = jax.ops.segment_sum(vals * w[:, None], ids,
                            num_segments=num_segments)
    c = jax.ops.segment_sum(w, ids, num_segments=num_segments)
    s = jax.lax.psum(s, axis)
    c = jax.lax.psum(c, axis)
    return s / jnp.maximum(c, 1.0)[:, None]


def _replicated_segment_mean(vals, mask, ids, num_segments):
    w = mask.astype(vals.dtype)
    s = jax.ops.segment_sum(vals * w[:, None], ids,
                            num_segments=num_segments)
    c = jax.ops.segment_sum(w, ids, num_segments=num_segments)
    return s / jnp.maximum(c, 1.0)[:, None]


def bsms_spatial_forward(params, cfg, bg: BSMSSpatialGraph, *,
                         axis: str = "graph") -> jax.Array:
    """Per-shard BSMS forward (inside shard_map). Uses BSMSConfig params."""
    fine = bg.fine
    x = M.mlp_apply(params["node_encoder"], fine.x,
                    activation=cfg.activation)
    e = M.mlp_apply(params["edge_encoder"], fine.edge_attr,
                    activation=cfg.activation)
    layer_cfg = cfg.layer_cfg
    n_levels = len(bg.coarse_senders)

    def fine_stack(stacked, x, e):
        def body(carry, lp):
            x, e = carry
            x, e = _spatial_layer(lp, layer_cfg, x, e, fine.senders_global,
                                  fine.receivers_local, fine.edge_mask, axis,
                                  fine.sender_perm, fine.senders_sorted,
                                  aligned=fine.aligned)
            return (x, e), None
        from aero_gnn_tpu.models.mgn import scan_layers
        return scan_layers(body, (x, e), stacked,
                           unroll=getattr(cfg, "unroll", False))

    def coarse_stack(stacked, x, e, s):
        return run_processor(
            stacked, layer_cfg, x, e, bg.coarse_senders[s],
            bg.coarse_receivers[s], bg.coarse_edge_mask[s], remat=False,
            unroll=getattr(cfg, "unroll", False))

    # ---- down path ----
    skips = []
    x, e = fine_stack(params["down"][0], x, e)
    skip_fine = (x, e)
    nc1 = bg.coarse_node_mask[0].shape[0]
    ec1 = bg.coarse_edge_mask[0].shape[0]
    xc = _psum_segment_mean(x, fine.node_mask, bg.fine_to_coarse, nc1, axis)
    ec_feat = _psum_segment_mean(e, fine.edge_mask, bg.edge_to_coarse,
                                 ec1, axis)
    x, e = xc, ec_feat
    for s in range(1, n_levels):
        x, e = coarse_stack(params["down"][s], x, e, s - 1)
        skips.append((x, e))
        nc = bg.coarse_node_mask[s].shape[0]
        ec = bg.coarse_edge_mask[s].shape[0]
        x = _replicated_segment_mean(x, bg.coarse_node_mask[s - 1],
                                     bg.coarse_f2c[s - 1], nc)
        e = _replicated_segment_mean(e, bg.coarse_edge_mask[s - 1],
                                     bg.coarse_e2c[s - 1], ec)

    # ---- bottleneck (replicated) ----
    x, e = coarse_stack(params["bottleneck"], x, e, n_levels - 1)

    # ---- up path ----
    for i in range(n_levels - 1):
        s = n_levels - 1 - i
        skip_x, skip_e = skips[-(i + 1)]
        x = x.at[bg.coarse_f2c[s - 1]].get(mode="promise_in_bounds") + skip_x
        e = skip_e
        x, e = coarse_stack(params["up"][i], x, e, s - 1)
    # coarse level 1 -> fine
    sx, se = skip_fine
    x = x.at[bg.fine_to_coarse].get(mode="promise_in_bounds") + sx
    e = se
    x, e = fine_stack(params["up"][n_levels - 1], x, e)

    return M.mlp_apply(params["decoder"], x, activation=cfg.activation)


def _localize(bg: BSMSSpatialGraph) -> BSMSSpatialGraph:
    """Strip the leading shard axis from the sharded fields (inside
    shard_map each shard sees [1, ...])."""
    return dataclasses.replace(
        bg, fine=jax.tree.map(lambda a: a[0], bg.fine),
        fine_to_coarse=bg.fine_to_coarse[0],
        edge_to_coarse=bg.edge_to_coarse[0])


def make_bsms_spatial_forward(model_cfg, mesh: Mesh, *,
                              axis: str = "graph"):
    def per_shard(params, bg):
        bg_l = _localize(bg)
        return bsms_spatial_forward(params, model_cfg, bg_l, axis=axis)[None]

    def in_spec_for(bg):
        return BSMSSpatialGraph(
            fine=jax.tree.map(lambda _: P(axis), bg.fine),
            fine_to_coarse=P(axis), edge_to_coarse=P(axis),
            coarse_senders=jax.tree.map(lambda _: P(), bg.coarse_senders),
            coarse_receivers=jax.tree.map(lambda _: P(),
                                          bg.coarse_receivers),
            coarse_edge_mask=jax.tree.map(lambda _: P(),
                                          bg.coarse_edge_mask),
            coarse_node_mask=jax.tree.map(lambda _: P(),
                                          bg.coarse_node_mask),
            coarse_f2c=jax.tree.map(lambda _: P(), bg.coarse_f2c),
            coarse_e2c=jax.tree.map(lambda _: P(), bg.coarse_e2c),
        )

    # jit caches by FUNCTION IDENTITY: building a fresh shard_map closure
    # per call would retrace/recompile every step (40-120 s per compile on
    # the relayed TPU). Cache the jitted program per pytree structure (the
    # in_specs depend only on the number of coarse levels).
    cache = {}

    def run(params, bg):
        key = jax.tree.structure(bg)
        if key not in cache:
            fwd = shard_map(per_shard, mesh=mesh,
                            in_specs=(P(), in_spec_for(bg)),
                            out_specs=P(axis), check_vma=False)
            cache[key] = jax.jit(fwd)
        return cache[key](params, bg)

    return run


def _bsms_in_spec(bg: BSMSSpatialGraph, axis: str) -> BSMSSpatialGraph:
    return BSMSSpatialGraph(
        fine=jax.tree.map(lambda _: P(axis), bg.fine),
        fine_to_coarse=P(axis), edge_to_coarse=P(axis),
        coarse_senders=jax.tree.map(lambda _: P(), bg.coarse_senders),
        coarse_receivers=jax.tree.map(lambda _: P(), bg.coarse_receivers),
        coarse_edge_mask=jax.tree.map(lambda _: P(), bg.coarse_edge_mask),
        coarse_node_mask=jax.tree.map(lambda _: P(), bg.coarse_node_mask),
        coarse_f2c=jax.tree.map(lambda _: P(), bg.coarse_f2c),
        coarse_e2c=jax.tree.map(lambda _: P(), bg.coarse_e2c),
    )


def make_bsms_spatial_train_step(model_cfg, optimizer, mesh: Mesh, *,
                                 axis: str = "graph"):
    """Training step on an edge-partitioned BSMS mesh (BASELINE config[4]).

    Loss and grads are psum'd over the graph axis; on a 2D (data, graph)
    mesh the data axis is simply replicated (stack BSMS graphs and add a
    pmean for true hybrid batches, cf. parallel.hybrid)."""
    import optax

    def per_shard(params, opt_state, bg):
        bg_l = _localize(bg)

        def loss_fn(p):
            pred = bsms_spatial_forward(p, model_cfg, bg_l, axis=axis)
            m = bg_l.fine.node_mask[:, None]
            se = jax.lax.psum(
                jnp.sum(jnp.square(pred - bg_l.fine.y) * m), axis)
            cnt = jax.lax.psum(jnp.sum(m) * bg_l.fine.y.shape[-1], axis)
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # see make_bsms_spatial_forward: cache the jitted program per pytree
    # structure instead of retracing every call; donate params/opt_state
    # like the sibling step factories
    cache = {}

    def run(params, opt_state, bg):
        key = jax.tree.structure(bg)
        if key not in cache:
            step = shard_map(per_shard, mesh=mesh,
                             in_specs=(P(), P(), _bsms_in_spec(bg, axis)),
                             out_specs=(P(), P(), P()),
                             check_vma=False)
            cache[key] = jax.jit(step, donate_argnums=(0, 1))
        return cache[key](params, opt_state, bg)

    return run
