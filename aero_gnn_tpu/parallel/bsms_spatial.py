"""Spatially partitioned BSMS (multi-scale U-Net) training/inference.

BASELINE config[4]: "bsms_mgn on large edge-partitioned mesh, multi-host
halo exchange". Two partition schemes, sharing the replicated-coarse
design:

  * ``partition_bsms`` / ``make_bsms_spatial_*`` — the all_gather
    baseline: fine level edge-partitioned like parallel.spatial with a
    per-layer all_gather halo of projected sender features. Kept as the
    simple reference scheme.
  * ``partition_bsms_halo`` / ``make_bsms_halo_*`` — the flagship: the
    fine level rides the sparse OVERLAPPED halo-split
    (parallel.halo.partition_graph_halo_split + _halo_split_layer:
    interior/boundary edge streams, all_to_all of exactly the boundary
    rows, interior compute schedulable under the collective, fused Pallas
    interior kernels with ``align_interior``), and the WeightedEdgeConv
    transfer (transfer="weighted" + hierarchy_mode="bistride", the
    canonical BSMS-GNN operator) runs fully sharded: the down conv
    aggregates remote sender features through the same halo exchange, and
    the up adjoint ships boundary contributions back with the REVERSE
    all_to_all (the manual transpose of parallel.halo._exchange).

In both schemes coarse levels are REPLICATED: the level-0 fine->coarse
transfer is a local masked partial reduction into the full coarse index
space followed by one psum, after which every shard holds identical
coarse features and runs the (much smaller) coarse stacks identically;
unpooling is a local gather of the replicated coarse features. The
bottleneck runs on a mesh 1/stride^s the size, so the sharded fine level
dominates end-to-end (see docs/design.md scaling model).
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
            # LOCAL numerator / global count: a psum'd numerator would
            # inflate the grad seed P x (see parallel.spatial
            # make_spatial_train_step)
            se = jnp.sum(jnp.square(pred - bg_l.fine.y) * m)
            cnt = jax.lax.psum(jnp.sum(m) * bg_l.fine.y.shape[-1], axis)
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss, axis)
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


# ---------------------------------------------------------------------------
# Halo-split BSMS (flagship multi-device scheme)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSMSHaloGraph:
    """BSMS mesh with the fine level on the overlapped halo-split and the
    level-0 transfer operators remapped into shard-local order.

    The fine edge stream is SPLIT (interior/boundary, see
    parallel.halo.HaloSplitGraph), so every per-edge level-0 artifact
    exists per stream. Coarse levels are replicated ``HierarchyLevel``s —
    ``levels[0]``'s fine-row fields are stripped to dummies (superseded by
    the sharded fields here); its coarse-graph fields plus ``levels[1:]``
    in full drive the replicated coarse stacks exactly like the
    single-device model (models/bsms.py).
    """

    fine: "HaloSplitGraph"
    # level-0 transfer, shard-local fine rows -> GLOBAL coarse ids
    fine_to_coarse: jax.Array  # i32[P, Nl]
    e2c_int: jax.Array  # i32[P, Ei]
    e2c_bnd: jax.Array  # i32[P, Eb]
    # WeightedEdgeConv level-0 operator (zero on pad rows/slots)
    conv_self: jax.Array  # f32[P, Nl]
    rep_mask: jax.Array  # f32[P, Nl]
    conv_edge_int: jax.Array  # f32[P, Ei]
    conv_edge_bnd: jax.Array  # f32[P, Eb]
    edge_w_int: jax.Array  # f32[P, Ei]
    edge_w_bnd: jax.Array  # f32[P, Eb]
    # replicated coarse hierarchy (levels[0] fine-row fields are dummies)
    levels: Tuple["H.HierarchyLevel", ...]


def _strip_fine_rows(level: "H.HierarchyLevel") -> "H.HierarchyLevel":
    """Replace a level's FINE-row artifacts with 1-element dummies — in the
    sharded graph they are superseded by the per-shard remapped fields, and
    replicating 10^6-row arrays onto every shard would waste HBM."""
    z = jnp.zeros(1, dtype=jnp.int32)
    zf = jnp.zeros(1, dtype=jnp.float32)
    return dataclasses.replace(
        level, fine_to_coarse=z, edge_to_coarse=z, node_weights=zf,
        edge_weights=zf, rep_mask=zf, conv_self=zf, conv_edge=zf,
        node_pool_perm=None, node_pool_sorted=None,
        edge_pool_perm=None, edge_pool_sorted=None)


def partition_bsms_halo(
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
    halo_pad_multiple: int = 8,
    align_interior: bool = False,
) -> BSMSHaloGraph:
    """Build the flagship multi-device BSMS graph: overlapped halo-split
    fine level + replicated coarse hierarchy + sharded level-0 transfer
    (mean AND WeightedEdgeConv operators are always carried)."""
    from aero_gnn_tpu.parallel.halo import (
        _assign_parts, partition_graph_halo_split)

    n = x.shape[0]
    e_cnt = len(senders)
    levels = H.build_hierarchy(
        senders=np.asarray(senders, np.int64),
        receivers=np.asarray(receivers, np.int64),
        node_graph=np.zeros(n, np.int64), num_nodes=n,
        pos=pos.astype(np.float64), num_scales=num_scales, mode=mode,
        stride=stride, num_fine_nodes_pad=n, num_fine_edges_pad=e_cnt)
    lvl0 = levels[0]

    # level-0 fine EDGE artifacts are in receiver-sorted order; map back to
    # ORIGINAL edge index so the partitioner can carry them as aux payload
    perm0 = sort_edges_by_receiver(np.asarray(senders),
                                   np.asarray(receivers))
    e2c_orig = np.empty(e_cnt, dtype=np.float64)
    e2c_orig[perm0] = np.asarray(lvl0.edge_to_coarse, np.float64)
    cedge_orig = np.empty(e_cnt, dtype=np.float64)
    cedge_orig[perm0] = np.asarray(lvl0.conv_edge, np.float64)
    ew_orig = np.empty(e_cnt, dtype=np.float64)
    ew_orig[perm0] = np.asarray(lvl0.edge_weights, np.float64)
    aux = np.stack([e2c_orig, cedge_orig, ew_orig], axis=1)

    fine, aux_int, aux_bnd = partition_graph_halo_split(
        senders=senders, receivers=receivers, x=x, edge_attr=edge_attr,
        pos=pos, y=y, num_parts=num_parts,
        edges_pad_multiple=edges_pad_multiple,
        halo_pad_multiple=halo_pad_multiple,
        align_interior=align_interior, edge_aux=aux)

    nc1 = int(lvl0.num_coarse_nodes_pad)
    ec1 = int(lvl0.num_coarse_edges_pad)
    emi = np.asarray(fine.edge_mask_int) > 0
    emb = np.asarray(fine.edge_mask_bnd) > 0
    # pad slots carry aux 0 -> route them at the coarse PAD ids instead
    # (every scattered value is mask-zero anyway; this is belt-and-braces)
    e2c_int = np.where(emi, aux_int[..., 0], ec1 - 1).astype(np.int32)
    e2c_bnd = np.where(emb, aux_bnd[..., 0], ec1 - 1).astype(np.int32)
    conv_edge_int = aux_int[..., 1].astype(np.float32)
    conv_edge_bnd = aux_bnd[..., 1].astype(np.float32)
    edge_w_int = aux_int[..., 2].astype(np.float32)
    edge_w_bnd = aux_bnd[..., 2].astype(np.float32)

    # node-row artifacts follow the partitioner's Morton chunks
    order, _, n_local = _assign_parts(pos, n, num_parts)
    n_local_pad = fine.nodes_per_part
    f2c = np.full((num_parts, n_local_pad), nc1 - 1, dtype=np.int32)
    cself = np.zeros((num_parts, n_local_pad), dtype=np.float32)
    rep = np.zeros((num_parts, n_local_pad), dtype=np.float32)
    f2c_g = np.asarray(lvl0.fine_to_coarse)
    cself_g = np.asarray(lvl0.conv_self)
    rep_g = np.asarray(lvl0.rep_mask)
    for p in range(num_parts):
        chunk = order[p * n_local:(p + 1) * n_local]
        k = len(chunk)
        f2c[p, :k] = f2c_g[chunk]
        cself[p, :k] = cself_g[chunk]
        rep[p, :k] = rep_g[chunk]

    rep_levels = (_strip_fine_rows(levels[0]),) + tuple(levels[1:])
    return BSMSHaloGraph(
        fine=fine,
        fine_to_coarse=jnp.asarray(f2c),
        e2c_int=jnp.asarray(e2c_int), e2c_bnd=jnp.asarray(e2c_bnd),
        conv_self=jnp.asarray(cself), rep_mask=jnp.asarray(rep),
        conv_edge_int=jnp.asarray(conv_edge_int),
        conv_edge_bnd=jnp.asarray(conv_edge_bnd),
        edge_w_int=jnp.asarray(edge_w_int),
        edge_w_bnd=jnp.asarray(edge_w_bnd),
        levels=rep_levels)


def _two_stream_psum_mean(e_int, e_bnd, w_int, w_bnd, ids_int, ids_bnd,
                          num_segments, axis, eps):
    """Weighted mean over BOTH fine edge streams, reduced across shards."""
    s = (jax.ops.segment_sum(e_int * w_int[:, None], ids_int,
                             num_segments=num_segments)
         + jax.ops.segment_sum(e_bnd * w_bnd[:, None], ids_bnd,
                               num_segments=num_segments))
    c = (jax.ops.segment_sum(w_int, ids_int, num_segments=num_segments)
         + jax.ops.segment_sum(w_bnd, ids_bnd, num_segments=num_segments))
    s = jax.lax.psum(s, axis)
    c = jax.lax.psum(c, axis)
    return s / jnp.maximum(c, eps)[:, None]


def bsms_halo_forward(params, cfg, bg: BSMSHaloGraph, *,
                      axis: str = "graph") -> jax.Array:
    """Per-shard BSMS forward on the overlapped halo-split fine level
    (inside shard_map). Uses BSMSConfig params; supports both the "mean"
    and the "weighted" (WeightedEdgeConv) transfer, sharded."""
    from aero_gnn_tpu import ops
    from aero_gnn_tpu.models.bsms import wec_down, wec_up
    from aero_gnn_tpu.models.mgn import scan_layers
    from aero_gnn_tpu.ops import segment_mean, segment_pool_sum
    from aero_gnn_tpu.parallel.halo import _exchange, _halo_split_layer

    fine = bg.fine
    n_local = fine.nodes_per_part if fine.x.ndim == 3 else fine.x.shape[0]
    x = M.mlp_apply(params["node_encoder"], fine.x,
                    activation=cfg.activation)
    e_int = M.mlp_apply(params["edge_encoder"], fine.edge_attr_int,
                        activation=cfg.activation)
    e_bnd = M.mlp_apply(params["edge_encoder"], fine.edge_attr_bnd,
                        activation=cfg.activation)
    layer_cfg = cfg.layer_cfg
    levels = bg.levels
    n_levels = len(levels)
    weighted = cfg.transfer == "weighted"

    def fine_stack(stacked, x, ei, eb):
        def body(carry, lp):
            x, ei, eb = carry
            x, ei, eb = _halo_split_layer(lp, layer_cfg, x, ei, eb, fine,
                                          axis)
            return (x, ei, eb), None
        if getattr(cfg, "remat", True):
            body = jax.checkpoint(body)
        return scan_layers(body, (x, ei, eb), stacked,
                           unroll=getattr(cfg, "unroll", False))

    def coarse_stack(stacked, x, e, k):
        # coarse level k's graph lives on levels[k-1] (its coarse side)
        lv = levels[k - 1]
        return run_processor(
            stacked, layer_cfg, x, e, lv.senders, lv.receivers,
            lv.edge_mask, sender_perm=lv.sender_perm,
            senders_sorted=lv.senders_sorted, remat=False,
            unroll=getattr(cfg, "unroll", False))

    # ---- down: fine stack + sharded level-0 transfer ----
    x, e_int, e_bnd = fine_stack(params["down"][0], x, e_int, e_bnd)
    skip_fine = (x, e_int, e_bnd)
    lvl0 = levels[0]
    nc1 = lvl0.num_coarse_nodes_pad
    ec1 = lvl0.num_coarse_edges_pad
    dt = x.dtype
    if weighted:
        # WeightedEdgeConv down: remote sender rows via the halo exchange,
        # then the receiver-owned conv is complete per shard; rep selection
        # is local (each representative lives on exactly one shard), one
        # psum replicates the coarse features.
        halo_x = _exchange(x, fine.send_idx, axis)
        xs_i = ops.gather_senders(x, fine.senders_int, fine.sender_perm_int,
                                  fine.senders_int_sorted)
        xs_b = halo_x.at[fine.senders_bnd].get(mode="promise_in_bounds")
        xa = (bg.conv_self[:, None] * x
              + jax.ops.segment_sum(bg.conv_edge_int[:, None] * xs_i,
                                    fine.receivers_int,
                                    num_segments=n_local,
                                    indices_are_sorted=True)
              + jax.ops.segment_sum(bg.conv_edge_bnd[:, None] * xs_b,
                                    fine.receivers_bnd,
                                    num_segments=n_local,
                                    indices_are_sorted=True))
        sel = xa * bg.rep_mask[:, None]
        xc = jax.lax.psum(
            jax.ops.segment_sum(sel, bg.fine_to_coarse, num_segments=nc1),
            axis).astype(dt)
        ec = _two_stream_psum_mean(
            e_int, e_bnd, bg.edge_w_int * fine.edge_mask_int,
            bg.edge_w_bnd * fine.edge_mask_bnd, bg.e2c_int, bg.e2c_bnd,
            ec1, axis, 1e-12).astype(dt)
    else:
        xc = _psum_segment_mean(x, fine.node_mask, bg.fine_to_coarse, nc1,
                                axis).astype(dt)
        ec = _two_stream_psum_mean(
            e_int, e_bnd, fine.edge_mask_int, fine.edge_mask_bnd,
            bg.e2c_int, bg.e2c_bnd, ec1, axis, 1.0).astype(dt)
    x, e = xc, ec

    # ---- down: replicated coarse levels (identical on every shard) ----
    skips = []
    for k in range(1, n_levels):
        x, e = coarse_stack(params["down"][k], x, e, k)
        skips.append((x, e))
        lv = levels[k]          # transfer k -> k+1 (fine side = level k)
        prev = levels[k - 1]    # level-k graph/masks
        if weighted:
            x = wec_down(lv, x, prev.senders, prev.receivers,
                         prev.sender_perm, prev.senders_sorted).astype(dt)
            w_e = lv.edge_weights * prev.edge_mask
            es = jax.ops.segment_sum(
                e * w_e[:, None], lv.edge_to_coarse,
                num_segments=lv.num_coarse_edges_pad)
            ws = jax.ops.segment_sum(
                w_e, lv.edge_to_coarse,
                num_segments=lv.num_coarse_edges_pad)
            e = (es / jnp.maximum(ws, 1e-12)[:, None]).astype(dt)
        else:
            xs = jax.ops.segment_sum(
                x * prev.node_mask[:, None], lv.fine_to_coarse,
                num_segments=lv.num_coarse_nodes_pad)
            cnt = jax.ops.segment_sum(
                prev.node_mask, lv.fine_to_coarse,
                num_segments=lv.num_coarse_nodes_pad)
            x = (xs / jnp.maximum(cnt, 1.0)[:, None]).astype(dt)
            e = segment_mean(e, lv.edge_to_coarse,
                             lv.num_coarse_edges_pad, mask=prev.edge_mask,
                             indices_are_sorted=False).astype(dt)

    # ---- bottleneck (replicated) ----
    x, e = coarse_stack(params["bottleneck"], x, e, n_levels)

    # ---- up: replicated coarse levels ----
    for i in range(n_levels - 1):
        k = n_levels - 1 - i          # un-transfer k+1 -> k
        lv = levels[k]
        prev = levels[k - 1]
        skip_x, skip_e = skips[-(i + 1)]
        xc_f = x.at[lv.fine_to_coarse].get(mode="promise_in_bounds")
        if weighted:
            xc_f = wec_up(lv, xc_f, prev.senders, prev.receivers,
                          prev.sender_perm, prev.senders_sorted).astype(dt)
        x = xc_f + skip_x
        e = skip_e
        x, e = coarse_stack(params["up"][i], x, e, k)

    # ---- up: sharded level-0 transfer + fine stack ----
    sx, se_int, se_bnd = skip_fine
    xc_f = x.at[bg.fine_to_coarse].get(mode="promise_in_bounds")
    if weighted:
        # exact adjoint of the sharded wec_down: place each coarse value at
        # its representative, transposed conv spreads it — contributions to
        # REMOTE senders ship back with the REVERSE all_to_all (the manual
        # transpose of parallel.halo._exchange: scatter boundary terms into
        # the halo table, all_to_all, scatter-add at send_idx rows; unused
        # halo slots carry exact zeros, so the pad-add to row send_idx[...,0]
        # is a no-op).
        z = xc_f * bg.rep_mask[:, None]
        zr_i = z.at[fine.receivers_int].get(mode="promise_in_bounds")
        spread = segment_pool_sum(
            bg.conv_edge_int[:, None] * zr_i, fine.senders_int, n_local,
            perm=fine.sender_perm_int, seg_sorted=fine.senders_int_sorted)
        zr_b = z.at[fine.receivers_bnd].get(mode="promise_in_bounds")
        num_slots = fine.send_idx.shape[0] * fine.send_idx.shape[1]
        buf = jax.ops.segment_sum(
            bg.conv_edge_bnd[:, None] * zr_b, fine.senders_bnd,
            num_segments=num_slots)
        rev = jax.lax.all_to_all(
            buf.reshape(fine.send_idx.shape[0], fine.send_idx.shape[1], -1),
            axis, split_axis=0, concat_axis=0, tiled=False)
        spread = spread + jnp.zeros_like(z).at[
            fine.send_idx.reshape(-1)].add(rev.reshape(-1, z.shape[-1]))
        x = (bg.conv_self[:, None] * z + spread).astype(dt) + sx
    else:
        x = xc_f + sx
    x, _, _ = fine_stack(params["up"][n_levels - 1], x, se_int, se_bnd)

    return M.mlp_apply(params["decoder"], x, activation=cfg.activation)


def _bsms_halo_in_spec(bg: BSMSHaloGraph, axis: str) -> BSMSHaloGraph:
    return BSMSHaloGraph(
        fine=jax.tree.map(lambda _: P(axis), bg.fine),
        fine_to_coarse=P(axis), e2c_int=P(axis), e2c_bnd=P(axis),
        conv_self=P(axis), rep_mask=P(axis),
        conv_edge_int=P(axis), conv_edge_bnd=P(axis),
        edge_w_int=P(axis), edge_w_bnd=P(axis),
        levels=jax.tree.map(lambda _: P(), bg.levels))


def _localize_halo(bg: BSMSHaloGraph) -> BSMSHaloGraph:
    """Strip the leading shard axis from the sharded fields (inside
    shard_map each shard sees [1, ...]); replicated levels untouched."""
    return BSMSHaloGraph(
        fine=jax.tree.map(lambda a: a[0], bg.fine),
        fine_to_coarse=bg.fine_to_coarse[0],
        e2c_int=bg.e2c_int[0], e2c_bnd=bg.e2c_bnd[0],
        conv_self=bg.conv_self[0], rep_mask=bg.rep_mask[0],
        conv_edge_int=bg.conv_edge_int[0], conv_edge_bnd=bg.conv_edge_bnd[0],
        edge_w_int=bg.edge_w_int[0], edge_w_bnd=bg.edge_w_bnd[0],
        levels=bg.levels)


def make_bsms_halo_forward(model_cfg, mesh: Mesh, *, axis: str = "graph"):
    """Jitted BSMS forward on the overlapped halo-split (see
    make_bsms_spatial_forward for the per-structure jit cache rationale)."""
    cache = {}

    def per_shard(params, bg):
        bg_l = _localize_halo(bg)
        return bsms_halo_forward(params, model_cfg, bg_l, axis=axis)[None]

    def run(params, bg):
        key = jax.tree.structure(bg)
        if key not in cache:
            fwd = shard_map(per_shard, mesh=mesh,
                            in_specs=(P(), _bsms_halo_in_spec(bg, axis)),
                            out_specs=P(axis), check_vma=False)
            cache[key] = jax.jit(fwd)
        return cache[key](params, bg)

    return run


def make_bsms_halo_train_step(model_cfg, optimizer, mesh: Mesh, *,
                              axis: str = "graph"):
    """Training step for the flagship halo-split BSMS (BASELINE config[4]):
    masked MSE + grads psum'd over the graph axis."""
    import optax

    cache = {}

    def per_shard(params, opt_state, bg):
        bg_l = _localize_halo(bg)

        def loss_fn(p):
            pred = bsms_halo_forward(p, model_cfg, bg_l, axis=axis)
            m = bg_l.fine.node_mask[:, None]
            # LOCAL numerator / global count: a psum'd numerator would
            # inflate the grad seed P x (see parallel.spatial
            # make_spatial_train_step)
            se = jnp.sum(jnp.square(pred - bg_l.fine.y) * m)
            cnt = jax.lax.psum(jnp.sum(m) * bg_l.fine.y.shape[-1], axis)
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def run(params, opt_state, bg):
        key = jax.tree.structure(bg)
        if key not in cache:
            step = shard_map(per_shard, mesh=mesh,
                             in_specs=(P(), P(),
                                       _bsms_halo_in_spec(bg, axis)),
                             out_specs=(P(), P(), P()),
                             check_vma=False)
            cache[key] = jax.jit(step, donate_argnums=(0, 1))
        return cache[key](params, opt_state, bg)

    return run
