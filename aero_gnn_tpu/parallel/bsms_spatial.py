"""Spatially partitioned BSMS (multi-scale U-Net) training/inference.

BASELINE config[4]: "bsms_mgn on large edge-partitioned mesh, multi-host
halo exchange". Two partition schemes, sharing the replicated-coarse
design:

  * ``partition_bsms`` / ``make_bsms_spatial_*`` — the all_gather
    baseline: fine level edge-partitioned like parallel.spatial with a
    per-layer all_gather halo of projected sender features. Kept as the
    simple reference scheme.
  * ``partition_bsms_halo`` / ``make_bsms_halo_*`` — the flagship:
    EVERY hierarchy level (fine, coarse, bottleneck) is its own
    overlapped halo-split shard (parallel.halo.partition_graph_halo_split
    + _halo_split_layer: interior/boundary edge streams, all_to_all of
    exactly the boundary rows, interior compute schedulable under the
    collective, fused Pallas interior kernels with ``align_interior``),
    so ALL processor compute scales 1/P. Transfers between levels meet in
    a small replicated [nc, h] intermediate (down: local partial
    reduction + one psum, then slice; up: one all_gather + local gather)
    — O(next-level size) comm twice per level boundary, vs the per-layer
    halo that dominates. The WeightedEdgeConv transfer
    (transfer="weighted" + hierarchy_mode="bistride", the canonical
    BSMS-GNN operator) runs fully sharded: the down conv aggregates
    remote sender features through the level's halo exchange; the up
    adjoint ships boundary contributions back with the REVERSE all_to_all
    (the manual transpose of parallel.halo._exchange).

In the all_gather baseline the coarse levels are replicated (every shard
runs the identical coarse stacks), which caps BSMS speedup at the fine
fraction of the work — the flagship scheme exists because the bottleneck
stack is max(1, L - 2*sum(down)) layers (7 of 15 at the production
config) and must shard too.
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
from aero_gnn_tpu.parallel.xla_flags import async_jit_options


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
            cache[key] = jax.jit(fwd, compiler_options=async_jit_options(mesh))
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
            cache[key] = jax.jit(step, donate_argnums=(0, 1),
                   compiler_options=async_jit_options(mesh))
        return cache[key](params, opt_state, bg)

    return run



# ---------------------------------------------------------------------------
# Halo-split BSMS (flagship multi-device scheme): EVERY level sharded
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSMSHaloLevel:
    """One hierarchy level of the flagship scheme: the level's mesh as an
    overlapped halo-split shard plus the transfer operators to the NEXT
    level, remapped into shard-local order.

    Level meshes are partitioned independently (each by its own Morton
    order); transfers meet in a small REPLICATED [nc_pad, h] intermediate:
    down = local partial reduction into the full next-level index space +
    one psum, then each shard slices its next-level rows; up = one
    all_gather of the next level's sharded rows reassembled via
    ``pos_of_node``, then a local gather by ``f2c``. Comm per transfer is
    O(next-level nodes + edges) — small (levels halve), vs the per-layer
    O(surface) halo that dominates. Every processor stack (fine, coarse,
    bottleneck) runs sharded on the overlapped halo-split layer, so all
    compute scales 1/P (the round-2 replicated-coarse design capped BSMS
    speedup at ~2x regardless of P — the bottleneck stack is 7 of 15
    layers).
    """

    graph: "HaloSplitGraph"  # this level's sharded mesh (x/y real at 0)
    # provenance: shard-local row/slot -> GLOBAL ids of THIS level
    node_rows: jax.Array  # i32[P, Nl] (pad rows -> nk_pad-1)
    edge_rows_int: jax.Array  # i32[P, Ei] (pad slots -> ek_pad-1)
    edge_rows_bnd: jax.Array  # i32[P, Eb]
    pos_of_node: jax.Array  # i32[nk_pad] flat [P*Nl] slot of each global id
    # transfer THIS level -> next (None on the last level)
    f2c: Optional[jax.Array]  # i32[P, Nl] global next-level node ids
    e2c_int: Optional[jax.Array]  # i32[P, Ei] global next-level edge ids
    e2c_bnd: Optional[jax.Array]  # i32[P, Eb]
    # WeightedEdgeConv operator on THIS level's rows/slots (zero on pads)
    conv_self: Optional[jax.Array]  # f32[P, Nl]
    rep_mask: Optional[jax.Array]  # f32[P, Nl]
    conv_edge_int: Optional[jax.Array]  # f32[P, Ei]
    conv_edge_bnd: Optional[jax.Array]  # f32[P, Eb]
    edge_w_int: Optional[jax.Array]  # f32[P, Ei]
    edge_w_bnd: Optional[jax.Array]  # f32[P, Eb]
    # sparse owner-routed transfer plan for this level boundary (None on
    # the last level); see TransferPlan
    plan: Optional["TransferPlan"] = None
    # padded sizes of the NEXT level's replicated intermediates (0 on last)
    nc_pad: int = dataclasses.field(default=0, metadata=dict(static=True))
    ec_pad: int = dataclasses.field(default=0, metadata=dict(static=True))
    # this level's REAL mesh sizes (scaling models / diagnostics)
    n_real: int = dataclasses.field(default=0, metadata=dict(static=True))
    e_real: int = dataclasses.field(default=0, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSMSHaloGraph:
    """num_scales BSMSHaloLevels; levels[0] is the fine mesh."""

    levels: Tuple[BSMSHaloLevel, ...]

    @property
    def fine(self) -> "HaloSplitGraph":
        return self.levels[0].graph


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
    """Build the flagship multi-device BSMS graph: every hierarchy level
    an overlapped halo-split shard (see BSMSHaloLevel). Both the "mean"
    and the WeightedEdgeConv transfer operators are always carried."""
    from aero_gnn_tpu.parallel.halo import (
        _assign_parts, partition_graph_halo_split)

    n = x.shape[0]
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    trans = H.build_hierarchy_real(
        senders=senders, receivers=receivers,
        node_graph=np.zeros(n, np.int64), num_nodes=n,
        pos=pos.astype(np.float64), num_scales=num_scales, mode=mode,
        stride=stride)

    # per-level REAL mesh arrays; level-0 edge rows receiver-sorted (the
    # hierarchy's level-0 artifacts index that order)
    perm0 = sort_edges_by_receiver(senders, receivers)
    meshes = [dict(s=senders[perm0], r=receivers[perm0],
                   ea=np.asarray(edge_attr)[perm0], pos=pos,
                   x=x, y=y, n=n)]
    for t in trans:
        meshes.append(dict(
            s=t["senders"], r=t["receivers"], ea=None, pos=t["pos"],
            x=None, y=None, n=t["num_nodes"]))

    nk_pad = [_round_up(m["n"] + 1, 128) for m in meshes]
    ek_pad = [_round_up(max(len(m["s"]), 1), 128) for m in meshes]

    levels = []
    host = []  # per-level np arrays for the second (plan-building) pass
    for k, m in enumerate(meshes):
        e_k = len(m["s"])
        t = trans[k] if k < len(trans) else None
        aux = np.zeros((e_k, 4), dtype=np.float64)
        aux[:, 0] = np.arange(e_k)
        if t is not None:
            aux[:, 1] = t["edge_to_coarse"]
            aux[:, 2] = t["conv_edge"]
            aux[:, 3] = t["edge_weights"]
        xk = m["x"] if m["x"] is not None else np.zeros((m["n"], 1),
                                                        np.float32)
        eak = m["ea"] if m["ea"] is not None else np.zeros((e_k, 1),
                                                           np.float32)
        yk = m["y"]
        sgk, aux_i, aux_b = partition_graph_halo_split(
            senders=m["s"], receivers=m["r"], x=xk, edge_attr=eak,
            pos=np.asarray(m["pos"], np.float64), y=yk,
            num_parts=num_parts, edges_pad_multiple=edges_pad_multiple,
            halo_pad_multiple=halo_pad_multiple,
            align_interior=align_interior, edge_aux=aux)

        emi = np.asarray(sgk.edge_mask_int) > 0
        emb = np.asarray(sgk.edge_mask_bnd) > 0
        edge_rows_int = np.where(emi, aux_i[..., 0],
                                 ek_pad[k] - 1).astype(np.int32)
        edge_rows_bnd = np.where(emb, aux_b[..., 0],
                                 ek_pad[k] - 1).astype(np.int32)

        order, _, n_local = _assign_parts(np.asarray(m["pos"], np.float64),
                                          m["n"], num_parts)
        nlp = sgk.nodes_per_part
        node_rows = np.full((num_parts, nlp), nk_pad[k] - 1, np.int32)
        pos_of_node = np.full(nk_pad[k], 0, np.int32)
        # pads of the replicated index space point at a local pad row
        pos_of_node[:] = nlp - 1
        for p in range(num_parts):
            chunk = order[p * n_local:(p + 1) * n_local]
            node_rows[p, :len(chunk)] = chunk
            pos_of_node[chunk] = p * nlp + np.arange(len(chunk))

        if t is not None:
            f2c = np.full((num_parts, nlp), nk_pad[k + 1] - 1, np.int32)
            cself = np.zeros((num_parts, nlp), np.float32)
            rep = np.zeros((num_parts, nlp), np.float32)
            for p in range(num_parts):
                chunk = order[p * n_local:(p + 1) * n_local]
                kk = len(chunk)
                f2c[p, :kk] = t["fine_to_coarse"][chunk]
                cself[p, :kk] = t["conv_self"][chunk]
                rep[p, :kk] = t["rep_mask"][chunk]
            e2c_int = np.where(emi, aux_i[..., 1],
                               ek_pad[k + 1] - 1).astype(np.int32)
            e2c_bnd = np.where(emb, aux_b[..., 1],
                               ek_pad[k + 1] - 1).astype(np.int32)
            lvl = BSMSHaloLevel(
                graph=sgk,
                node_rows=jnp.asarray(node_rows),
                edge_rows_int=jnp.asarray(edge_rows_int),
                edge_rows_bnd=jnp.asarray(edge_rows_bnd),
                pos_of_node=jnp.asarray(pos_of_node),
                f2c=jnp.asarray(f2c),
                e2c_int=jnp.asarray(e2c_int), e2c_bnd=jnp.asarray(e2c_bnd),
                conv_self=jnp.asarray(cself), rep_mask=jnp.asarray(rep),
                conv_edge_int=jnp.asarray(aux_i[..., 2].astype(np.float32)),
                conv_edge_bnd=jnp.asarray(aux_b[..., 2].astype(np.float32)),
                edge_w_int=jnp.asarray(aux_i[..., 3].astype(np.float32)),
                edge_w_bnd=jnp.asarray(aux_b[..., 3].astype(np.float32)),
                nc_pad=nk_pad[k + 1], ec_pad=ek_pad[k + 1],
                n_real=m["n"], e_real=e_k)
        else:
            lvl = BSMSHaloLevel(
                graph=sgk,
                node_rows=jnp.asarray(node_rows),
                edge_rows_int=jnp.asarray(edge_rows_int),
                edge_rows_bnd=jnp.asarray(edge_rows_bnd),
                pos_of_node=jnp.asarray(pos_of_node),
                f2c=None, e2c_int=None, e2c_bnd=None,
                conv_self=None, rep_mask=None,
                conv_edge_int=None, conv_edge_bnd=None,
                edge_w_int=None, edge_w_bnd=None,
                n_real=m["n"], e_real=e_k)
        levels.append(lvl)
        host.append(dict(
            order=order, n_local=n_local, nlp=nlp,
            eri=edge_rows_int, erb=edge_rows_bnd, emi=emi, emb=emb,
            f2c=(None if t is None else np.asarray(lvl.f2c)),
            e2c_int=(None if t is None else np.asarray(lvl.e2c_int)),
            e2c_bnd=(None if t is None else np.asarray(lvl.e2c_bnd))))

    # ---- second pass: sparse owner-routed transfer plans ----
    my_part = np.arange(num_parts)
    for k in range(len(meshes) - 1):
        hk, hn = host[k], host[k + 1]
        # owner/local-row maps over the k+1 GLOBAL id spaces
        n_next_pad = nk_pad[k + 1]
        owner_n = np.full(n_next_pad, -1, np.int64)  # -1 = pad id
        slot_n = np.full(n_next_pad, hn["nlp"] - 1, np.int64)
        for p in range(num_parts):
            chunk = hn["order"][p * hn["n_local"]:(p + 1) * hn["n_local"]]
            owner_n[chunk] = p
            slot_n[chunk] = np.arange(len(chunk))
        e_next_pad = ek_pad[k + 1]
        ei_n = hn["eri"].shape[1]
        owner_e = np.full(e_next_pad, -1, np.int64)  # -1 = pad id
        slot_e = np.full(e_next_pad, ei_n + hn["erb"].shape[1] - 1,
                         np.int64)
        for p in range(num_parts):
            vi = hn["emi"][p]
            owner_e[hn["eri"][p][vi]] = p
            slot_e[hn["eri"][p][vi]] = np.flatnonzero(vi)
            vb = hn["emb"][p]
            owner_e[hn["erb"][p][vb]] = p
            slot_e[hn["erb"][p][vb]] = ei_n + np.flatnonzero(vb)

        node_slot, node_recv, _ = _owner_route(
            hk["f2c"], owner_n, slot_n, my_part, hn["nlp"], num_parts)
        # both edge streams route into the SAME combined space/staging:
        # build jointly so staging slots are shared
        both = np.concatenate([hk["e2c_int"], hk["e2c_bnd"]], axis=1)
        es_both, edge_recv, _ = _owner_route(
            both, owner_e, slot_e, my_part,
            ei_n + hn["erb"].shape[1], num_parts)
        es_int = es_both[:, :hk["e2c_int"].shape[1]]
        es_bnd = es_both[:, hk["e2c_int"].shape[1]:]
        up_fetch, up_send, _ = _fetch_route(
            hk["f2c"], owner_n, slot_n, my_part, hn["nlp"], num_parts)
        plan = TransferPlan(
            node_slot=jnp.asarray(node_slot),
            node_recv_rows=jnp.asarray(node_recv),
            edge_slot_int=jnp.asarray(np.ascontiguousarray(es_int)),
            edge_slot_bnd=jnp.asarray(np.ascontiguousarray(es_bnd)),
            edge_recv_rows=jnp.asarray(edge_recv),
            up_send_rows=jnp.asarray(up_send),
            up_fetch=jnp.asarray(up_fetch))
        levels[k] = dataclasses.replace(levels[k], plan=plan)
    return BSMSHaloGraph(levels=tuple(levels))


def _two_stream_psum_mean(e_int, e_bnd, w_int, w_bnd, ids_int, ids_bnd,
                          num_segments, axis, eps):
    """Weighted mean over BOTH edge streams, reduced across shards."""
    s = (jax.ops.segment_sum(e_int * w_int[:, None], ids_int,
                             num_segments=num_segments)
         + jax.ops.segment_sum(e_bnd * w_bnd[:, None], ids_bnd,
                               num_segments=num_segments))
    c = (jax.ops.segment_sum(w_int, ids_int, num_segments=num_segments)
         + jax.ops.segment_sum(w_bnd, ids_bnd, num_segments=num_segments))
    s = jax.lax.psum(s, axis)
    c = jax.lax.psum(c, axis)
    return s / jnp.maximum(c, eps)[:, None]


def _wec_conv_sharded(lvl: BSMSHaloLevel, x, axis):
    """Sharded WeightedEdgeConv aggregation on this level's rows: remote
    sender rows arrive through the level's halo exchange, then the
    receiver-owned conv is complete per shard."""
    from aero_gnn_tpu import ops
    from aero_gnn_tpu.parallel.halo import _exchange

    g = lvl.graph
    n_local = x.shape[0]
    halo_x = _exchange(x, g.send_idx, axis)
    xs_i = ops.gather_senders(x, g.senders_int, g.sender_perm_int,
                              g.senders_int_sorted)
    xs_b = halo_x.at[g.senders_bnd].get(mode="promise_in_bounds")
    return (lvl.conv_self[:, None] * x
            + jax.ops.segment_sum(lvl.conv_edge_int[:, None] * xs_i,
                                  g.receivers_int, num_segments=n_local,
                                  indices_are_sorted=True)
            + jax.ops.segment_sum(lvl.conv_edge_bnd[:, None] * xs_b,
                                  g.receivers_bnd, num_segments=n_local,
                                  indices_are_sorted=True))


def _wec_spread_sharded(lvl: BSMSHaloLevel, z, axis):
    """Sharded transpose of _wec_conv_sharded: contributions to REMOTE
    senders ship back with the REVERSE all_to_all (the manual transpose of
    parallel.halo._exchange; unused halo slots carry exact zeros, so the
    pad-add to row send_idx[..., 0] is a no-op)."""
    from aero_gnn_tpu.ops import segment_pool_sum

    g = lvl.graph
    n_local = z.shape[0]
    zr_i = z.at[g.receivers_int].get(mode="promise_in_bounds")
    spread = segment_pool_sum(
        lvl.conv_edge_int[:, None] * zr_i, g.senders_int, n_local,
        perm=g.sender_perm_int, seg_sorted=g.senders_int_sorted)
    zr_b = z.at[g.receivers_bnd].get(mode="promise_in_bounds")
    num_slots = g.send_idx.shape[0] * g.send_idx.shape[1]
    buf = jax.ops.segment_sum(
        lvl.conv_edge_bnd[:, None] * zr_b, g.senders_bnd,
        num_segments=num_slots)
    rev = jax.lax.all_to_all(
        buf.reshape(g.send_idx.shape[0], g.send_idx.shape[1], -1),
        axis, split_axis=0, concat_axis=0, tiled=False)
    spread = spread + jnp.zeros_like(z).at[
        g.send_idx.reshape(-1)].add(rev.reshape(-1, z.shape[-1]))
    return lvl.conv_self[:, None] * z + spread


def bsms_halo_forward(params, cfg, bg: BSMSHaloGraph, *,
                      axis: str = "graph") -> jax.Array:
    """Per-shard BSMS forward with EVERY level sharded (inside shard_map).
    Uses BSMSConfig params; supports both the "mean" and the "weighted"
    (WeightedEdgeConv) transfer."""
    from aero_gnn_tpu.models.mgn import checkpointed_layer_stack
    from aero_gnn_tpu.parallel.halo import _halo_split_layer

    levels = bg.levels
    S = len(levels)
    layer_cfg = cfg.layer_cfg
    weighted = cfg.transfer == "weighted"

    def stack(stacked, lvl, x, ei, eb):
        def body(carry, lp):
            x, ei, eb = carry
            x, ei, eb = _halo_split_layer(lp, layer_cfg, x, ei, eb,
                                          lvl.graph, axis)
            return (x, ei, eb), None
        # grouped remat only on stacks it divides (the bottleneck stack
        # at large per-shard sizes; 2-layer down/up stacks stay per-layer)
        n_l = jax.tree.leaves(stacked)[0].shape[0]
        rg = getattr(cfg, "remat_group", 0)
        return checkpointed_layer_stack(
            body, (x, ei, eb), stacked,
            remat=getattr(cfg, "remat", True),
            remat_policy=getattr(cfg, "remat_policy", "save_fused"),
            unroll=getattr(cfg, "unroll", False),
            remat_group=rg if rg > 1 and n_l % rg == 0 else 0,
            remat_group_policy=getattr(cfg, "remat_group_policy", "full"))

    def sparse_reduce(payload, slot, recv_rows, n_dst):
        """Owner-routed reduction: one segment-sum into [n_dst + P*Ht]
        (local rows + per-peer staging), all_to_all the staging block,
        scatter-add the received rows (staged pads carry exact zeros)."""
        P_, Ht = recv_rows.shape
        big = jax.ops.segment_sum(payload, slot,
                                  num_segments=n_dst + P_ * Ht)
        local, stage = big[:n_dst], big[n_dst:].reshape(P_, Ht, -1)
        recv = jax.lax.all_to_all(stage, axis, split_axis=0,
                                  concat_axis=0, tiled=False)
        return local.at[recv_rows].add(recv)

    def sparse_fetch(xk1, send_rows, fetch):
        """Owner-routed gather: ship each peer its requested local rows
        (all_to_all), then read local + received rows by ``fetch``."""
        buf = xk1.at[send_rows].get(mode="promise_in_bounds")  # [P, Ht, h]
        table = jax.lax.all_to_all(buf, axis, split_axis=0,
                                   concat_axis=0, tiled=False)
        return jnp.concatenate(
            [xk1, table.reshape(-1, xk1.shape[-1])], axis=0
        ).at[fetch].get(mode="promise_in_bounds")

    from aero_gnn_tpu.models.mgn import _cast, cast_params
    from aero_gnn_tpu.parallel.halo import cast_split_graph
    cdt = getattr(cfg, "compute_dtype", "float32")
    params = cast_params(params, cdt)
    if cdt != "float32":
        # bf16 compute on every level (matching MGNConfig.apply): halves
        # per-shard HBM and the halo/transfer exchange bytes. WEC conv
        # weights stay f32 by design (_wec_weight semantics).
        levels = tuple(
            dataclasses.replace(lvl, graph=cast_split_graph(lvl.graph, cdt))
            for lvl in levels)
    L0 = levels[0]
    x = M.mlp_apply(params["node_encoder"], _cast(L0.graph.x, cdt),
                    activation=cfg.activation)
    e_i = M.mlp_apply(params["edge_encoder"],
                      _cast(L0.graph.edge_attr_int, cdt),
                      activation=cfg.activation)
    e_b = M.mlp_apply(params["edge_encoder"],
                      _cast(L0.graph.edge_attr_bnd, cdt),
                      activation=cfg.activation)
    dt = x.dtype

    # ---- down ----
    skips = []
    for k in range(S - 1):
        lvl, nxt = levels[k], levels[k + 1]
        x, e_i, e_b = stack(params["down"][k], lvl, x, e_i, e_b)
        skips.append((x, e_i, e_b))
        g = lvl.graph
        plan = lvl.plan
        n_next = nxt.graph.node_mask.shape[0]
        ei_next = nxt.graph.edge_mask_int.shape[0]
        eb_next = nxt.graph.edge_mask_bnd.shape[0]
        if weighted:
            sel = _wec_conv_sharded(lvl, x, axis) * lvl.rep_mask[:, None]
            x = sparse_reduce(sel, plan.node_slot, plan.node_recv_rows,
                              n_next).astype(dt)
            w_i = lvl.edge_w_int * g.edge_mask_int
            w_b = lvl.edge_w_bnd * g.edge_mask_bnd
            eps = 1e-12
        else:
            nm = g.node_mask.astype(x.dtype)
            res = sparse_reduce(
                jnp.concatenate([x * nm[:, None], nm[:, None]], axis=1),
                plan.node_slot, plan.node_recv_rows, n_next)
            x = (res[:, :-1]
                 / jnp.maximum(res[:, -1:], 1.0)).astype(dt)
            w_i, w_b = g.edge_mask_int, g.edge_mask_bnd
            eps = 1.0
        # edge features: both source streams reduce into the next level's
        # combined [Ei + Eb] slot space with a shared staging block
        P_, Ht = plan.edge_recv_rows.shape
        d_e = ei_next + eb_next
        pi = jnp.concatenate([e_i * w_i[:, None], w_i[:, None]], axis=1)
        pb = jnp.concatenate([e_b * w_b[:, None], w_b[:, None]], axis=1)
        big = (jax.ops.segment_sum(pi, plan.edge_slot_int,
                                   num_segments=d_e + P_ * Ht)
               + jax.ops.segment_sum(pb, plan.edge_slot_bnd,
                                     num_segments=d_e + P_ * Ht))
        local, stage = big[:d_e], big[d_e:].reshape(P_, Ht, -1)
        recv = jax.lax.all_to_all(stage, axis, split_axis=0,
                                  concat_axis=0, tiled=False)
        comb = local.at[plan.edge_recv_rows].add(recv)
        comb = (comb[:, :-1]
                / jnp.maximum(comb[:, -1:], eps)).astype(dt)
        e_i, e_b = comb[:ei_next], comb[ei_next:]

    # ---- bottleneck (sharded, deepest level) ----
    x, e_i, e_b = stack(params["bottleneck"], levels[S - 1], x, e_i, e_b)

    # ---- up ----
    for i in range(S - 1):
        k = S - 2 - i
        lvl = levels[k]
        sx, sei, seb = skips[-(i + 1)]
        xc_l = sparse_fetch(x, lvl.plan.up_send_rows, lvl.plan.up_fetch)
        if weighted:
            z = xc_l * lvl.rep_mask[:, None]
            xc_l = _wec_spread_sharded(lvl, z, axis).astype(dt)
        x = xc_l + sx
        e_i, e_b = sei, seb
        x, e_i, e_b = stack(params["up"][i], lvl, x, e_i, e_b)

    return M.mlp_apply(params["decoder"], x,
                       activation=cfg.activation).astype(jnp.float32)


def _localize_halo(bg: BSMSHaloGraph) -> BSMSHaloGraph:
    """Strip the leading shard axis from the sharded fields (inside
    shard_map each shard sees [1, ...]); pos_of_node stays replicated."""
    def _loc(lvl: BSMSHaloLevel) -> BSMSHaloLevel:
        def first(a):
            return None if a is None else a[0]
        plan = lvl.plan
        if plan is not None:
            plan = jax.tree.map(lambda a: a[0], plan)
        return dataclasses.replace(
            lvl, graph=jax.tree.map(lambda a: a[0], lvl.graph),
            node_rows=lvl.node_rows[0],
            edge_rows_int=lvl.edge_rows_int[0],
            edge_rows_bnd=lvl.edge_rows_bnd[0],
            f2c=first(lvl.f2c),
            e2c_int=first(lvl.e2c_int), e2c_bnd=first(lvl.e2c_bnd),
            conv_self=first(lvl.conv_self), rep_mask=first(lvl.rep_mask),
            conv_edge_int=first(lvl.conv_edge_int),
            conv_edge_bnd=first(lvl.conv_edge_bnd),
            edge_w_int=first(lvl.edge_w_int),
            edge_w_bnd=first(lvl.edge_w_bnd),
            plan=plan)
    return BSMSHaloGraph(levels=tuple(_loc(l) for l in bg.levels))


def _bsms_halo_in_spec(bg: BSMSHaloGraph, axis: str) -> BSMSHaloGraph:
    def spec(lvl: BSMSHaloLevel) -> BSMSHaloLevel:
        def sh(a):
            return None if a is None else P(axis)
        plan = lvl.plan
        if plan is not None:
            plan = jax.tree.map(lambda _: P(axis), plan)
        return dataclasses.replace(
            lvl, graph=jax.tree.map(lambda _: P(axis), lvl.graph),
            node_rows=P(axis), edge_rows_int=P(axis), edge_rows_bnd=P(axis),
            pos_of_node=P(),
            f2c=sh(lvl.f2c), e2c_int=sh(lvl.e2c_int),
            e2c_bnd=sh(lvl.e2c_bnd), conv_self=sh(lvl.conv_self),
            rep_mask=sh(lvl.rep_mask),
            conv_edge_int=sh(lvl.conv_edge_int),
            conv_edge_bnd=sh(lvl.conv_edge_bnd),
            edge_w_int=sh(lvl.edge_w_int), edge_w_bnd=sh(lvl.edge_w_bnd),
            plan=plan)
    return BSMSHaloGraph(levels=tuple(spec(l) for l in bg.levels))


def make_bsms_halo_forward(model_cfg, mesh: Mesh, *, axis: str = "graph"):
    """Jitted BSMS forward on the all-levels-sharded halo scheme (see
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
            cache[key] = jax.jit(fwd, compiler_options=async_jit_options(mesh))
        return cache[key](params, bg)

    return run


def make_bsms_halo_train_step(model_cfg, optimizer, mesh: Mesh, *,
                              axis: str = "graph"):
    """Training step for the flagship halo-split BSMS (BASELINE config[4]):
    per-shard masked-MSE share of the global loss + summed grads."""
    import optax

    cache = {}

    def per_shard(params, opt_state, bg):
        bg_l = _localize_halo(bg)

        def loss_fn(p):
            pred = bsms_halo_forward(p, model_cfg, bg_l, axis=axis)
            g0 = bg_l.levels[0].graph
            m = g0.node_mask[:, None]
            # LOCAL numerator / global count: a psum'd numerator would
            # inflate the grad seed P x (see parallel.spatial
            # make_spatial_train_step)
            se = jnp.sum(jnp.square(pred - g0.y) * m)
            cnt = jax.lax.psum(jnp.sum(m) * g0.y.shape[-1], axis)
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def build(bg):
        """The jitted step specialized to ``bg``'s tree structure (the
        in_specs depend on it); exposed for AOT lowering
        (benchmarks/multichip_aot.py)."""
        key = jax.tree.structure(bg)
        if key not in cache:
            step = shard_map(per_shard, mesh=mesh,
                             in_specs=(P(), P(),
                                       _bsms_halo_in_spec(bg, axis)),
                             out_specs=(P(), P(), P()),
                             check_vma=False)
            cache[key] = jax.jit(step, donate_argnums=(0, 1),
                   compiler_options=async_jit_options(mesh))
        return cache[key]

    def run(params, opt_state, bg):
        return build(bg)(params, opt_state, bg)

    run.build = build
    return run


# ---------------------------------------------------------------------------
# Sparse owner-routed transfer plans (replace the O(N) psum/all_gather
# transfer intermediates with all_to_all of only the cross-shard rows —
# level partitions are independently Morton-ordered, so a fine row's
# coarse parent usually lives on the same shard and the exchanged row
# count is a small mismatch fraction, not O(N))
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TransferPlan:
    """Host-precomputed routing for one level boundary k -> k+1.

    DOWN (reduce to owners): every source row/slot gets a combined
    destination slot in [0, D + P*Ht): its owner-local destination row
    when the owner is this shard, else a per-peer staging slot. In-jit:
    one segment-sum into the combined space, all_to_all the staging
    block, scatter-add the received rows at ``recv_rows``.

    UP (fetch from owners): each shard ships ``send_rows`` of its local
    destination-level rows to each peer (all_to_all), then every source
    row reads ``fetch_idx`` from concat([local_dst, table]).
    """

    # down: node rows
    node_slot: jax.Array       # i32[P, Nl_k] combined dst slot
    node_recv_rows: jax.Array  # i32[P, P, Htn] local k+1 rows to add into
    # down: edge slots (combined int+bnd destination space)
    edge_slot_int: jax.Array   # i32[P, Ei_k]
    edge_slot_bnd: jax.Array   # i32[P, Eb_k]
    edge_recv_rows: jax.Array  # i32[P, P, Hte] combined local k+1 edge rows
    # up: node fetch
    up_send_rows: jax.Array    # i32[P, P, Htu] local k+1 rows to ship
    up_fetch: jax.Array        # i32[P, Nl_k] into [Nl_next + P*Htu]


def _owner_route(tgt_global: np.ndarray, owner: np.ndarray,
                 local_slot: np.ndarray, my_part: np.ndarray,
                 n_dst_slots: int, num_parts: int, pad_multiple: int = 8):
    """Combined-slot routing for a [P, R] table of global destination ids.

    Returns (slot [P, R], recv_rows [P, P, Ht]): slot < n_dst_slots means
    a local destination row; n_dst_slots + q*Ht + j stages row j for peer
    q. recv_rows[p, q, j] = the local destination row on p for peer q's
    j-th staged slot (pads -> 0; staged pads carry exact zeros)."""
    P_, R = tgt_global.shape
    own = owner[tgt_global]
    loc = local_slot[tgt_global]
    # owner -1 marks PAD destination ids: treat as reader-local (the
    # routed values are exact zeros; shipping them would only inflate Ht)
    remote = (own != my_part[:, None]) & (own >= 0)
    # unique (src, dst, local_dst_row) staging slots, like halo._halo_plan
    src = np.repeat(np.arange(P_), R).reshape(P_, R)
    key = (src[remote].astype(np.int64) * num_parts
           + own[remote]) * n_dst_slots + loc[remote]
    uk, inv = np.unique(key, return_inverse=True)
    uk_pair = uk // n_dst_slots
    uk_row = uk % n_dst_slots
    seg_start = np.searchsorted(uk_pair, np.arange(num_parts * num_parts))
    counts = np.diff(np.append(seg_start, len(uk)))
    h_max = int(counts.max()) if len(uk) else 0
    Ht = max(_round_up(max(h_max, 1), pad_multiple), pad_multiple)
    slot_in_pair = np.arange(len(uk)) - seg_start[uk_pair]

    slot = loc.copy().astype(np.int64)
    # staged slot on the SOURCE shard p for peer q: n_dst + q*Ht + j
    slot[remote] = (n_dst_slots + (uk_pair[inv] % num_parts) * Ht
                    + slot_in_pair[inv])
    recv_rows = np.zeros((num_parts, num_parts, Ht), np.int32)
    # uk_pair = src*P + dst: receiving shard dst gets, from peer src, slot
    # j -> local row uk_row
    recv_rows[uk_pair % num_parts, uk_pair // num_parts,
              slot_in_pair] = uk_row
    return slot.astype(np.int32), recv_rows, Ht


def _fetch_route(tgt_global: np.ndarray, owner: np.ndarray,
                 local_slot: np.ndarray, my_part: np.ndarray,
                 n_dst_rows: int, num_parts: int, pad_multiple: int = 8):
    """UP routing: (fetch [P, R] into [n_dst_rows + P*Ht],
    send_rows [P, P, Ht]). send_rows[p, q, j] = p's local dst row to ship
    to q as its j-th table slot; fetch reads local rows directly and
    remote ones from the received table."""
    P_, R = tgt_global.shape
    own = owner[tgt_global]
    loc = local_slot[tgt_global]
    # owner -1 marks PAD ids: fetch a reader-local pad row instead
    remote = (own != my_part[:, None]) & (own >= 0)
    dst = np.repeat(np.arange(P_), R).reshape(P_, R)  # the READER shard
    # unique (owner, reader, row): owner ships row once per reader
    key = (own[remote].astype(np.int64) * num_parts
           + dst[remote]) * n_dst_rows + loc[remote]
    uk, inv = np.unique(key, return_inverse=True)
    uk_pair = uk // n_dst_rows
    uk_row = uk % n_dst_rows
    seg_start = np.searchsorted(uk_pair, np.arange(num_parts * num_parts))
    counts = np.diff(np.append(seg_start, len(uk)))
    h_max = int(counts.max()) if len(uk) else 0
    Ht = max(_round_up(max(h_max, 1), pad_multiple), pad_multiple)
    slot_in_pair = np.arange(len(uk)) - seg_start[uk_pair]

    send_rows = np.zeros((num_parts, num_parts, Ht), np.int32)
    send_rows[uk_pair // num_parts, uk_pair % num_parts,
              slot_in_pair] = uk_row
    fetch = loc.copy().astype(np.int64)
    # reader-side table layout after all_to_all: block q = rows from owner
    # q -> table slot q*Ht + j
    fetch[remote] = (n_dst_rows
                     + (uk_pair[inv] // num_parts) * Ht
                     + slot_in_pair[inv])
    return fetch.astype(np.int32), send_rows, Ht
