"""Sparse halo exchange for spatial graph parallelism.

parallel.spatial's baseline halo is an ``all_gather`` of every shard's
projected node features — O(P * N_local * h) per layer. On Morton-ordered
partitions, only boundary nodes are referenced across shards, so this
module exchanges exactly the needed rows with one ``all_to_all``:
O(P * H * h), H = max boundary size per shard pair (host-precomputed,
static).

Per layer, per shard:
  1. send_buf = s_proj[send_idx]                 # [P, H, h] rows for each peer
  2. recv     = all_to_all(send_buf)             # [P, H, h] rows from each peer
  3. table    = concat([s_proj, recv.reshape(P*H, h)])
  4. sender features = table[senders_combined]   # local OR halo slots

Gradients flow through all_to_all (its transpose is the reverse
all_to_all) automatically under shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from aero_gnn_tpu.graph.padded import _round_up, sort_edges_by_receiver
from aero_gnn_tpu.models.mgn import (_cast, cast_params,
                                     checkpointed_layer_stack, scan_layers)
from aero_gnn_tpu.nn import blocks as B
from aero_gnn_tpu.nn import mlp as M
from aero_gnn_tpu.parallel.xla_flags import async_jit_options
from aero_gnn_tpu.parallel.spatial import _morton_order, sender_sort


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloSpatialGraph:
    """Spatially partitioned mesh with sparse halo metadata ([P, ...])."""

    x: jax.Array  # [P, Nl, Dn]
    edge_attr: jax.Array  # [P, El, De]
    senders_combined: jax.Array  # i32[P, El] into [Nl + P*H] table
    receivers_local: jax.Array  # i32[P, El]
    send_idx: jax.Array  # i32[P, P, H] local rows to ship to each peer
    node_mask: jax.Array  # f32[P, Nl]
    edge_mask: jax.Array  # f32[P, El]
    y: jax.Array  # [P, Nl, Dy]
    # per-shard sender sort (sorted segment-sum backward for the combined
    # table gather); None on pre-existing pickled graphs
    sender_perm: Optional[jax.Array] = None  # i32[P, El]
    senders_sorted: Optional[jax.Array] = None  # i32[P, El]

    @property
    def num_parts(self) -> int:
        return self.x.shape[0]

    @property
    def nodes_per_part(self) -> int:
        return self.x.shape[1]

    @property
    def halo_size(self) -> int:
        return self.send_idx.shape[2]


def _halo_plan(s_new: np.ndarray, owner_s: np.ndarray, owner_r: np.ndarray,
               n_local: int, num_parts: int, halo_pad_multiple: int,
               halo_rows=None):
    """Fully vectorized halo plan (no per-edge Python loops — the previous
    dict-based builder was O(E) Python at 10^6+ edges).

    Returns (send_idx [P, P, H], H, halo_slot [E]) where halo_slot[i] is the
    slot of edge i's sender in the RECEIVER's halo table (n_local + p*H + k),
    valid only where owner_s != owner_r.
    """
    bmask = owner_s != owner_r
    # one sorted-unique over composite keys replaces P^2 masked unique()s:
    # key = ((src_part * P) + dst_part) * n_local + src_local_row
    pair = owner_s[bmask] * num_parts + owner_r[bmask]
    row = s_new[bmask] - owner_s[bmask] * n_local
    key = pair * np.int64(n_local) + row
    uk, inv = np.unique(key, return_inverse=True)
    uk_pair = uk // n_local
    uk_row = uk % n_local
    seg_start = np.searchsorted(uk_pair, np.arange(num_parts * num_parts))
    counts = np.diff(np.append(seg_start, len(uk)))
    h_max = int(counts.max()) if len(uk) else 0
    H = max(_round_up(max(h_max, 1), halo_pad_multiple), halo_pad_multiple)
    if halo_rows is not None:
        if halo_rows < h_max:
            raise ValueError(f"halo_rows={halo_rows} < required {h_max}")
        H = halo_rows

    send_idx = np.zeros((num_parts, num_parts, H), dtype=np.int32)
    slot = np.arange(len(uk)) - seg_start[uk_pair]
    send_idx[uk_pair // num_parts, uk_pair % num_parts, slot] = uk_row

    halo_slot = np.zeros(len(s_new), dtype=np.int64)
    halo_slot[bmask] = owner_s[bmask] * H + slot[inv]
    return send_idx, H, halo_slot


def _assign_parts(pos: np.ndarray, n: int, num_parts: int):
    """Morton-ordered equal-size node partition: (order, new_of_old,
    n_local)."""
    order = _morton_order(pos)
    n_local = -(-n // num_parts)
    new_of_old = np.full(n, -1, dtype=np.int64)
    for p in range(num_parts):
        chunk = order[p * n_local:(p + 1) * n_local]
        new_of_old[chunk] = p * n_local + np.arange(len(chunk))
    return order, new_of_old, n_local


def _pack_nodes(order, n_local, num_parts, x, y, dtype, rows=None):
    rows = n_local if rows is None else rows
    assert rows >= n_local
    xs = np.zeros((num_parts, rows, x.shape[1]), dtype=dtype)
    ys = np.zeros((num_parts, rows,
                   y.shape[1] if y is not None else 1), dtype=dtype)
    nm = np.zeros((num_parts, rows), dtype=dtype)
    for p in range(num_parts):
        chunk = order[p * n_local:(p + 1) * n_local]
        k = len(chunk)
        xs[p, :k] = x[chunk]
        if y is not None:
            ys[p, :k] = y[chunk]
        nm[p, :k] = 1.0
    return xs, ys, nm


def _pack_edge_streams(parts, num_parts, de, pad_multiple, dtype,
                       rows=None, *, pad_sender=0, pad_receiver=0):
    """Pack per-part (sender, recv_local, edge_attr) triples into padded
    [P, El, ...] arrays (mask 0 on pad slots). ``rows`` overrides the
    padded per-part length (for cross-sample shape reuse, e.g. stacking
    shards along a data axis).

    Pad receivers default to the LAST local row (``pad_receiver``), not 0:
    real rows are receiver-ascending, so the stream stays SORTED and the
    downstream segment_sum(indices_are_sorted=True) hint holds (CLAUDE.md
    invariant; pads contribute exact zeros either way). ``pad_sender`` is
    any in-bounds row of the stream's sender table."""
    need = max(max((len(c) for c, _, _ in parts), default=1), 1)
    el = _round_up(need, pad_multiple)
    if rows is not None:
        if rows < need:
            raise ValueError(f"rows={rows} < required {need}")
        el = rows
    sc = np.full((num_parts, el), pad_sender, dtype=np.int32)
    rl = np.full((num_parts, el), pad_receiver, dtype=np.int32)
    ea = np.zeros((num_parts, el, de), dtype=dtype)
    em = np.zeros((num_parts, el), dtype=dtype)
    for s, (comb, rp, eap) in enumerate(parts):
        k = len(comb)
        sc[s, :k], rl[s, :k], ea[s, :k] = comb, rp, eap
        em[s, :k] = 1.0
    return sc, rl, ea, em


# canonical implementation shared with parallel.spatial
_sender_sort = sender_sort


def partition_graph_halo(
    *,
    senders: np.ndarray,
    receivers: np.ndarray,
    x: np.ndarray,
    edge_attr: np.ndarray,
    pos: np.ndarray,
    y: Optional[np.ndarray],
    num_parts: int,
    edges_pad_multiple: int = 128,
    halo_pad_multiple: int = 8,
    dtype=np.float32,
) -> HaloSpatialGraph:
    n = x.shape[0]
    order, new_of_old, n_local = _assign_parts(pos, n, num_parts)
    s_new = new_of_old[senders]
    r_new = new_of_old[receivers]
    owner_s = s_new // n_local
    owner_r = r_new // n_local

    send_idx, H, halo_slot = _halo_plan(
        s_new, owner_s, owner_r, n_local, num_parts, halo_pad_multiple)

    # combined sender index per edge: local row, or halo-table slot
    comb_all = np.where(owner_s == owner_r,
                        s_new - owner_r * n_local,
                        n_local + halo_slot).astype(np.int32)

    # per-shard edges (receiver-owned), receiver-sorted
    parts = []
    for s in range(num_parts):
        m = owner_r == s
        sp, rp = s_new[m], r_new[m]
        perm = sort_edges_by_receiver(sp, rp)
        parts.append((comb_all[m][perm], (rp - s * n_local)[perm],
                      edge_attr[m][perm]))
    sc, rl, ea, em = _pack_edge_streams(
        parts, num_parts, edge_attr.shape[1], edges_pad_multiple, dtype,
        pad_sender=n_local + num_parts * H - 1, pad_receiver=n_local - 1)
    sperm, ssort = _sender_sort(sc)

    xs, ys, nm = _pack_nodes(order, n_local, num_parts, x, y, dtype)
    return HaloSpatialGraph(
        x=jnp.asarray(xs), edge_attr=jnp.asarray(ea),
        senders_combined=jnp.asarray(sc), receivers_local=jnp.asarray(rl),
        send_idx=jnp.asarray(send_idx),
        node_mask=jnp.asarray(nm), edge_mask=jnp.asarray(em),
        y=jnp.asarray(ys), sender_perm=jnp.asarray(sperm),
        senders_sorted=jnp.asarray(ssort))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloSplitGraph:
    """Spatially partitioned mesh with the edge stream SPLIT into interior
    (both endpoints shard-local) and boundary (sender remote) streams.

    The split is what lets the halo all_to_all hide under compute
    (SURVEY.md:165,453-455 "overlapped with local neighborhood
    aggregation"): interior edge/aggregation work depends only on local
    tensors, so XLA's latency-hiding scheduler can issue the
    collective-start before it and the collective-done after — with one
    combined stream every edge gather depends on the halo table and the
    chain is serial. Boundary edges are O(surface), interior O(volume), so
    most of each layer's work overlaps the exchange.
    """

    x: jax.Array  # [P, Nl, Dn]
    # interior stream (sender local)
    edge_attr_int: jax.Array  # [P, Ei, De]
    senders_int: jax.Array  # i32[P, Ei] local rows
    receivers_int: jax.Array  # i32[P, Ei] local rows (sorted)
    edge_mask_int: jax.Array  # f32[P, Ei]
    # per-shard sender sort of the interior stream: routes the sender
    # gather's backward through a SORTED segment sum (CLAUDE.md invariant)
    sender_perm_int: jax.Array  # i32[P, Ei]
    senders_int_sorted: jax.Array  # i32[P, Ei]
    # boundary stream (sender remote; senders index the [P*H] halo table)
    edge_attr_bnd: jax.Array  # [P, Eb, De]
    senders_bnd: jax.Array  # i32[P, Eb] halo-table rows
    receivers_bnd: jax.Array  # i32[P, Eb] local rows (sorted)
    edge_mask_bnd: jax.Array  # f32[P, Eb]
    send_idx: jax.Array  # i32[P, P, H]
    node_mask: jax.Array  # f32[P, Nl]
    y: jax.Array  # [P, Nl, Dy]
    # static: interior streams are block-aligned (ALIGN_NODE_BLOCK node
    # blocks x ALIGN_EDGE_TILE edge tiles per shard) so the fused Pallas
    # kernels run on the per-shard interior compute. An explicit flag —
    # divisible shapes alone are unsafe (see CLAUDE.md invariants).
    aligned: bool = dataclasses.field(default=False,
                                      metadata=dict(static=True))

    @property
    def num_parts(self) -> int:
        return self.x.shape[0]

    @property
    def nodes_per_part(self) -> int:
        return self.x.shape[1]

    @property
    def halo_size(self) -> int:
        return self.send_idx.shape[2]


def _pack_aligned_interior(parts_int, num_parts, de, n_local_pad, dtype,
                           rows=None):
    """Block-align each shard's interior edge stream
    (graph.padded._align_edge_blocks semantics: every ALIGN_NODE_BLOCK node
    block owns whole ALIGN_EDGE_TILE-edge tiles) and pack shards to one
    padded length. Tail pad tiles point at the shard's last pad node (the
    last block), mask 0 — mirroring build_graph_batch, so in-jit
    derive_tiles stays exact."""
    from aero_gnn_tpu.graph.padded import (
        ALIGN_EDGE_TILE, _align_edge_blocks)

    aligned = []
    for sp, rp, eap in parts_int:
        s_a, r_a, ea_a, valid, _, _ = _align_edge_blocks(
            sp.astype(np.int64), rp.astype(np.int64), eap, n_local_pad,
            dtype)
        aligned.append((s_a, r_a, ea_a, valid))
    need = max(len(a[0]) for a in aligned)
    el = _round_up(need, ALIGN_EDGE_TILE)
    if rows is not None:
        if rows < need or rows % ALIGN_EDGE_TILE:
            raise ValueError(
                f"edges_int_rows={rows} incompatible with aligned "
                f"interior length {need} (tile {ALIGN_EDGE_TILE})")
        el = rows
    pad_node = n_local_pad - 1
    si = np.full((num_parts, el), pad_node, dtype=np.int32)
    ri = np.full((num_parts, el), pad_node, dtype=np.int32)
    ea = np.zeros((num_parts, el, de), dtype=dtype)
    em = np.zeros((num_parts, el), dtype=dtype)
    for s, (sa, ra, ea_, va) in enumerate(aligned):
        k = len(sa)
        si[s, :k], ri[s, :k], ea[s, :k] = sa, ra, ea_
        em[s, :k] = va.astype(dtype)
    return si, ri, ea, em


def partition_graph_halo_split(
    *,
    senders: np.ndarray,
    receivers: np.ndarray,
    x: np.ndarray,
    edge_attr: np.ndarray,
    pos: np.ndarray,
    y: Optional[np.ndarray],
    num_parts: int,
    edges_pad_multiple: int = 128,
    halo_pad_multiple: int = 8,
    dtype=np.float32,
    halo_rows=None,
    edges_int_rows=None,
    edges_bnd_rows=None,
    align_interior: bool = False,
    edge_aux: Optional[np.ndarray] = None,
):
    """partition_graph_halo with interior/boundary edge streams (see
    HaloSplitGraph). Fully vectorized (no per-edge Python loops).

    ``halo_rows`` / ``edges_int_rows`` / ``edges_bnd_rows`` override the
    padded sizes so shards of DIFFERENT samples share one shape (required
    to stack them along a data axis, parallel.hybrid.stack_halo_split) —
    the halo-table row encoding bakes H into the boundary sender indices,
    so the override must be applied at build time.

    ``align_interior=True`` pads each shard's node count to a whole number
    of ALIGN_NODE_BLOCK blocks and block-aligns the interior edge streams,
    so the fused Pallas edge/node kernels run on the per-shard interior
    compute (the dominant cost on a pod) — the boundary stream stays on
    XLA (O(surface), tiny).

    ``edge_aux`` optionally carries EXTRA per-edge columns (f64 [E, K],
    e.g. hierarchy edge_to_coarse ids / WeightedEdgeConv weights) through
    exactly the same permutation/padding/alignment as edge_attr. Padded
    and alignment slots get 0. Returns (graph, aux_int [P, Ei, K],
    aux_bnd [P, Eb, K]) instead of just the graph. f64 keeps integer ids
    exact (f32 payload columns would silently round ids above 2^24)."""
    n = x.shape[0]
    order, new_of_old, n_local = _assign_parts(pos, n, num_parts)
    s_new = new_of_old[senders]
    r_new = new_of_old[receivers]
    owner_s = s_new // n_local
    owner_r = r_new // n_local

    send_idx, H, halo_slot = _halo_plan(
        s_new, owner_s, owner_r, n_local, num_parts, halo_pad_multiple,
        halo_rows=halo_rows)

    interior = owner_s == owner_r
    de = edge_attr.shape[1]
    pack_dtype = dtype
    ea_full = edge_attr
    if edge_aux is not None:
        # thread the aux columns through the exact same perm/pad/alignment
        # as edge_attr; f64 keeps integer ids exact, f32->f64->f32 features
        # round-trip exactly
        ea_full = np.concatenate(
            [edge_attr.astype(np.float64),
             np.asarray(edge_aux, dtype=np.float64)], axis=1)
        pack_dtype = np.float64
    parts_int, parts_bnd = [], []
    for s in range(num_parts):
        mi = (owner_r == s) & interior
        sp, rp = s_new[mi] - s * n_local, r_new[mi] - s * n_local
        perm = sort_edges_by_receiver(sp, rp)
        parts_int.append((sp[perm].astype(np.int32), rp[perm],
                          ea_full[mi][perm]))
        mb = (owner_r == s) & ~interior
        hs, rb = halo_slot[mb], r_new[mb] - s * n_local
        perm = sort_edges_by_receiver(hs, rb)
        parts_bnd.append((hs[perm].astype(np.int32), rb[perm],
                          ea_full[mb][perm]))
    if align_interior:
        from aero_gnn_tpu.graph.padded import ALIGN_NODE_BLOCK

        n_local_pad = _round_up(n_local + 1, ALIGN_NODE_BLOCK)
        si, ri, eai, emi = _pack_aligned_interior(
            parts_int, num_parts, ea_full.shape[1], n_local_pad, pack_dtype,
            rows=edges_int_rows)
    else:
        n_local_pad = n_local
        si, ri, eai, emi = _pack_edge_streams(
            parts_int, num_parts, ea_full.shape[1], edges_pad_multiple,
            pack_dtype, rows=edges_int_rows, pad_sender=n_local - 1,
            pad_receiver=n_local - 1)
    sb, rb, eab, emb = _pack_edge_streams(
        parts_bnd, num_parts, ea_full.shape[1], halo_pad_multiple,
        pack_dtype, rows=edges_bnd_rows, pad_sender=num_parts * H - 1,
        pad_receiver=n_local_pad - 1)
    sperm_i, ssort_i = _sender_sort(si)

    aux_int = aux_bnd = None
    if edge_aux is not None:
        aux_int, eai = eai[..., de:], eai[..., :de].astype(dtype)
        aux_bnd, eab = eab[..., de:], eab[..., :de].astype(dtype)
        emi, emb = emi.astype(dtype), emb.astype(dtype)

    xs, ys, nm = _pack_nodes(order, n_local, num_parts, x, y, dtype,
                             rows=n_local_pad)
    sg = HaloSplitGraph(
        x=jnp.asarray(xs),
        edge_attr_int=jnp.asarray(eai), senders_int=jnp.asarray(si),
        receivers_int=jnp.asarray(ri), edge_mask_int=jnp.asarray(emi),
        sender_perm_int=jnp.asarray(sperm_i),
        senders_int_sorted=jnp.asarray(ssort_i),
        edge_attr_bnd=jnp.asarray(eab), senders_bnd=jnp.asarray(sb),
        receivers_bnd=jnp.asarray(rb), edge_mask_bnd=jnp.asarray(emb),
        send_idx=jnp.asarray(send_idx),
        node_mask=jnp.asarray(nm), y=jnp.asarray(ys),
        aligned=align_interior)
    if edge_aux is not None:
        return sg, aux_int, aux_bnd
    return sg


def _exchange(values: jax.Array, send_idx_local: jax.Array,
              axis: str) -> jax.Array:
    """values [Nl, h], send_idx_local [P, H] -> halo table rows [P*H, h]."""
    send_buf = values.at[send_idx_local].get(
        mode="promise_in_bounds")  # [P, H, h]
    recv = jax.lax.all_to_all(send_buf, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    return recv.reshape(-1, values.shape[-1])


def _halo_layer(layer_params, cfg: B.MGNLayerConfig, x, e, sg, axis):
    n_local = x.shape[0]
    send_idx_local = sg.send_idx
    if cfg.do_concat_trick:
        p = layer_params["edge"]
        e_proj = e @ p["w_e"]
        s_proj = x @ p["w_s"]
        d_proj = x @ p["w_d"] + p["b"]
        from aero_gnn_tpu import ops
        table = jnp.concatenate(
            [s_proj, _exchange(s_proj, send_idx_local, axis)], axis=0)
        h0 = (e_proj
              + ops.gather_senders(table, sg.senders_combined,
                                   sg.sender_perm, sg.senders_sorted)
              + d_proj.at[sg.receivers_local].get(mode="promise_in_bounds"))
        delta_e = B.edge_block_sum_post(p, h0, cfg)
    else:
        from aero_gnn_tpu import ops
        table = jnp.concatenate(
            [x, _exchange(x, send_idx_local, axis)], axis=0)
        x_src = ops.gather_senders(table, sg.senders_combined,
                                   sg.sender_perm, sg.senders_sorted)
        x_dst = x.at[sg.receivers_local].get(mode="promise_in_bounds")
        delta_e = M.mlp_apply(
            layer_params["edge"],
            jnp.concatenate([e, x_src, x_dst], axis=-1),
            activation=cfg.activation)
    e = e + delta_e

    msgs = e * sg.edge_mask[:, None]
    agg = jax.ops.segment_sum(msgs, sg.receivers_local,
                              num_segments=n_local, indices_are_sorted=True)
    if cfg.aggregation == "mean":
        deg = jax.ops.segment_sum(sg.edge_mask, sg.receivers_local,
                                  num_segments=n_local,
                                  indices_are_sorted=True)
        agg = agg / jnp.maximum(deg, 1.0)[:, None]
    elif cfg.aggregation != "add":
        raise ValueError(f"Unsupported aggregation method: {cfg.aggregation}")
    x = x + B.node_block_post(layer_params["node"], cfg, x, agg)
    return x, e


def halo_mgn_forward(params, cfg, sg: HaloSpatialGraph, *,
                     axis: str = "graph") -> jax.Array:
    """Per-shard MGN forward with sparse halo exchange (inside shard_map)."""
    dt = getattr(cfg, "compute_dtype", "float32")
    params = cast_params(params, dt)
    if dt != "float32":
        # bf16 compute (matching MGNConfig.apply): halves per-shard HBM
        # AND the halo exchange bytes (the scaling model assumes 2 B/act)
        sg = dataclasses.replace(
            sg, x=_cast(sg.x, dt), edge_attr=_cast(sg.edge_attr, dt),
            edge_mask=_cast(sg.edge_mask, dt))
    x = M.mlp_apply(params["node_encoder"], sg.x, activation=cfg.activation)
    e = M.mlp_apply(params["edge_encoder"], sg.edge_attr,
                    activation=cfg.activation)
    layer_cfg = cfg.layer_cfg

    def body(carry, layer_params):
        x, e = carry
        x, e = _halo_layer(layer_params, layer_cfg, x, e, sg, axis)
        return (x, e), None

    x, e = checkpointed_layer_stack(
        body, (x, e), params["layers"],
        remat=getattr(cfg, "remat", True),
        remat_policy=getattr(cfg, "remat_policy", "save_fused"),
        unroll=getattr(cfg, "unroll", False),
        remat_group=getattr(cfg, "remat_group", 0),
        remat_group_policy=getattr(cfg, "remat_group_policy", "full"))
    return M.mlp_apply(params["decoder"], x,
                       activation=cfg.activation).astype(jnp.float32)


def _fused_interior_ok(cfg: B.MGNLayerConfig, x, sg: HaloSplitGraph) -> bool:
    """Gate for running the per-shard interior compute on the fused Pallas
    kernels (mirrors nn.blocks._fused_layer_ok): requires the partitioner's
    align_interior layout — divisible shapes alone are unsafe."""
    from aero_gnn_tpu import ops as _ops
    from aero_gnn_tpu.ops import pallas_segment as PS

    return (sg.aligned and _ops.backend() == "pallas"
            and cfg.do_concat_trick
            and cfg.edge_sum_activation == "relu"
            and x.shape[0] % PS.NB == 0
            and sg.receivers_int.shape[-1] % PS.ET == 0)


def _halo_split_layer(layer_params, cfg: B.MGNLayerConfig, x, e_int, e_bnd,
                      sg: HaloSplitGraph, axis):
    """One MGN layer with the halo all_to_all overlapped with interior
    compute: the exchange is issued FIRST and only the (small) boundary
    edge chain depends on it — everything between the collective-start and
    the boundary gather is schedulable under the collective. With the
    align_interior layout the interior edge chain + aggregation runs on the
    fused Pallas edge kernel (single-chip speed per shard)."""
    n_local = x.shape[0]
    if _fused_interior_ok(cfg, x, sg):
        from aero_gnn_tpu import ops
        from aero_gnn_tpu.ops.pallas_fused import fused_edge_layer

        p = layer_params["edge"]
        s_proj = x @ p["w_s"]
        halo = _exchange(s_proj, sg.send_idx, axis)  # issued early
        d_proj = x @ p["w_d"] + p["b"]
        # sorted-transpose gather: backward is a sorted segment sum
        sg_rows = ops.gather_senders(s_proj, sg.senders_int,
                                     sg.sender_perm_int,
                                     sg.senders_int_sorted)
        h = s_proj.shape[1]
        ws = (jnp.stack([s["w"] for s in p["stack"][:-1]])
              if len(p["stack"]) > 1
              else jnp.zeros((0, h, h), s_proj.dtype))
        bs = (jnp.stack([s["b"] for s in p["stack"][:-1]])
              if len(p["stack"]) > 1
              else jnp.zeros((0, h), s_proj.dtype))
        e_int, agg = fused_edge_layer(
            e_int, sg_rows, d_proj, sg.edge_mask_int, sg.receivers_int,
            p["w_e"], ws, bs, p["stack"][-1]["w"], p["stack"][-1]["b"],
            p["ln"]["scale"], p["ln"]["bias"], n_local,
            cfg.edge_sum_activation)
        # boundary chain (O(surface), XLA) — consumes the halo table
        h0_b = (e_bnd @ p["w_e"]
                + halo.at[sg.senders_bnd].get(mode="promise_in_bounds")
                + d_proj.at[sg.receivers_bnd].get(mode="promise_in_bounds"))
        e_bnd = e_bnd + B.edge_block_sum_post(p, h0_b, cfg)
        agg = agg + jax.ops.segment_sum(
            e_bnd * sg.edge_mask_bnd[:, None], sg.receivers_bnd,
            num_segments=n_local, indices_are_sorted=True)
        if cfg.aggregation == "mean":
            deg = (jax.ops.segment_sum(sg.edge_mask_int, sg.receivers_int,
                                       num_segments=n_local,
                                       indices_are_sorted=True)
                   + jax.ops.segment_sum(sg.edge_mask_bnd, sg.receivers_bnd,
                                         num_segments=n_local,
                                         indices_are_sorted=True))
            agg = agg / jnp.maximum(deg, 1.0)[:, None]
        elif cfg.aggregation != "add":
            raise ValueError(
                f"Unsupported aggregation method: {cfg.aggregation}")
        # fused node kernel when legal (x + LN(MLP([x, agg])))
        x = B.node_block_post_residual(layer_params["node"], cfg, x, agg)
        return x, e_int, e_bnd
    if cfg.do_concat_trick:
        from aero_gnn_tpu import ops

        p = layer_params["edge"]
        s_proj = x @ p["w_s"]
        halo = _exchange(s_proj, sg.send_idx, axis)  # [P*H, h], issued early
        d_proj = x @ p["w_d"] + p["b"]
        # interior chain — independent of the exchange; sender gather via
        # the sorted-transpose custom VJP
        h0_i = (e_int @ p["w_e"]
                + ops.gather_senders(s_proj, sg.senders_int,
                                     sg.sender_perm_int,
                                     sg.senders_int_sorted)
                + d_proj.at[sg.receivers_int].get(mode="promise_in_bounds"))
        de_i = B.edge_block_sum_post(p, h0_i, cfg)
        # boundary chain — consumes the halo table
        h0_b = (e_bnd @ p["w_e"]
                + halo.at[sg.senders_bnd].get(mode="promise_in_bounds")
                + d_proj.at[sg.receivers_bnd].get(mode="promise_in_bounds"))
        de_b = B.edge_block_sum_post(p, h0_b, cfg)
    else:
        from aero_gnn_tpu import ops as _ops
        halo = _exchange(x, sg.send_idx, axis)
        xs_i = _ops.gather_senders(x, sg.senders_int, sg.sender_perm_int,
                                   sg.senders_int_sorted)
        xd_i = x.at[sg.receivers_int].get(mode="promise_in_bounds")
        de_i = M.mlp_apply(
            layer_params["edge"],
            jnp.concatenate([e_int, xs_i, xd_i], axis=-1),
            activation=cfg.activation)
        xs_b = halo.at[sg.senders_bnd].get(mode="promise_in_bounds")
        xd_b = x.at[sg.receivers_bnd].get(mode="promise_in_bounds")
        de_b = M.mlp_apply(
            layer_params["edge"],
            jnp.concatenate([e_bnd, xs_b, xd_b], axis=-1),
            activation=cfg.activation)
    e_int = e_int + de_i
    e_bnd = e_bnd + de_b

    agg = (jax.ops.segment_sum(e_int * sg.edge_mask_int[:, None],
                               sg.receivers_int, num_segments=n_local,
                               indices_are_sorted=True)
           + jax.ops.segment_sum(e_bnd * sg.edge_mask_bnd[:, None],
                                 sg.receivers_bnd, num_segments=n_local,
                                 indices_are_sorted=True))
    if cfg.aggregation == "mean":
        deg = (jax.ops.segment_sum(sg.edge_mask_int, sg.receivers_int,
                                   num_segments=n_local,
                                   indices_are_sorted=True)
               + jax.ops.segment_sum(sg.edge_mask_bnd, sg.receivers_bnd,
                                     num_segments=n_local,
                                     indices_are_sorted=True))
        agg = agg / jnp.maximum(deg, 1.0)[:, None]
    elif cfg.aggregation != "add":
        raise ValueError(f"Unsupported aggregation method: {cfg.aggregation}")
    x = x + B.node_block_post(layer_params["node"], cfg, x, agg)
    return x, e_int, e_bnd


def cast_split_graph(sg: HaloSplitGraph, dt: str) -> HaloSplitGraph:
    """Cast the compute-path float streams to the compute dtype (masks
    too — an f32 mask would silently promote every [E, h] product back
    to f32). y / node_mask stay f32 for the loss."""
    if dt == "float32":
        return sg
    return dataclasses.replace(
        sg, x=_cast(sg.x, dt),
        edge_attr_int=_cast(sg.edge_attr_int, dt),
        edge_attr_bnd=_cast(sg.edge_attr_bnd, dt),
        edge_mask_int=_cast(sg.edge_mask_int, dt),
        edge_mask_bnd=_cast(sg.edge_mask_bnd, dt))


def halo_split_mgn_forward(params, cfg, sg: HaloSplitGraph, *,
                           axis: str = "graph") -> jax.Array:
    """Per-shard MGN forward with the overlapped (split-stream) halo."""
    dt = getattr(cfg, "compute_dtype", "float32")
    params = cast_params(params, dt)
    sg = cast_split_graph(sg, dt)
    x = M.mlp_apply(params["node_encoder"], sg.x, activation=cfg.activation)
    e_int = M.mlp_apply(params["edge_encoder"], sg.edge_attr_int,
                        activation=cfg.activation)
    e_bnd = M.mlp_apply(params["edge_encoder"], sg.edge_attr_bnd,
                        activation=cfg.activation)
    layer_cfg = cfg.layer_cfg

    def body(carry, layer_params):
        x, e_int, e_bnd = carry
        x, e_int, e_bnd = _halo_split_layer(
            layer_params, layer_cfg, x, e_int, e_bnd, sg, axis)
        return (x, e_int, e_bnd), None

    x, _, _ = checkpointed_layer_stack(
        body, (x, e_int, e_bnd), params["layers"],
        remat=getattr(cfg, "remat", True),
        remat_policy=getattr(cfg, "remat_policy", "save_fused"),
        unroll=getattr(cfg, "unroll", False),
        remat_group=getattr(cfg, "remat_group", 0),
        remat_group_policy=getattr(cfg, "remat_group_policy", "full"))
    return M.mlp_apply(params["decoder"], x,
                       activation=cfg.activation).astype(jnp.float32)


def make_halo_split_forward(model_cfg, mesh: Mesh, *, axis: str = "graph"):
    def per_shard(params, sg):
        sg = jax.tree.map(lambda a: a[0], sg)
        return halo_split_mgn_forward(params, model_cfg, sg, axis=axis)[None]

    fwd = shard_map(per_shard, mesh=mesh,
                    in_specs=(P(), P(axis)), out_specs=P(axis),
                    check_vma=False)
    return jax.jit(fwd, compiler_options=async_jit_options(mesh))


def make_halo_split_train_step(model_cfg, optimizer, mesh: Mesh,
                               *, axis: str = "graph"):
    import optax

    def per_shard(params, opt_state, sg):
        sg_l = jax.tree.map(lambda a: a[0], sg)

        def loss_fn(p):
            pred = halo_split_mgn_forward(p, model_cfg, sg_l, axis=axis)
            m = sg_l.node_mask[:, None]
            # LOCAL numerator / global count: a psum'd numerator would
            # inflate the grad seed P x (see parallel.spatial
            # make_spatial_train_step)
            se = jnp.sum(jnp.square(pred - sg_l.y) * m)
            cnt = jax.lax.psum(jnp.sum(m) * sg_l.y.shape[-1], axis)
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = shard_map(per_shard, mesh=mesh,
                     in_specs=(P(), P(), P(axis)),
                     out_specs=(P(), P(), P()),
                     check_vma=False)
    return jax.jit(step, donate_argnums=(0, 1),
                   compiler_options=async_jit_options(mesh))


def make_halo_forward(model_cfg, mesh: Mesh, *, axis: str = "graph"):
    def per_shard(params, sg):
        sg = jax.tree.map(lambda a: a[0], sg)
        return halo_mgn_forward(params, model_cfg, sg, axis=axis)[None]

    fwd = shard_map(per_shard, mesh=mesh,
                    in_specs=(P(), P(axis)), out_specs=P(axis),
                    check_vma=False)
    return jax.jit(fwd, compiler_options=async_jit_options(mesh))


def make_halo_train_step(model_cfg, optimizer, mesh: Mesh,
                         *, axis: str = "graph"):
    import optax

    def per_shard(params, opt_state, sg):
        sg_l = jax.tree.map(lambda a: a[0], sg)

        def loss_fn(p):
            pred = halo_mgn_forward(p, model_cfg, sg_l, axis=axis)
            m = sg_l.node_mask[:, None]
            # LOCAL numerator / global count (see make_halo_split_train_step)
            se = jnp.sum(jnp.square(pred - sg_l.y) * m)
            cnt = jax.lax.psum(jnp.sum(m) * sg_l.y.shape[-1], axis)
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = shard_map(per_shard, mesh=mesh,
                     in_specs=(P(), P(), P(axis)),
                     out_specs=(P(), P(), P()),
                     check_vma=False)
    return jax.jit(step, donate_argnums=(0, 1),
                   compiler_options=async_jit_options(mesh))
