"""Multi-scale graph hierarchies, precomputed on host as static-shape data.

The reference's BSMS model re-derives its coarsening *inside every forward
pass* with a per-graph Python loop, argsort and torch.unique
(/root/reference/models/bsms_mgn.py:217-301) — dynamic shapes that cannot
exist under jit. Here the hierarchy is computed ONCE per mesh at data-load
time and padded to bucketed sizes, so the jitted forward is nothing but
segment reductions and gathers over precomputed index arrays.

Two builder modes:
  * "stride"   — numerical parity with the in-tree reference: per graph,
    sort nodes by x-coordinate, group each consecutive ``stride`` nodes into
    one coarse node, coarse node/pos features = scatter_mean, coarse edges =
    dedup of (c_row, c_col) keys with scatter_mean of edge features
    (bsms_mgn.py:242-288, including retained self-loops).
  * "bistride" — the canonical BSMS-GNN pooling the reference author worked
    from (bi-stride BFS 2-coloring; see BSMS-GNN, Cao et al. 2023): BFS from
    a min-degree seed, keep nodes on even BFS frontiers, coarse connectivity
    = 2-hop adjacency restricted to kept nodes. Better preserves mesh
    topology than coordinate sorting and needs no pos at all.

Both produce the same static artifact (``HierarchyLevel``), so models are
agnostic to the builder.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aero_gnn_tpu.graph.padded import bucket_size, sort_edges_by_receiver


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HierarchyLevel:
    """Transition fine level s -> coarse level s+1 plus the coarse graph.

    Shapes: Nf/Ef = padded fine node/edge counts, Nc/Ec = padded coarse
    counts. Pad entries route to the last pad slot of their target so masked
    segment ops stay exact.
    """

    # fine -> coarse transition
    fine_to_coarse: jax.Array  # i32[Nf] coarse node id per fine node
    edge_to_coarse: jax.Array  # i32[Ef] coarse edge id per fine edge

    # coarse graph connectivity (receiver-sorted, like GraphBatch)
    senders: jax.Array  # i32[Ec]
    receivers: jax.Array  # i32[Ec]
    # sender-sorted view for sorted-transpose backward gathers
    sender_perm: jax.Array  # i32[Ec]
    senders_sorted: jax.Array  # i32[Ec]

    # coarse masks / bookkeeping
    node_mask: jax.Array  # f32[Nc]
    edge_mask: jax.Array  # f32[Ec]
    node_graph: jax.Array  # i32[Nc]
    n_node: jax.Array  # i32[]
    n_edge: jax.Array  # i32[]

    # geometric aggregation weights for the fine->coarse transfer
    # (WeightedEdgeConv, canonical BSMS-GNN; see weighted_transfer notes in
    # models/bsms.py). node_weights = per-fine-node mass (half total incident
    # edge length); edge_weights = fine edge length (weights the coarse
    # edge-feature mean). Uniform (1.0) when positions are unavailable.
    node_weights: jax.Array  # f32[Nf] geometric mass of each fine node
    edge_weights: jax.Array  # f32[Ef] geometric weight of each fine edge

    # Pallas aggregation layout for the COARSE edge stream (present when the
    # hierarchy was aligned via align_hierarchy; same contract as
    # GraphBatch.tile_block/tile_first)
    tile_block: Optional[jax.Array] = None  # i32[T]
    tile_first: Optional[jax.Array] = None  # i32[T]

    # WeightedEdgeConv transfer operator (transfer="weighted"): one
    # mass-normalized aggregation over the FINE edge stream followed by
    # representative selection. For fine node i with mass w_i and in-
    # neighbors j:  x~_i = (w_i x_i + sum_j w_j x_j) / (w_i + sum_j w_j),
    # i.e. conv_self[i] = w_i/denom_i and conv_edge[e] =
    # w_send(e)/denom_recv(e); rows sum to 1, so constant fields are
    # preserved exactly. rep_mask marks the ONE fine node that becomes each
    # coarse node (bistride: the kept node; stride: the min-x member), so
    # the down transfer is select(rep) after the conv and the up transfer is
    # the exact adjoint (place-at-rep then transposed conv). All three are
    # fine-row artifacts (node rows / edge rows), zero on pads.
    rep_mask: Optional[jax.Array] = None   # f32[Nf] 1.0 at coarse reps
    conv_self: Optional[jax.Array] = None  # f32[Nf]
    conv_edge: Optional[jax.Array] = None  # f32[Ef]
    # conv_edge permuted by the REVERSE-edge map (conv_edge_t[e] =
    # conv_edge[rev(e)], rev = the row of the opposite-direction edge).
    # On the undirected mesh streams the TRANSPOSED conv equals the
    # forward conv with these weights, so WeightedEdgeConv's adjoint runs
    # on the same receiver-sorted fast path as the conv itself — no
    # sender-sorted [E] reorders at run time (models/bsms.py _wec_At_raw;
    # XLA's kCustom 1-D gathers measured ~40M rows/s). None when the
    # stream is not symmetric (models fall back to the sorted-perm route).
    conv_edge_t: Optional[jax.Array] = None  # f32[Ef]

    # Sorted-pooling permutations: fine rows ordered by their coarse target
    # (host-precomputed stable argsort of fine_to_coarse / edge_to_coarse).
    # XLA lowers an UNSORTED scatter-add to a serial path on TPU (~70x
    # slower than a sorted segment reduction — see ops/scatter.py); with
    # these, every fine->coarse pooling transfer becomes gather-by-perm +
    # SORTED segment sum, and the unpool gather gets a sorted-transpose
    # backward (ops.segment_pool_sum / ops.gather_senders).
    node_pool_perm: Optional[jax.Array] = None    # i32[Nf]
    node_pool_sorted: Optional[jax.Array] = None  # i32[Nf]
    edge_pool_perm: Optional[jax.Array] = None    # i32[Ef]
    edge_pool_sorted: Optional[jax.Array] = None  # i32[Ef]

    @property
    def edges_aligned(self) -> bool:
        """True iff the coarse streams carry the block-aligned layout the
        Pallas kernels require. Gates Pallas dispatch on coarse levels."""
        return self.tile_block is not None

    @property
    def num_coarse_nodes_pad(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_coarse_edges_pad(self) -> int:
        return self.edge_mask.shape[0]


# ---------------------------------------------------------------------------
# host-side builders (numpy)
# ---------------------------------------------------------------------------

def with_pool_perms(level: HierarchyLevel) -> HierarchyLevel:
    """Attach the sorted-pooling permutations (stable argsort of the final
    fine_to_coarse / edge_to_coarse). Derived purely from the level's own
    fields, so every construction/transformation path just calls this
    last; stable sort keeps within-segment fine order, so pooled sums are
    numerically identical to the unsorted-scatter order up to the usual
    scatter reassociation."""
    f2c = np.asarray(level.fine_to_coarse)
    e2c = np.asarray(level.edge_to_coarse)
    npp = np.argsort(f2c, kind="stable").astype(np.int32)
    epp = np.argsort(e2c, kind="stable").astype(np.int32)
    return dataclasses.replace(
        level,
        node_pool_perm=jnp.asarray(npp),
        node_pool_sorted=jnp.asarray(f2c[npp].astype(np.int32)),
        edge_pool_perm=jnp.asarray(epp),
        edge_pool_sorted=jnp.asarray(e2c[epp].astype(np.int32)),
    )


def _geometric_weights(senders: np.ndarray, receivers: np.ndarray,
                       pos: Optional[np.ndarray], num_nodes: int) -> tuple:
    """Geometric transfer weights: node mass = half the total incident edge
    length (the 1D surface-mesh lumped 'area' — same quantity the reference's
    2D coefficient integration assigns to nodes, /root/reference/utils.py:
    516-521); edge weight = edge length. Uniform when positions are absent.
    Returns (node_w[num_nodes], edge_w[num_edges]) as float64."""
    if pos is not None and len(senders):
        el = np.linalg.norm(
            pos[senders].astype(np.float64) - pos[receivers], axis=1)
        el = np.maximum(el, 1e-12)
        nw = np.zeros(num_nodes, dtype=np.float64)
        np.add.at(nw, receivers, el / 2.0)
        nw = np.maximum(nw, 1e-12)
    else:
        el = np.ones(len(senders), dtype=np.float64)
        nw = np.ones(num_nodes, dtype=np.float64)
    return nw, el


def _conv_weights(senders: np.ndarray, receivers: np.ndarray,
                  node_w: np.ndarray, num_nodes: int) -> tuple:
    """Receiver-normalized WeightedEdgeConv weights (see HierarchyLevel
    docstring): conv_self[i] = w_i/denom_i, conv_edge[e] =
    w_send(e)/denom_recv(e), denom_i = w_i + sum of sender masses into i.
    Row sums are exactly 1 -> the conv preserves constant fields."""
    denom = node_w.astype(np.float64).copy()
    np.add.at(denom, receivers, node_w[senders])
    denom = np.maximum(denom, 1e-12)
    conv_self = node_w / denom
    conv_edge = node_w[senders] / denom[receivers]
    return conv_self, conv_edge


def _reverse_edge_map(senders: np.ndarray,
                      receivers: np.ndarray) -> np.ndarray:
    """rev[i] = row of the opposite edge (receivers[i] -> senders[i]), or
    -1 where no reverse exists. Self-loops map to themselves. Assumes at
    most one edge per (s, r) pair (mesh streams are deduplicated)."""
    if not len(senders):
        return np.zeros(0, np.int64)
    s = np.asarray(senders, np.int64)
    r = np.asarray(receivers, np.int64)
    n = int(max(s.max(), r.max())) + 1
    key_fwd = s * n + r
    order = np.argsort(key_fwd, kind="stable")
    key_rev = r * n + s
    pos = np.searchsorted(key_fwd[order], key_rev)
    cand = order[np.clip(pos, 0, len(order) - 1)]
    return np.where(key_fwd[cand] == key_rev, cand, -1)


def _conv_edge_transposed(conv_edge: np.ndarray, senders: np.ndarray,
                          receivers: np.ndarray) -> Optional[np.ndarray]:
    """conv_edge[rev(e)] (see HierarchyLevel.conv_edge_t); None when the
    stream is not symmetric."""
    rev = _reverse_edge_map(senders, receivers)
    if len(rev) and (rev < 0).any():
        return None
    return np.asarray(conv_edge)[rev] if len(rev) else np.zeros(0)


def _rep_mask_first(fine_to_coarse: np.ndarray, num_nodes: int) -> np.ndarray:
    """1.0 at the first (stable-order) fine node of each coarse segment."""
    mask = np.zeros(num_nodes, dtype=np.float64)
    if num_nodes:
        order = np.argsort(fine_to_coarse[:num_nodes], kind="stable")
        sorted_ids = fine_to_coarse[order]
        first = np.ones(num_nodes, dtype=bool)
        first[1:] = sorted_ids[1:] != sorted_ids[:-1]
        mask[order[first]] = 1.0
    return mask


def _assign_stride(pos: np.ndarray, node_graph: np.ndarray,
                   stride: int) -> tuple:
    """Reference-parity assignment: per graph, rank nodes by x then group by
    ``rank // stride`` (bsms_mgn.py:240-252). Returns (fine_to_coarse,
    coarse_node_graph, rep_mask) — rep = the min-x member of each group."""
    n = pos.shape[0]
    fine_to_coarse = np.empty(n, dtype=np.int64)
    rep_mask = np.zeros(n, dtype=np.float64)
    coarse_graph_ids: List[np.ndarray] = []
    offset = 0
    for gid in np.unique(node_graph):
        idx = np.nonzero(node_graph == gid)[0]
        order = np.argsort(pos[idx, 0], kind="stable")
        ranks = np.empty(len(idx), dtype=np.int64)
        ranks[order] = np.arange(len(idx))
        local = ranks // stride
        n_coarse = int(local.max()) + 1 if len(idx) else 0
        fine_to_coarse[idx] = local + offset
        rep_mask[idx[ranks % stride == 0]] = 1.0
        coarse_graph_ids.append(np.full(n_coarse, gid, dtype=np.int64))
        offset += n_coarse
    coarse_node_graph = (np.concatenate(coarse_graph_ids)
                         if coarse_graph_ids else np.zeros(0, np.int64))
    return fine_to_coarse, coarse_node_graph, rep_mask


def _csr_expand(front: np.ndarray, indptr: np.ndarray, deg: np.ndarray,
                r_sorted: np.ndarray) -> tuple:
    """Concatenate the CSR adjacency rows of ``front`` without a Python
    loop. Returns (neighbors, owner) where owner[k] is the index into
    ``front`` whose row produced neighbors[k]."""
    cnt = deg[front]
    total = int(cnt.sum())
    if total == 0:
        return (np.empty(0, dtype=r_sorted.dtype),
                np.empty(0, dtype=np.int64))
    excl = np.cumsum(cnt) - cnt  # exclusive prefix per frontier row
    base = np.repeat(indptr[front] - excl, cnt)
    nbrs = r_sorted[base + np.arange(total)]
    owner = np.repeat(np.arange(len(front), dtype=np.int64), cnt)
    return nbrs, owner


def _assign_bistride(senders: np.ndarray, receivers: np.ndarray,
                     node_graph: np.ndarray, num_nodes: int) -> tuple:
    """Bi-stride assignment: BFS 2-coloring per graph; kept (even-frontier)
    nodes become coarse nodes; dropped nodes attach to an adjacent kept node.
    Returns (fine_to_coarse, coarse_node_graph, rep_mask) — rep = the kept
    node itself (each coarse node IS a fine node, the WeightedEdgeConv
    selection point).

    Deterministic: seeds at the min-degree lowest-index node; a node's color
    is the parity of its BFS distance from its component's seed. Fully
    vectorized frontier BFS (O(diameter) numpy steps, no per-node Python) —
    the per-node-loop version took minutes at 10^6-node meshes; kept
    equivalent by tests/test_models.py's matrix-power distance oracle.
    """
    # CSR adjacency
    order = np.argsort(senders, kind="stable")
    s_sorted, r_sorted = senders[order], receivers[order]
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.add.at(indptr, s_sorted + 1, 1)
    indptr = np.cumsum(indptr)
    deg = np.diff(indptr)

    color = np.full(num_nodes, -1, dtype=np.int64)  # 0 = kept, 1 = dropped
    for gid in np.unique(node_graph):
        nodes = np.nonzero(node_graph == gid)[0]
        remaining = nodes
        while len(remaining):
            # min-degree, lowest-index seed in this component
            dmin = deg[remaining].min()
            seed = int(remaining[deg[remaining] == dmin].min())
            color[seed] = 0
            frontier = np.array([seed], dtype=np.int64)
            parity = 0
            while len(frontier):
                nbrs, _ = _csr_expand(frontier, indptr, deg, r_sorted)
                nbrs = nbrs[color[nbrs] == -1]
                if not len(nbrs):
                    break
                frontier = np.unique(nbrs)
                parity ^= 1
                color[frontier] = parity
            remaining = remaining[color[remaining] == -1]
    kept = np.nonzero(color == 0)[0]
    # coarse ids ordered by (graph, node index) to keep node_graph sorted
    coarse_id_of = np.full(num_nodes, -1, dtype=np.int64)
    kept_sorted = kept[np.lexsort((kept, node_graph[kept]))]
    coarse_id_of[kept_sorted] = np.arange(len(kept_sorted))
    coarse_node_graph = node_graph[kept_sorted].astype(np.int64)

    fine_to_coarse = np.full(num_nodes, -1, dtype=np.int64)
    fine_to_coarse[kept] = coarse_id_of[kept]
    # attach each dropped node to its minimum-index kept neighbor —
    # vectorized as a per-row CSR min-reduction (the per-dropped-node
    # Python loop was the other 10^6-scale hot spot)
    dropped = np.nonzero(color != 0)[0]
    if len(dropped):
        nbrs, owner = _csr_expand(dropped, indptr, deg, r_sorted)
        val = np.where(color[nbrs] == 0, nbrs, num_nodes)
        best = np.full(len(dropped), num_nodes, dtype=np.int64)
        cnt = deg[dropped]
        nz = cnt > 0
        if len(val):
            # contiguous segments: reduceat over the non-empty rows' starts
            starts = (np.cumsum(cnt) - cnt)[nz]
            best[nz] = np.minimum.reduceat(val, starts)
        has = best < num_nodes
        fine_to_coarse[dropped[has]] = coarse_id_of[best[has]]
        # degenerate (isolated dropped nodes, shouldn't exist on connected
        # meshes): attach to the first coarse node of the SAME graph —
        # coarse_node_graph is sorted, so searchsorted finds that graph's
        # first coarse id. Falling back to global node 0 would silently
        # leak features across graphs in a batch.
        iso = dropped[~has]
        if len(iso):
            g = node_graph[iso]
            first_in_graph = np.searchsorted(coarse_node_graph, g)
            bad = (first_in_graph >= len(coarse_node_graph))
            ok_idx = np.where(bad, 0, first_in_graph)
            bad |= coarse_node_graph[ok_idx] != g
            if bad.any():
                raise ValueError(
                    f"bistride pooling: graph {g[bad][0]} kept no "
                    "coarse nodes")
            fine_to_coarse[iso] = first_in_graph
    rep_mask = np.zeros(num_nodes, dtype=np.float64)
    rep_mask[kept] = 1.0
    return fine_to_coarse, coarse_node_graph, rep_mask


def _coarse_edges(senders: np.ndarray, receivers: np.ndarray,
                  fine_to_coarse: np.ndarray, num_coarse: int) -> tuple:
    """Dedup (c_row, c_col) pairs — torch.unique parity (bsms_mgn.py:276-288):
    coarse edges sorted by integer key (row-major), self-loops retained.
    Returns (c_senders, c_receivers, edge_to_coarse_edge)."""
    c_row = fine_to_coarse[senders]
    c_col = fine_to_coarse[receivers]
    keys = c_row * max(num_coarse, 1) + c_col
    unique_keys, inverse = np.unique(keys, return_inverse=True)
    c_senders = (unique_keys // max(num_coarse, 1)).astype(np.int64)
    c_receivers = (unique_keys % max(num_coarse, 1)).astype(np.int64)
    return c_senders, c_receivers, inverse


def build_hierarchy_level(
    *,
    senders: np.ndarray,
    receivers: np.ndarray,
    node_graph: np.ndarray,
    num_nodes: int,
    pos: Optional[np.ndarray] = None,
    mode: str = "stride",
    stride: int = 2,
    num_coarse_nodes_pad: Optional[int] = None,
    num_coarse_edges_pad: Optional[int] = None,
    num_fine_nodes_pad: Optional[int] = None,
    num_fine_edges_pad: Optional[int] = None,
    dtype=np.float32,
) -> tuple:
    """Build one coarsening level from REAL (unpadded) fine arrays.

    Returns (HierarchyLevel, coarse_real) where coarse_real is a dict of the
    unpadded coarse arrays {senders, receivers, node_graph, num_nodes, pos}
    for building the next level.
    """
    geo_pos = pos  # geometric weights only from REAL positions
    if mode == "stride":
        if pos is None:
            # reference behavior without pos: keep original order
            # (bsms_mgn.py:244-245)
            pos = np.arange(num_nodes, dtype=np.float64)[:, None]
        f2c, c_node_graph, rep = _assign_stride(pos, node_graph, stride)
    elif mode == "bistride":
        f2c, c_node_graph, rep = _assign_bistride(
            senders, receivers, node_graph, num_nodes)
    else:
        raise ValueError(f"Unknown hierarchy mode: {mode}")

    num_coarse = len(c_node_graph)
    c_s, c_r, edge_to_ce = _coarse_edges(senders, receivers, f2c, num_coarse)
    e_coarse = len(c_s)

    # receiver-major resort of coarse edges (GraphBatch convention); the
    # scatter_mean that builds coarse edge features is permutation-invariant.
    perm = sort_edges_by_receiver(c_s, c_r)
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(len(perm))
    c_s, c_r = c_s[perm], c_r[perm]
    edge_to_ce = inv_perm[edge_to_ce]

    # coarse pos for the next level's stride sort
    c_pos = None
    if pos is not None and num_coarse > 0:
        c_pos = np.zeros((num_coarse, pos.shape[1]), dtype=np.float64)
        cnt = np.zeros(num_coarse, dtype=np.float64)
        np.add.at(c_pos, f2c, pos.astype(np.float64))
        np.add.at(cnt, f2c, 1.0)
        c_pos /= np.maximum(cnt, 1.0)[:, None]

    # ---- pad to static sizes ----
    nf_pad = num_fine_nodes_pad or bucket_size(num_nodes + 1)
    ef_pad = num_fine_edges_pad or bucket_size(len(senders))
    nc_pad = num_coarse_nodes_pad or bucket_size(num_coarse + 1)
    ec_pad = num_coarse_edges_pad or bucket_size(e_coarse)

    f2c_p = np.full(nf_pad, nc_pad - 1, dtype=np.int32)
    f2c_p[:num_nodes] = f2c
    e2c_p = np.full(ef_pad, ec_pad - 1, dtype=np.int32)
    e2c_p[: len(edge_to_ce)] = edge_to_ce
    cs_p = np.full(ec_pad, nc_pad - 1, dtype=np.int32)
    cr_p = np.full(ec_pad, nc_pad - 1, dtype=np.int32)
    cs_p[:e_coarse] = c_s
    cr_p[:e_coarse] = c_r
    nm = np.zeros(nc_pad, dtype=dtype)
    nm[:num_coarse] = 1.0
    em = np.zeros(ec_pad, dtype=dtype)
    em[:e_coarse] = 1.0
    ng_p = np.full(nc_pad, 0, dtype=np.int32)
    ng_p[:num_coarse] = c_node_graph

    # geometric weights + WeightedEdgeConv operator (transfer="weighted";
    # the "mean" transfer ignores all of these — stride parity untouched)
    nw_r, ew_r = _geometric_weights(senders, receivers, geo_pos, num_nodes)
    cself_r, cedge_r = _conv_weights(senders, receivers, nw_r, num_nodes)
    nw = np.zeros(nf_pad, dtype=dtype)
    nw[:num_nodes] = nw_r
    ew = np.zeros(ef_pad, dtype=dtype)
    ew[: len(ew_r)] = ew_r
    rep_p = np.zeros(nf_pad, dtype=dtype)
    rep_p[:num_nodes] = rep
    cself_p = np.zeros(nf_pad, dtype=dtype)
    cself_p[:num_nodes] = cself_r
    cedge_p = np.zeros(ef_pad, dtype=dtype)
    cedge_p[: len(cedge_r)] = cedge_r
    cedge_t_r = _conv_edge_transposed(cedge_r, senders, receivers)
    cedge_t_p = None
    if cedge_t_r is not None:
        cedge_t_p = np.zeros(ef_pad, dtype=dtype)
        cedge_t_p[: len(cedge_t_r)] = cedge_t_r

    sperm = np.argsort(cs_p, kind="stable").astype(np.int32)
    level = HierarchyLevel(
        fine_to_coarse=jnp.asarray(f2c_p),
        edge_to_coarse=jnp.asarray(e2c_p),
        senders=jnp.asarray(cs_p),
        receivers=jnp.asarray(cr_p),
        sender_perm=jnp.asarray(sperm),
        senders_sorted=jnp.asarray(cs_p[sperm]),
        node_mask=jnp.asarray(nm),
        edge_mask=jnp.asarray(em),
        node_graph=jnp.asarray(ng_p),
        n_node=jnp.asarray(num_coarse, dtype=jnp.int32),
        n_edge=jnp.asarray(e_coarse, dtype=jnp.int32),
        node_weights=jnp.asarray(nw),
        edge_weights=jnp.asarray(ew),
        rep_mask=jnp.asarray(rep_p),
        conv_self=jnp.asarray(cself_p),
        conv_edge=jnp.asarray(cedge_p),
        conv_edge_t=(None if cedge_t_p is None
                     else jnp.asarray(cedge_t_p)),
    )
    coarse_real = {
        "senders": c_s,
        "receivers": c_r,
        "node_graph": c_node_graph,
        "num_nodes": num_coarse,
        "pos": c_pos,
    }
    return with_pool_perms(level), coarse_real


def build_hierarchy_real(
    *,
    senders: np.ndarray,
    receivers: np.ndarray,
    node_graph: np.ndarray,
    num_nodes: int,
    pos: Optional[np.ndarray] = None,
    num_scales: int,
    mode: str = "stride",
    stride: int = 2,
) -> List[dict]:
    """Unpadded per-level hierarchy arrays (for caching + batch collation).

    Each level dict: {fine_to_coarse, edge_to_coarse, senders, receivers,
    node_graph, num_nodes, num_edges, num_fine_nodes, num_fine_edges, pos}.
    Coarse edges are receiver-sorted.
    """
    levels: List[dict] = []
    # Fine edges must be in the SAME order as GraphBatch rows (receiver-
    # sorted) so edge_to_coarse indexes the model's edge tensor correctly.
    perm0 = sort_edges_by_receiver(np.asarray(senders),
                                   np.asarray(receivers))
    cur_s = np.asarray(senders, dtype=np.int64)[perm0]
    cur_r = np.asarray(receivers, dtype=np.int64)[perm0]
    cur_ng = np.asarray(node_graph, dtype=np.int64)
    cur_n = num_nodes
    cur_pos = None if pos is None else np.asarray(pos, dtype=np.float64)
    for _ in range(num_scales - 1):
        if mode == "stride":
            p = cur_pos
            if p is None:
                p = np.arange(cur_n, dtype=np.float64)[:, None]
            f2c, c_ng, rep = _assign_stride(p, cur_ng, stride)
        elif mode == "bistride":
            f2c, c_ng, rep = _assign_bistride(cur_s, cur_r, cur_ng, cur_n)
        else:
            raise ValueError(f"Unknown hierarchy mode: {mode}")
        n_coarse = len(c_ng)
        c_s, c_r, e2c = _coarse_edges(cur_s, cur_r, f2c, n_coarse)
        perm = sort_edges_by_receiver(c_s, c_r)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        c_s, c_r, e2c = c_s[perm], c_r[perm], inv[e2c]
        c_pos = None
        if cur_pos is not None and n_coarse > 0:
            c_pos = np.zeros((n_coarse, cur_pos.shape[1]))
            cnt = np.zeros(n_coarse)
            np.add.at(c_pos, f2c, cur_pos)
            np.add.at(cnt, f2c, 1.0)
            c_pos /= np.maximum(cnt, 1.0)[:, None]
        # geometric weights + WeightedEdgeConv operator on the FINE graph of
        # this level (same math as build_hierarchy_level)
        nw, ew = _geometric_weights(cur_s, cur_r, cur_pos, cur_n)
        cself, cedge = _conv_weights(cur_s, cur_r, nw, cur_n)
        levels.append({
            "fine_to_coarse": f2c, "edge_to_coarse": e2c,
            "senders": c_s, "receivers": c_r, "node_graph": c_ng,
            "num_nodes": n_coarse, "num_edges": len(c_s),
            "num_fine_nodes": cur_n, "num_fine_edges": len(cur_s),
            "pos": c_pos, "node_weights": nw, "edge_weights": ew,
            "rep_mask": rep, "conv_self": cself, "conv_edge": cedge,
            "conv_edge_t": _conv_edge_transposed(cedge, cur_s, cur_r),
        })
        cur_s, cur_r, cur_ng, cur_n, cur_pos = c_s, c_r, c_ng, n_coarse, c_pos
    return levels


def collate_hierarchies(
    per_sample: List[List[dict]],
    *,
    num_fine_nodes_pad: int,
    num_fine_edges_pad: int,
    pad_plan: List[tuple],
    dtype=np.float32,
) -> List[HierarchyLevel]:
    """Merge per-sample real hierarchies into batch-level padded levels.

    Mirrors the reference's per-graph-then-offset semantics
    (bsms_mgn.py:234-263): coarse ids of graph g are offset by the coarse
    counts of graphs < g, at every level. ``pad_plan[s] = (Nc_pad, Ec_pad)``.
    """
    num_scales_m1 = len(per_sample[0])
    out: List[HierarchyLevel] = []
    nf_pad, ef_pad = num_fine_nodes_pad, num_fine_edges_pad
    for s in range(num_scales_m1):
        nc_pad, ec_pad = pad_plan[s]
        f2c_p = np.full(nf_pad, nc_pad - 1, dtype=np.int32)
        e2c_p = np.full(ef_pad, ec_pad - 1, dtype=np.int32)
        cs_p = np.full(ec_pad, nc_pad - 1, dtype=np.int32)
        cr_p = np.full(ec_pad, nc_pad - 1, dtype=np.int32)
        nm = np.zeros(nc_pad, dtype=dtype)
        em = np.zeros(ec_pad, dtype=dtype)
        ng_p = np.zeros(nc_pad, dtype=np.int32)
        nw = np.zeros(nf_pad, dtype=dtype)
        ew = np.zeros(ef_pad, dtype=dtype)
        rep_p = np.zeros(nf_pad, dtype=dtype)
        cself_p = np.zeros(nf_pad, dtype=dtype)
        cedge_p = np.zeros(ef_pad, dtype=dtype)
        cedge_t_p = np.zeros(ef_pad, dtype=dtype)
        all_sym = True
        fn_off = fe_off = cn_off = ce_off = 0
        for gi, levels in enumerate(per_sample):
            lvl = levels[s]
            nf, ef = lvl["num_fine_nodes"], lvl["num_fine_edges"]
            nc, ec = lvl["num_nodes"], lvl["num_edges"]
            f2c_p[fn_off:fn_off + nf] = lvl["fine_to_coarse"] + cn_off
            e2c_p[fe_off:fe_off + ef] = lvl["edge_to_coarse"] + ce_off
            cs_p[ce_off:ce_off + ec] = lvl["senders"] + cn_off
            cr_p[ce_off:ce_off + ec] = lvl["receivers"] + cn_off
            nm[cn_off:cn_off + nc] = 1.0
            em[ce_off:ce_off + ec] = 1.0
            ng_p[cn_off:cn_off + nc] = gi
            nw[fn_off:fn_off + nf] = lvl.get(
                "node_weights", np.ones(nf))[:nf]
            ew[fe_off:fe_off + ef] = lvl.get(
                "edge_weights", np.ones(ef))[:ef]
            rep_p[fn_off:fn_off + nf] = lvl.get(
                "rep_mask", _rep_mask_first(lvl["fine_to_coarse"], nf))[:nf]
            cself_p[fn_off:fn_off + nf] = lvl.get(
                "conv_self", np.ones(nf))[:nf]
            cedge_p[fe_off:fe_off + ef] = lvl.get(
                "conv_edge", np.zeros(ef))[:ef]
            ct = lvl.get("conv_edge_t")
            if ct is None:
                all_sym = False
            else:
                cedge_t_p[fe_off:fe_off + ef] = ct[:ef]
            fn_off += nf
            fe_off += ef
            cn_off += nc
            ce_off += ec
        if cn_off >= nc_pad or ce_off > ec_pad:
            raise ValueError(
                f"hierarchy pad_plan level {s} too small: need "
                f"({cn_off + 1}, {ce_off}), have ({nc_pad}, {ec_pad})")
        sperm = np.argsort(cs_p, kind="stable").astype(np.int32)
        out.append(with_pool_perms(HierarchyLevel(
            fine_to_coarse=jnp.asarray(f2c_p),
            edge_to_coarse=jnp.asarray(e2c_p),
            senders=jnp.asarray(cs_p), receivers=jnp.asarray(cr_p),
            sender_perm=jnp.asarray(sperm),
            senders_sorted=jnp.asarray(cs_p[sperm]),
            node_mask=jnp.asarray(nm), edge_mask=jnp.asarray(em),
            node_graph=jnp.asarray(ng_p),
            n_node=jnp.asarray(cn_off, dtype=jnp.int32),
            n_edge=jnp.asarray(ce_off, dtype=jnp.int32),
            node_weights=jnp.asarray(nw), edge_weights=jnp.asarray(ew),
            rep_mask=jnp.asarray(rep_p), conv_self=jnp.asarray(cself_p),
            conv_edge=jnp.asarray(cedge_p),
            conv_edge_t=jnp.asarray(cedge_t_p) if all_sym else None,
        )))
        nf_pad, ef_pad = nc_pad, ec_pad
    return out


def realign_level0(level: HierarchyLevel,
                    align_src: "np.ndarray") -> HierarchyLevel:
    """Re-index level 0's fine-EDGE-row artifacts for a block-aligned batch.

    ``align_src`` (from padded.build_graph_batch(..., return_align_map=True))
    maps each aligned edge row to its plain receiver-sorted row (-1 = pad
    slot). Alignment inserts pad slots without permuting real edges, so
    edge_to_coarse / edge_weights just gather through the map; fine-NODE-row
    artifacts (fine_to_coarse, node_weights) are untouched — alignment never
    reorders nodes.
    """
    e2c = np.asarray(level.edge_to_coarse)
    ew = np.asarray(level.edge_weights)
    ec_pad = level.num_coarse_edges_pad
    src = np.asarray(align_src)
    ok = src >= 0
    idx = np.where(ok, src, 0)
    e2c_a = np.where(ok, e2c[idx], ec_pad - 1).astype(np.int32)
    ew_a = np.where(ok, ew[idx], 0.0).astype(ew.dtype)
    fields = dict(edge_to_coarse=jnp.asarray(e2c_a),
                  edge_weights=jnp.asarray(ew_a))
    if level.conv_edge is not None:
        ce = np.asarray(level.conv_edge)
        fields["conv_edge"] = jnp.asarray(
            np.where(ok, ce[idx], 0.0).astype(ce.dtype))
    if level.conv_edge_t is not None:
        ct = np.asarray(level.conv_edge_t)
        fields["conv_edge_t"] = jnp.asarray(
            np.where(ok, ct[idx], 0.0).astype(ct.dtype))
    return with_pool_perms(dataclasses.replace(level, **fields))


def build_hierarchy(
    *,
    senders: np.ndarray,
    receivers: np.ndarray,
    node_graph: np.ndarray,
    num_nodes: int,
    pos: Optional[np.ndarray] = None,
    num_scales: int,
    mode: str = "stride",
    stride: int = 2,
    num_fine_nodes_pad: Optional[int] = None,
    num_fine_edges_pad: Optional[int] = None,
    pad_plan: Optional[List[tuple]] = None,
) -> List[HierarchyLevel]:
    """Build ``num_scales - 1`` coarsening levels from the REAL fine graph.

    ``pad_plan`` optionally fixes [(Nc_pad, Ec_pad), ...] per level so a
    whole dataset shares compiled shapes (see data.batching.hierarchy_pad_plan).
    """
    levels: List[HierarchyLevel] = []
    # receiver-sort level-0 edges to match GraphBatch row order
    perm0 = sort_edges_by_receiver(np.asarray(senders),
                                   np.asarray(receivers))
    cur = {
        "senders": np.asarray(senders, dtype=np.int64)[perm0],
        "receivers": np.asarray(receivers, dtype=np.int64)[perm0],
        "node_graph": np.asarray(node_graph, dtype=np.int64),
        "num_nodes": num_nodes,
        "pos": None if pos is None else np.asarray(pos, dtype=np.float64),
    }
    nf_pad, ef_pad = num_fine_nodes_pad, num_fine_edges_pad
    for s in range(num_scales - 1):
        nc_pad = ec_pad = None
        if pad_plan is not None:
            nc_pad, ec_pad = pad_plan[s]
        level, cur = build_hierarchy_level(
            senders=cur["senders"], receivers=cur["receivers"],
            node_graph=cur["node_graph"], num_nodes=cur["num_nodes"],
            pos=cur["pos"], mode=mode, stride=stride,
            num_fine_nodes_pad=nf_pad, num_fine_edges_pad=ef_pad,
            num_coarse_nodes_pad=nc_pad, num_coarse_edges_pad=ec_pad,
        )
        levels.append(level)
        nf_pad = level.num_coarse_nodes_pad
        ef_pad = level.num_coarse_edges_pad
    return levels


def _balance_block_slots(weights: np.ndarray, n_blocks: int, nb: int,
                         reserve_last: bool = True) -> np.ndarray:
    """Assign each weighted item a slot in [0, n_blocks*nb) so that per-block
    weight sums are balanced (greedy min-load, heaviest first). Used to
    relabel coarse node ids so every ALIGN_NODE_BLOCK node block's in+out
    degree fits few whole edge tiles — without it, bistride coarse graphs
    land at ~54% edge-tile fill (avg block load just above one tile).

    The last slot of the last block is reserved (pad-edge sink) when
    ``reserve_last``. Returns i64[len(weights)] slot ids. Deterministic.
    """
    import heapq

    n = len(weights)
    caps = np.full(n_blocks, nb, np.int64)
    if reserve_last:
        caps[-1] -= 1
    if n > int(caps.sum()):
        raise ValueError(
            f"balance: {n} items exceed capacity {int(caps.sum())}")
    order = np.argsort(-weights, kind="stable")
    heap = [(0.0, b) for b in range(n_blocks)]
    heapq.heapify(heap)
    count = np.zeros(n_blocks, np.int64)
    slots = np.empty(n, np.int64)
    for i in order:
        while True:
            load, b = heapq.heappop(heap)
            if count[b] < caps[b]:
                break
        slots[i] = b * nb + count[b]
        count[b] += 1
        if count[b] < caps[b]:
            heapq.heappush(heap, (load + float(weights[i]), b))
    return slots


def align_hierarchy(
    levels: List[HierarchyLevel],
    align_src0: Optional[np.ndarray] = None,
    *,
    edge_pad_targets: Optional[List[int]] = None,
    balance_blocks: bool = True,
) -> List[HierarchyLevel]:
    """Block-align EVERY level of a hierarchy for the Pallas kernels.

    Three coupled transformations, applied level by level:

      1. fine-side re-indexing — level s's fine-row artifacts
         (edge_to_coarse / edge_weights on edge rows, fine_to_coarse /
         node_weights on node rows) are moved onto the aligned layout of the
         stream they index: level 0 follows the GraphBatch alignment
         (``align_src0`` from build_graph_batch(return_align_map=True),
         exactly what realign_level0 did), level s>0 follows the alignment
         applied to level s-1's coarse stream in the previous iteration.
      2. (``balance_blocks``) degree-balanced coarse relabeling — coarse
         node ids are reassigned so per-ALIGN_NODE_BLOCK degree sums are
         even, cutting edge-tile padding (bistride coarse levels: ~54% ->
         ~90% fill). Coarse ids have no external contract (all consumers go
         through fine_to_coarse / edge_to_coarse / the coarse streams, which
         are relabeled together); outputs are bitwise-invariant only per
         coarse-segment, so aligned-vs-unaligned parity tests use allclose.
      3. coarse-side alignment — the coarse node padding is extended to an
         ALIGN_NODE_BLOCK multiple and the coarse edge stream is re-laid-out
         so each node block's edges fill whole ALIGN_EDGE_TILE tiles
         (padded.build_graph_batch(align_edges=True) contract), including
         the aligned sender-sorted view for the gather-transpose backward.

    ``edge_pad_targets[s]`` optionally fixes the aligned coarse edge count of
    level s so every batch of a dataset compiles to one shape (the coarse
    analogue of PadSpec.num_edges_pad); it must be an ALIGN_EDGE_TILE
    multiple at least as large as the aligned stream.
    """
    from aero_gnn_tpu.graph.padded import (
        ALIGN_EDGE_TILE as ET,
        ALIGN_NODE_BLOCK as NB,
        _align_edge_blocks,
        _align_sender_stream,
        _round_up,
    )

    out: List[HierarchyLevel] = []
    prev_src = None if align_src0 is None else np.asarray(align_src0)
    prev_node_map: Optional[np.ndarray] = None  # old fine row -> new row
    prev_nf_new: Optional[int] = None
    for s, level in enumerate(levels):
        f2c = np.asarray(level.fine_to_coarse)
        e2c = np.asarray(level.edge_to_coarse)
        nw = np.asarray(level.node_weights)
        ew = np.asarray(level.edge_weights)
        has_conv = level.conv_edge is not None
        rep = (np.asarray(level.rep_mask) if has_conv
               else np.zeros_like(nw))
        cself = (np.asarray(level.conv_self) if has_conv
                 else np.zeros_like(nw))
        cedge = (np.asarray(level.conv_edge) if has_conv
                 else np.zeros_like(ew))
        cedge_t = (np.asarray(level.conv_edge_t)
                   if level.conv_edge_t is not None else None)
        nc_pad = level.num_coarse_nodes_pad
        ec_pad = level.num_coarse_edges_pad

        # ---- 1. re-index fine rows through the previous alignment ----
        if prev_src is not None:
            ok = prev_src >= 0
            idx = np.where(ok, prev_src, 0)
            e2c = np.where(ok, e2c[idx], ec_pad - 1).astype(np.int32)
            ew = np.where(ok, ew[idx], 0.0).astype(ew.dtype)
            cedge = np.where(ok, cedge[idx], 0.0).astype(cedge.dtype)
            if cedge_t is not None:
                cedge_t = np.where(ok, cedge_t[idx],
                                   0.0).astype(cedge_t.dtype)
        if prev_node_map is not None:
            # previous level's coarse rows were relabeled: scatter this
            # level's fine-node artifacts onto the new rows
            assert prev_nf_new is not None
            f2c_new = np.full(prev_nf_new, nc_pad - 1, f2c.dtype)
            nw_new = np.zeros(prev_nf_new, nw.dtype)
            rep_new = np.zeros(prev_nf_new, rep.dtype)
            cself_new = np.zeros(prev_nf_new, cself.dtype)
            f2c_new[prev_node_map] = f2c[:len(prev_node_map)]
            nw_new[prev_node_map] = nw[:len(prev_node_map)]
            rep_new[prev_node_map] = rep[:len(prev_node_map)]
            cself_new[prev_node_map] = cself[:len(prev_node_map)]
            f2c, nw, rep, cself = f2c_new, nw_new, rep_new, cself_new
        elif prev_nf_new is not None and prev_nf_new > len(f2c):
            extra = prev_nf_new - len(f2c)
            f2c = np.concatenate(
                [f2c, np.full(extra, nc_pad - 1, f2c.dtype)])
            nw = np.concatenate([nw, np.zeros(extra, nw.dtype)])
            rep = np.concatenate([rep, np.zeros(extra, rep.dtype)])
            cself = np.concatenate([cself, np.zeros(extra, cself.dtype)])

        # ---- 2a. extend coarse node padding to a block multiple ----
        nc2 = max(_round_up(nc_pad, NB), NB)
        node_mask = np.asarray(level.node_mask)
        node_graph = np.asarray(level.node_graph)
        if nc2 != nc_pad:
            node_mask = np.concatenate(
                [node_mask, np.zeros(nc2 - nc_pad, node_mask.dtype)])
            fill_g = node_graph[-1] if len(node_graph) else 0
            node_graph = np.concatenate(
                [node_graph, np.full(nc2 - nc_pad, fill_g,
                                     node_graph.dtype)])

        n_real = int(level.n_edge)
        s_real = np.asarray(level.senders)[:n_real].astype(np.int64)
        r_real = np.asarray(level.receivers)[:n_real].astype(np.int64)
        nc_real = int(level.n_node)

        # ---- 2b. degree-balanced coarse node relabeling ----
        node_map: Optional[np.ndarray] = None  # old coarse id -> new id
        if balance_blocks and nc_real > 0:
            deg = (np.bincount(r_real, minlength=nc_pad)
                   + np.bincount(s_real, minlength=nc_pad))
            node_map = np.empty(nc_pad, np.int64)
            node_map[:nc_real] = _balance_block_slots(
                deg[:nc_real].astype(np.float64), nc2 // NB, NB)
            # old pad ids -> leftover slots; old pad sink -> new pad sink
            free = np.setdiff1d(np.arange(nc2, dtype=np.int64),
                                node_map[:nc_real], assume_unique=False)
            take = nc_pad - nc_real
            node_map[nc_real:] = free[-take:] if take else free[:0]
            # the override below pins the pad sink at the last slot; it is
            # only valid when slot nc_pad-1 IS a pad node (all builders
            # reserve one) — fail loudly rather than clobber a real node
            if nc_real >= nc_pad:
                raise ValueError(
                    "align_hierarchy(balance_blocks=True) requires a pad "
                    f"sink node (nc_real={nc_real} == nc_pad={nc_pad})")
            node_map[nc_pad - 1] = nc2 - 1
            # relabel everything that carries coarse node ids
            f2c = node_map[np.clip(f2c, 0, nc_pad - 1)].astype(f2c.dtype)
            s_real = node_map[s_real]
            r_real = node_map[r_real]
            nm2 = np.zeros(nc2, node_mask.dtype)
            ng2 = np.full(nc2, node_graph[-1] if len(node_graph) else 0,
                          node_graph.dtype)
            nm2[node_map[:nc_real]] = 1.0
            ng2[node_map] = node_graph[:nc_pad]
            node_mask, node_graph = nm2, ng2
            # restore the receiver-sorted invariant; remap coarse-edge rows
            sort_perm = np.lexsort((s_real, r_real))
            s_real = s_real[sort_perm]
            r_real = r_real[sort_perm]
            inv_sort = np.empty_like(sort_perm)
            inv_sort[sort_perm] = np.arange(len(sort_perm))
        else:
            sort_perm = np.arange(n_real, dtype=np.int64)
            inv_sort = sort_perm

        # ---- 2c. align the coarse edge stream ----
        dummy = np.zeros((n_real, 1), np.float32)
        s2, r2, _, valid, tb, tf = _align_edge_blocks(
            s_real.astype(np.int32), r_real.astype(np.int32), dummy, nc2,
            np.float32)
        ec2 = _round_up(len(s2), ET)
        if edge_pad_targets is not None:
            target = edge_pad_targets[s]
            if target < ec2 or target % ET:
                raise ValueError(
                    f"edge_pad_targets[{s}]={target} incompatible with "
                    f"aligned coarse edge count {ec2} (tile {ET})")
            ec2 = target
        pad_node = nc2 - 1
        s_p = np.full(ec2, pad_node, np.int32)
        r_p = np.full(ec2, pad_node, np.int32)
        s_p[:len(s2)] = s2
        r_p[:len(r2)] = r2
        em = np.zeros(ec2, np.asarray(level.edge_mask).dtype)
        em[:len(valid)] = valid.astype(em.dtype)

        # tile bookkeeping incl. the pad tail (build_graph_batch contract)
        n_tiles = ec2 // ET
        last_block = nc2 // NB - 1
        tb_full = np.full(n_tiles, last_block, np.int32)
        tf_full = np.zeros(n_tiles, np.int32)
        tb_full[:len(tb)] = tb
        tf_full[:len(tf)] = tf
        if len(tb) < n_tiles and (len(tb) == 0 or tb[-1] != last_block):
            tf_full[len(tb)] = 1

        # old coarse edge row -> aligned row, through the balance resort
        # (pads route to a masked slot; contributions through them are
        # edge-mask-zeroed regardless)
        new_rows = np.flatnonzero(valid)  # aligned row of sorted position k
        aligned_of_old = np.full(ec_pad, ec2 - 1, np.int64)
        aligned_of_old[sort_perm] = new_rows
        e2c = aligned_of_old[np.clip(e2c, 0, ec_pad - 1)].astype(np.int32)

        # aligned sender-sorted view
        sperm = np.argsort(s_p, kind="stable").astype(np.int32)
        ssort = s_p[sperm]
        sperm, ssort = _align_sender_stream(sperm, ssort, em, nc2)

        conv_fields = {}
        if has_conv:
            conv_fields = dict(rep_mask=jnp.asarray(rep),
                               conv_self=jnp.asarray(cself),
                               conv_edge=jnp.asarray(cedge))
            if cedge_t is not None:
                conv_fields["conv_edge_t"] = jnp.asarray(cedge_t)
        out.append(with_pool_perms(dataclasses.replace(
            level,
            fine_to_coarse=jnp.asarray(f2c.astype(np.int32)),
            edge_to_coarse=jnp.asarray(e2c),
            senders=jnp.asarray(s_p),
            receivers=jnp.asarray(r_p),
            sender_perm=jnp.asarray(sperm),
            senders_sorted=jnp.asarray(ssort),
            node_mask=jnp.asarray(node_mask),
            edge_mask=jnp.asarray(em),
            node_graph=jnp.asarray(node_graph),
            node_weights=jnp.asarray(nw),
            edge_weights=jnp.asarray(ew),
            tile_block=jnp.asarray(tb_full),
            tile_first=jnp.asarray(tf_full),
            **conv_fields,
        )))

        # maps for the NEXT level's fine side: aligned edge row -> old
        # (pre-balance-sort) edge row, and old coarse id -> new node row
        prev_src = np.full(ec2, -1, np.int64)
        prev_src[new_rows] = sort_perm
        prev_node_map = node_map
        prev_nf_new = nc2
    return out
