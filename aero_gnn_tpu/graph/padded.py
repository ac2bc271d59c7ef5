"""Static-shape padded graph containers.

The TPU compiles one program per shape, so all graphs are padded to bucketed
(num_nodes, num_edges, num_graphs) sizes and carry explicit validity masks.
Conventions (load-bearing — kernels and models rely on them):

  * ``receivers`` is sorted ascending (destination-major edge order). This
    makes edge aggregation a *segment reduction* over contiguous runs, which
    is what the Pallas SpMM kernel and ``jax.ops.segment_sum`` both want.
  * Pad edges point at the **last pad node** (index num_nodes_pad - 1) on both
    endpoints and have ``edge_mask == 0``. Messages are multiplied by
    ``edge_mask`` before aggregation, so pad edges contribute exact zeros
    (matching torch_scatter's ``dim_size`` semantics of the reference:
    /root/reference/models/mgnLayer.py:144-146 — missing rows are zeros).
  * Pad nodes have ``node_mask == 0`` and ``node_graph == num_graphs_pad - 1``
    (a dummy graph slot) so per-graph pooling stays uncontaminated.
  * Per-graph global scalars (mach, alpha, ...) are already broadcast into
    node features ``x`` by the data pipeline, mirroring the reference
    (/root/reference/dataset.py:66-106).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Pallas aggregation-kernel tiling (ops.pallas_segment): nodes are grouped
# in ALIGN_NODE_BLOCK-row output blocks, each block's edges padded to whole
# ALIGN_EDGE_TILE-row tiles. Larger blocks amortize the per-grid-step
# overhead but the one-hot matmuls cost NB*h FLOPs *per edge* (in-kernel
# gather + aggregate), so smaller blocks cut MXU work — until edge-tile
# padding waste dominates (blocks own whole ET-row tiles: NB=128/ET=1024
# wastes ~54% of edge rows on a degree-4 mesh and is 2.5x slower).
# NB=256/ET=1024 measured best on v5e (see BASELINE.md sweep).
# Env-overridable for tuning; must be set before first import and match
# the layout graphs were built with.
ALIGN_NODE_BLOCK = int(os.environ.get("AERO_GNN_NB", 256))
ALIGN_EDGE_TILE = int(os.environ.get("AERO_GNN_ET", 1024))


def bucket_size(n: int, multiple: int = 128, growth: float = 1.3) -> int:
    """Pick a padded size for ``n``: geometric buckets quantized to ``multiple``.

    Keeps the number of distinct compiled shapes logarithmic in mesh size while
    wasting at most ``growth - 1`` fraction of the work.
    """
    if n <= 0:
        return multiple
    size = multiple
    while size < n:
        size = _round_up(int(size * growth) + 1, multiple)
    return size


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A (possibly batched) padded graph — a pytree of device arrays.

    Shapes: N = padded node count, E = padded edge count, G = padded graph
    count. All leading dims are static per bucket.
    """

    # --- connectivity (destination-sorted; see module docstring) ---
    senders: jax.Array  # i32[E] source node index per edge
    receivers: jax.Array  # i32[E] destination node index per edge, ascending
    # sender-sorted view for sorted-transpose backward gathers
    # (ops.scatter.gather_senders): perm sorts edges by sender
    sender_perm: jax.Array  # i32[E]
    senders_sorted: jax.Array  # i32[E] == senders[sender_perm]

    # --- features ---
    x: jax.Array  # f[N, Dn] node features (normalized)
    edge_attr: jax.Array  # f[E, De] edge features (normalized)
    pos: jax.Array  # f[N, dim] node positions (raw, un-normalized)

    # --- targets (optional; zeros when absent) ---
    y: jax.Array  # f[N, Dy]

    # --- masks / bookkeeping ---
    node_mask: jax.Array  # f32[N] 1.0 for real nodes
    edge_mask: jax.Array  # f32[E] 1.0 for real edges
    node_graph: jax.Array  # i32[N] graph id per node (pad nodes -> G - 1)
    graph_mask: jax.Array  # f32[G] 1.0 for real graphs
    n_node: jax.Array  # i32[] actual number of real nodes
    n_edge: jax.Array  # i32[] actual number of real edges

    # Pallas aggregation layout (present when built with align_edges=True):
    # edges are additionally padded so each 128-node block's edge range is a
    # whole number of 128-edge tiles; tile_block[t] = node block of tile t,
    # tile_first[t] = 1 iff t is its block's first tile (accumulator reset).
    tile_block: Optional[jax.Array] = None  # i32[T]
    tile_first: Optional[jax.Array] = None  # i32[T]

    # Banded decomposition of the sender backward's [E, h] permutation
    # gather (ops.scatter.PermGatherPlan); built for large edge streams
    # where XLA's plain row gather leaves its fast regime. None = plain.
    sender_plan: Optional[Any] = None

    @property
    def edges_aligned(self) -> bool:
        """True iff built with align_edges=True (the Pallas kernel layout).
        Gates every Pallas dispatch — divisible shapes alone are unsafe."""
        return self.tile_block is not None

    @property
    def num_nodes_pad(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges_pad(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs_pad(self) -> int:
        return self.graph_mask.shape[0]

    def replace(self, **kw: Any) -> "GraphBatch":
        return dataclasses.replace(self, **kw)


def sort_edges_by_receiver(
    senders: np.ndarray, receivers: np.ndarray
) -> np.ndarray:
    """Permutation that sorts edges destination-major (receiver, then sender).

    Stable lexicographic order gives a deterministic reduction order, which the
    bitwise-parity tests rely on. Uses the native O(E+N) counting sort
    (native/graphcore.cpp) when built; numpy lexsort otherwise.
    """
    if len(senders) == 0:
        return np.zeros(0, dtype=np.int64)
    from aero_gnn_tpu.graph import native
    if native.available():
        num_nodes = int(max(senders.max(), receivers.max())) + 1
        return native.sort_edges_by_receiver(senders, receivers, num_nodes)
    return np.lexsort((senders, receivers))


def build_graph_batch(
    *,
    senders: np.ndarray,
    receivers: np.ndarray,
    x: np.ndarray,
    edge_attr: np.ndarray,
    pos: np.ndarray,
    y: Optional[np.ndarray] = None,
    num_nodes_pad: Optional[int] = None,
    num_edges_pad: Optional[int] = None,
    num_graphs_pad: int = 1,
    node_graph: Optional[np.ndarray] = None,
    align_edges: bool = False,
    dtype: np.dtype = np.float32,
    return_align_map: bool = False,
):
    """Host-side construction of a single padded graph (numpy in, pytree out).

    Sorts edges by receiver, pads nodes/edges to the requested (or bucketed)
    sizes, and routes pad edges to the last pad node. With
    ``align_edges=True`` the edge stream is additionally padded so every
    node block's edges fill whole edge tiles (the layout the Pallas
    aggregation kernel consumes); receivers stay ascending and real edges
    keep their receiver-sorted relative order (pad slots are inserted, not
    permuted).

    ``return_align_map=True`` returns ``(GraphBatch, align_src)`` where
    ``align_src`` is i64[num_edges_pad] mapping each (aligned) edge row to
    its plain receiver-sorted row, -1 for pad slots — None when
    ``align_edges`` is False. Used to re-index fine-edge-row hierarchy
    artifacts (graph.hierarchy.realign_level0).
    """
    senders = np.asarray(senders, dtype=np.int32)
    receivers = np.asarray(receivers, dtype=np.int32)
    x = np.asarray(x, dtype=dtype)
    edge_attr = np.asarray(edge_attr, dtype=dtype)
    pos = np.asarray(pos, dtype=dtype)
    n, e = x.shape[0], senders.shape[0]
    if y is None:
        y = np.zeros((n, 1), dtype=dtype)
    y = np.asarray(y, dtype=dtype)

    node_multiple = ALIGN_NODE_BLOCK if align_edges else 128
    np_pad = (num_nodes_pad if num_nodes_pad is not None
              else bucket_size(n + 1, multiple=node_multiple))
    ep_pad = num_edges_pad if num_edges_pad is not None else bucket_size(e)
    if align_edges and np_pad % ALIGN_NODE_BLOCK:
        raise ValueError(
            f"align_edges requires num_nodes_pad ({np_pad}) to be a "
            f"multiple of {ALIGN_NODE_BLOCK}")
    if np_pad <= n:
        raise ValueError(
            f"num_nodes_pad={np_pad} must exceed num_nodes={n} "
            "(one pad node is reserved as the pad-edge sink)"
        )
    if ep_pad < e:
        raise ValueError(f"num_edges_pad={ep_pad} < num_edges={e}")

    perm = sort_edges_by_receiver(senders, receivers)
    senders, receivers = senders[perm], receivers[perm]
    edge_attr = edge_attr[perm]

    tile_block = tile_first = None
    edge_valid = np.ones(e, dtype=bool)
    if align_edges:
        senders, receivers, edge_attr, edge_valid, tile_block, tile_first = \
            _align_edge_blocks(senders, receivers, edge_attr, np_pad, dtype)
        e_aligned = senders.shape[0]
        if num_edges_pad is None:
            # alignment already quantizes to whole tiles: pad exactly (use
            # explicit num_edges_pad for cross-mesh bucket reuse instead)
            ep_pad = _round_up(e_aligned, ALIGN_EDGE_TILE)
        if ep_pad < e_aligned or ep_pad % ALIGN_EDGE_TILE:
            raise ValueError(
                f"num_edges_pad={ep_pad} incompatible with aligned edge "
                f"count {e_aligned} (tile {ALIGN_EDGE_TILE})")
        # pad tail forms whole tiles assigned to the last node block
        n_tiles = ep_pad // ALIGN_EDGE_TILE
        last_block = np_pad // ALIGN_NODE_BLOCK - 1
        tb = np.full(n_tiles, last_block, dtype=np.int32)
        tf = np.zeros(n_tiles, dtype=np.int32)
        tb[: len(tile_block)] = tile_block
        tf[: len(tile_first)] = tile_first
        if len(tile_block) < n_tiles and (
                len(tile_block) == 0 or tile_block[-1] != last_block):
            tf[len(tile_block)] = 1
        tile_block, tile_first = tb, tf

    align_src = None
    if align_edges:
        align_src = np.full(ep_pad, -1, dtype=np.int64)
        valid_rows = np.flatnonzero(edge_valid)
        align_src[valid_rows] = np.arange(len(valid_rows), dtype=np.int64)

    pad_node = np_pad - 1
    n_rows = senders.shape[0]
    s_p = np.full(ep_pad, pad_node, dtype=np.int32)
    r_p = np.full(ep_pad, pad_node, dtype=np.int32)
    s_p[:n_rows], r_p[:n_rows] = senders, receivers
    ea_p = np.zeros((ep_pad, edge_attr.shape[1]), dtype=dtype)
    ea_p[:n_rows] = edge_attr

    def pad_rows(a: np.ndarray, rows: int) -> np.ndarray:
        out = np.zeros((rows,) + a.shape[1:], dtype=dtype)
        out[: a.shape[0]] = a
        return out

    if node_graph is None:
        ng = np.zeros(n, dtype=np.int32)
    else:
        ng = np.asarray(node_graph, dtype=np.int32)
    ng_p = np.full(np_pad, num_graphs_pad - 1, dtype=np.int32)
    ng_p[:n] = ng

    node_mask = np.zeros(np_pad, dtype=dtype)
    node_mask[:n] = 1.0
    edge_mask = np.zeros(ep_pad, dtype=dtype)
    edge_mask[:n_rows] = edge_valid.astype(dtype)
    n_real_graphs = int(ng.max()) + 1 if n else 0
    graph_mask = np.zeros(num_graphs_pad, dtype=dtype)
    graph_mask[:n_real_graphs] = 1.0

    sender_perm = np.argsort(s_p, kind="stable").astype(np.int32)
    senders_sorted = s_p[sender_perm]
    sender_plan = None
    if align_edges:
        # Align the SENDER-sorted stream to blocks as well, so the sorted
        # segment-sum in the gather-transpose backward can also run on the
        # Pallas kernel. Pad slots route to a masked (zero-cotangent) edge
        # row; fill sender keys stay inside their node block.
        sender_perm, senders_sorted = _align_sender_stream(
            sender_perm, senders_sorted, edge_mask, np_pad)
        sender_plan, sender_perm, senders_sorted = _maybe_perm_gather_plan(
            sender_perm, senders_sorted, edge_mask, ep_pad, np_pad, s_p)

    gb = GraphBatch(
        senders=jnp.asarray(s_p),
        receivers=jnp.asarray(r_p),
        sender_perm=jnp.asarray(sender_perm),
        senders_sorted=jnp.asarray(senders_sorted),
        tile_block=None if tile_block is None else jnp.asarray(tile_block),
        tile_first=None if tile_first is None else jnp.asarray(tile_first),
        sender_plan=sender_plan,
        x=jnp.asarray(pad_rows(x, np_pad)),
        edge_attr=jnp.asarray(ea_p),
        pos=jnp.asarray(pad_rows(pos, np_pad)),
        y=jnp.asarray(pad_rows(y, np_pad)),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        node_graph=jnp.asarray(ng_p),
        graph_mask=jnp.asarray(graph_mask),
        n_node=jnp.asarray(n, dtype=jnp.int32),
        n_edge=jnp.asarray(e, dtype=jnp.int32),
    )
    if return_align_map:
        return gb, align_src
    return gb


def batch_graphs(
    graphs: list,
    *,
    num_nodes_pad: Optional[int] = None,
    num_edges_pad: Optional[int] = None,
    num_graphs_pad: Optional[int] = None,
    align_edges: bool = False,
    dtype: np.dtype = np.float32,
    return_align_map: bool = False,
):
    """Disjoint-union collation of host-side graphs into one ``GraphBatch``.

    ``graphs`` is a list of dicts with numpy arrays: senders, receivers, x,
    edge_attr, pos, y. Equivalent of PyG mini-batch collation
    (/root/reference/train.py:50-51) but with static padded output shapes.
    """
    n_tot = sum(g["x"].shape[0] for g in graphs)
    e_tot = sum(g["senders"].shape[0] for g in graphs)
    g_tot = len(graphs)
    np_pad = num_nodes_pad if num_nodes_pad is not None else bucket_size(n_tot + 1)
    ep_pad = num_edges_pad if num_edges_pad is not None else bucket_size(e_tot)
    gp_pad = (
        num_graphs_pad if num_graphs_pad is not None else max(g_tot + 1, 2)
    )

    senders = np.concatenate(
        [g["senders"] + off for g, off in zip(graphs, _offsets(graphs))]
    )
    receivers = np.concatenate(
        [g["receivers"] + off for g, off in zip(graphs, _offsets(graphs))]
    )
    x = np.concatenate([g["x"] for g in graphs])
    edge_attr = np.concatenate([g["edge_attr"] for g in graphs])
    pos = np.concatenate([g["pos"] for g in graphs])
    y = np.concatenate([g["y"] for g in graphs])
    node_graph = np.concatenate(
        [np.full(g["x"].shape[0], i, dtype=np.int32) for i, g in enumerate(graphs)]
    )
    return build_graph_batch(
        senders=senders,
        receivers=receivers,
        x=x,
        edge_attr=edge_attr,
        pos=pos,
        y=y,
        num_nodes_pad=np_pad,
        num_edges_pad=ep_pad,
        num_graphs_pad=gp_pad,
        node_graph=node_graph,
        align_edges=align_edges,
        return_align_map=return_align_map,
        dtype=dtype,
    )


def _offsets(graphs: list) -> list:
    offs, acc = [], 0
    for g in graphs:
        offs.append(acc)
        acc += g["x"].shape[0]
    return offs


def _maybe_perm_gather_plan(sender_perm, senders_sorted, edge_mask,
                            num_src_rows, num_nodes_pad, senders):
    """Attach a banded PermGatherPlan to large sender streams.

    XLA's [E, h] permutation gather (the sender backward) leaves its fast
    regime once the edge stream is large (~4x measured on the 262k-node
    bench, benchmarks/micro_permgather.py); the plan re-expresses it as
    windowed chunk gathers + an outlier fixup (ops.scatter). Gated by
    AERO_GNN_PG (auto | 0 | 1-force) with AERO_GNN_PG_MIN_EDGES (default
    393216 rows ~ 100 MB bf16 at h=128), AERO_GNN_PG_CHUNK / AERO_GNN_PG_WIN
    geometry. May pad the sender stream to a chunk multiple (pad slots keep
    the masked-row / last-pad-node convention).

    The auto gate also has a CEILING (AERO_GNN_PG_MAX_EDGES /
    AERO_GNN_PGF_MAX_NODES): on HBM-saturated meshes the plans' index/
    window buffers plus the chunk-padded [E, h] streams cost ~1.0 GB of
    compile-time headroom that 16 GB chips no longer have — the round-3
    auto gate enabled the plans at 1M nodes and pushed an otherwise-
    fitting program to compile-OOM (BASELINE.md "1M status"). Measured:
    plans WIN at 262k/524k nodes (<=2.1M edge rows), BREAK the fit at 1M
    (4.2M rows); the ceilings sit between. Force with AERO_GNN_PG=1.
    """
    mode = os.environ.get("AERO_GNN_PG", "auto")
    if mode == "0":
        return None, sender_perm, senders_sorted
    # geometry swept on the 262k mesh (benchmarks/ablate_permgather.py):
    # 32k:64k / 64k:96k / 64k:128k / 128k:256k -> 288.7 / 286.2 / 289.1 /
    # 292.3 ms/step (plain 392.8)
    chunk = int(os.environ.get("AERO_GNN_PG_CHUNK", 65536))
    # window defaults are size-banded (round-5 interleaved sweeps): 96k
    # windows win at 262k (ablate_permgather), 64k windows win at 524k
    # (853.5 vs 870.2 ms/step) and 786k (1300.5 vs 1578.5) where source
    # streams are deep in the slow-gather regime
    big = num_src_rows >= 1_500_000
    window = int(os.environ.get("AERO_GNN_PG_WIN",
                                65536 if big else 98304))
    min_edges = int(os.environ.get("AERO_GNN_PG_MIN_EDGES", 393216))
    # r4 ceilings protected the 1M fit from the scan-form plan temps; the
    # unrolled chunk loops (ops.scatter._pg_chunks_unrolled) removed those
    # arenas (786k: 17.72G -> 14.02G AOT; 1M w64: 14.70G FITS), so the
    # ceilings now sit above the largest single-chip mesh
    max_edges = int(os.environ.get("AERO_GNN_PG_MAX_EDGES", 5 * 2**20))
    # forward plan engages when the NODE table leaves the fast regime
    # (~100 MB bf16 at h=128); its window counts node rows
    fwd_min_nodes = int(os.environ.get("AERO_GNN_PGF_MIN_NODES", 393216))
    fwd_max_nodes = int(os.environ.get("AERO_GNN_PGF_MAX_NODES",
                                       1_572_864))
    fwd_window = int(os.environ.get("AERO_GNN_PGF_WIN",
                                    65536 if big else 98304))
    if chunk % ALIGN_EDGE_TILE:
        return None, sender_perm, senders_sorted
    masked_rows = np.nonzero(edge_mask == 0.0)[0]
    if len(masked_rows) == 0:
        return None, sender_perm, senders_sorted

    from aero_gnn_tpu.ops.scatter import (
        SenderPlans, build_banded_gather_plan, build_perm_gather_plan)

    bwd = None
    perm, keys = sender_perm, senders_sorted
    if mode == "1" or min_edges <= num_src_rows < max_edges:
        pad_row = np.int32(masked_rows[-1])
        tail = (-len(sender_perm)) % chunk
        perm = np.concatenate(
            [sender_perm, np.full(tail, pad_row, np.int32)]) \
            if tail else sender_perm
        keys = np.concatenate(
            [senders_sorted,
             np.full(tail, num_nodes_pad - 1, senders_sorted.dtype)]) \
            if tail else senders_sorted
        valid = edge_mask[perm] > 0
        bwd = build_perm_gather_plan(
            perm, keys, valid, num_src_rows, num_nodes_pad - 1,
            chunk=chunk, window=window)
        if bwd is None:
            perm, keys = sender_perm, senders_sorted

    fwd = None
    fwd_mode = os.environ.get("AERO_GNN_PGF", "auto")
    if fwd_mode != "0" and (
            fwd_mode == "1" or mode == "1"
            or fwd_min_nodes <= num_nodes_pad < fwd_max_nodes):
        # the receiver stream's length is fixed (everything keys off it),
        # so the chunk decomposition PADS the index stream to a chunk
        # multiple (pad slots read the last pad node as don't-care rows;
        # ops.scatter._sender_gather_fwd_impl slices the output back to
        # the stream length). Until round 5 the chunk had to DIVIDE the
        # stream, which silently dropped the plan on meshes whose tile
        # count had no divisor near the 64k-row optimum (1M: 4098 tiles
        # = 2x3x683 -> best divisor chunk 6144 rows, out of range).
        fwd_chunk = int(os.environ.get("AERO_GNN_PGF_CHUNK", chunk))
        ftail = (-len(senders)) % fwd_chunk
        s_f = np.concatenate(
            [senders, np.full(ftail, num_nodes_pad - 1, senders.dtype)]) \
            if ftail else senders
        v_f = edge_mask > 0
        if ftail:
            v_f = np.concatenate([v_f, np.zeros(ftail, bool)])
        # pad edges point at the last pad node — far from any window —
        # but their gathered rows are never observable (every consumer
        # masks by edge_mask), so they are don't-care slots, not outliers
        fwd = build_banded_gather_plan(
            s_f, v_f, num_nodes_pad,
            chunk=fwd_chunk, window=fwd_window)

    if bwd is None and fwd is None:
        return None, perm.astype(np.int32), keys
    return SenderPlans(bwd=bwd, fwd=fwd), perm.astype(np.int32), keys


def _pick_divisor_chunk(n_rows: int, tile: int,
                        lo: int = 16384, hi: int = 131072,
                        target: int = 65536):
    """Largest-utility chunk size: a multiple of ``tile`` that divides
    ``n_rows``, within [lo, hi], closest to ``target``; None if none."""
    if n_rows % tile:
        return None
    n_tiles = n_rows // tile
    best = None
    for d in range(1, n_tiles + 1):
        if n_tiles % d:
            continue
        c = d * tile
        if c < lo or c > hi:
            continue
        if best is None or abs(c - target) < abs(best - target):
            best = c
    return best


def _align_sender_stream(sender_perm, senders_sorted, edge_mask,
                         num_nodes_pad):
    """Block-align the sender-sorted stream (for the backward Pallas path).

    Returns (perm_aligned, keys_aligned): each ALIGN_NODE_BLOCK sender block
    padded to whole ALIGN_EDGE_TILE tiles. Pad slots index a masked edge row
    (whose cotangent is exactly zero — pad edges never reach the loss), so
    no extra mask array is needed downstream.
    """
    nb, et = ALIGN_NODE_BLOCK, ALIGN_EDGE_TILE
    masked_rows = np.nonzero(edge_mask == 0.0)[0]
    if len(masked_rows) == 0:
        # every edge row is real: fall back to the plain layout (backward
        # will take the XLA path for the sender transpose)
        return sender_perm, senders_sorted
    pad_row = np.int32(masked_rows[-1])

    n_blocks = num_nodes_pad // nb
    block_of = senders_sorted // nb
    starts = np.searchsorted(block_of, np.arange(n_blocks))
    ends = np.searchsorted(block_of, np.arange(n_blocks) + 1)
    perm_out, keys_out = [], []
    for b in range(n_blocks):
        lo, hi = int(starts[b]), int(ends[b])
        cnt = hi - lo
        n_tiles = max(1, -(-cnt // et))
        pad = n_tiles * et - cnt
        perm_out.append(sender_perm[lo:hi])
        keys_out.append(senders_sorted[lo:hi])
        if pad:
            fill_k = (senders_sorted[hi - 1] if cnt
                      else min(b * nb, num_nodes_pad - 1))
            perm_out.append(np.full(pad, pad_row, dtype=np.int32))
            keys_out.append(np.full(pad, fill_k,
                                    dtype=senders_sorted.dtype))
    perm_a = np.concatenate(perm_out)
    keys_a = np.concatenate(keys_out)
    total = _round_up(len(perm_a), et)
    if total > len(perm_a):
        extra = total - len(perm_a)
        perm_a = np.concatenate(
            [perm_a, np.full(extra, pad_row, np.int32)])
        keys_a = np.concatenate(
            [keys_a, np.full(extra, num_nodes_pad - 1, keys_a.dtype)])
    return perm_a.astype(np.int32), keys_a


def _align_edge_blocks(senders, receivers, edge_attr, num_nodes_pad, dtype):
    """Insert masked pad edges so each ALIGN_NODE_BLOCK-node block's edge
    range is a whole number of ALIGN_EDGE_TILE-edge tiles; every node block
    gets at least one tile (so the Pallas kernel writes all output blocks).

    Pad edges replicate the block's boundary receiver (keeps receivers
    ascending) with sender = receiver and zero features.
    """
    nb, et = ALIGN_NODE_BLOCK, ALIGN_EDGE_TILE

    from aero_gnn_tpu.graph import native
    if native.available():
        res = native.align_blocks(receivers, num_nodes_pad, nb, et)
        if res is not None:
            rows, tile_block, tile_first = res
            slots = len(rows)
            pad = rows < 0
            idx = np.where(pad, 0, rows)
            s_slot = senders[idx].copy()
            r_slot = receivers[idx].copy()
            ea_slot = edge_attr[idx].copy()
            ea_slot[pad] = 0.0
            # pad-slot fill receivers must stay inside the slot's node block
            # (keeps receivers ascending and tile->block derivation exact)
            blk = tile_block[np.arange(slots) // et].astype(np.int64)
            last_real = np.maximum.accumulate(
                np.where(~pad, np.arange(slots), -1))
            prev_rows = np.where(last_real >= 0, rows[np.clip(last_real, 0, None)], 0)
            prev_r = receivers[prev_rows]
            use_prev = (last_real >= 0) & (prev_r // nb == blk)
            fill_r = np.where(use_prev, prev_r,
                              np.minimum(blk * nb, num_nodes_pad - 1)
                              ).astype(receivers.dtype)
            r_slot = np.where(pad, fill_r, r_slot)
            s_slot = np.where(pad, fill_r, s_slot)
            return (s_slot, r_slot, ea_slot, ~pad,
                    tile_block.astype(np.int32), tile_first.astype(np.int32))

    n_blocks = num_nodes_pad // nb
    block_of_edge = receivers // nb
    # edges are receiver-sorted, so each block's edges are one contiguous
    # range: find boundaries with searchsorted (vectorized, O(E + blocks))
    starts = np.searchsorted(block_of_edge, np.arange(n_blocks))
    ends = np.searchsorted(block_of_edge, np.arange(n_blocks) + 1)
    s_out, r_out, ea_out, valid = [], [], [], []
    tile_block, tile_first = [], []
    for b in range(n_blocks):
        lo, hi = int(starts[b]), int(ends[b])
        cnt = hi - lo
        n_tiles = max(1, -(-cnt // et))
        pad = n_tiles * et - cnt
        s_out.append(senders[lo:hi])
        r_out.append(receivers[lo:hi])
        ea_out.append(edge_attr[lo:hi])
        valid.append(np.ones(cnt, dtype=bool))
        if pad:
            fill_r = (receivers[hi - 1] if cnt
                      else min(b * nb, num_nodes_pad - 1))
            s_out.append(np.full(pad, fill_r, dtype=senders.dtype))
            r_out.append(np.full(pad, fill_r, dtype=receivers.dtype))
            ea_out.append(np.zeros((pad, edge_attr.shape[1]), dtype=dtype))
            valid.append(np.zeros(pad, dtype=bool))
        tile_block.extend([b] * n_tiles)
        tile_first.extend([1] + [0] * (n_tiles - 1))
    return (np.concatenate(s_out), np.concatenate(r_out),
            np.concatenate(ea_out), np.concatenate(valid),
            np.asarray(tile_block, np.int32), np.asarray(tile_first, np.int32))
