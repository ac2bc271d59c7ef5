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

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


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


# ---------------------------------------------------------------------------
# sorted-transpose gathers (the TPU-critical path)
#
# XLA's automatic transpose of a gather is a scatter-add with *unsorted*
# indices, which the TPU backend executes orders of magnitude slower than a
# sorted segment reduction (measured ~70x on the full MGN train step).
# These custom VJPs re-express every transpose as a SORTED segment-sum /
# sorted gather using permutations precomputed on host (GraphBatch carries
# them).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PermGatherPlan:
    """Host-precomputed banded decomposition of ``ct[perm]`` (the sender
    backward's [E, h] permutation gather).

    XLA's row gather runs at ~540M rows/s while its staging stays small but
    collapses ~6x once the source exceeds ~100 MB (measured: the 262k-node
    bench's per-layer sender backward goes 1.9 -> 11.2 ms,
    benchmarks/micro_permgather.py). A mesh's sender perm is strongly banded
    (receiver-sorted edge rows of one sender cluster spatially: |src - dst|
    p50/p99 = 7 / 11k rows on the 262k mesh), so the gather is re-expressed
    as K output chunks, each reading a ``window``-row dynamic slice of the
    source — small enough that the chunk gather stays in the fast regime —
    plus a tiny outlier fixup that joins AFTER the segment reduction (the
    sum is linear, so routing outliers around the sorted stream is exact up
    to fp ordering). Built by ``build_perm_gather_plan``.
    """

    lo: jax.Array        # i32[K]    window start row per chunk
    idx: jax.Array       # i32[K, C] in-window row per output slot (clamped)
    mask: jax.Array      # f32[K, C] 1.0 = in-window real edge slot
    out_src: jax.Array   # i32[S]    source rows of out-of-window slots
    out_seg: jax.Array   # i32[S]    their (ascending) sender segment ids
    out_mask: jax.Array  # f32[S]    1.0 = real outlier, 0 = padding
    window: int = dataclasses.field(metadata=dict(static=True))


def build_perm_gather_plan(perm: np.ndarray, keys: np.ndarray,
                           valid: np.ndarray, num_src_rows: int,
                           pad_seg: int, *, chunk: int, window: int,
                           max_outlier_frac: float = 0.05
                           ) -> Optional[PermGatherPlan]:
    """Build a banded plan for ``ct[perm]`` followed by a segment sum over
    ``keys`` (ascending). ``valid`` marks slots whose source row carries a
    real (non-pad) edge — invalid slots contribute exact zeros either way.
    Returns None when the decomposition does not apply (stream not a chunk
    multiple, window >= source, or too many outliers to pay off)."""
    perm = np.asarray(perm, dtype=np.int64)
    keys = np.asarray(keys)
    valid = np.asarray(valid, dtype=bool)
    es = len(perm)
    if es % chunk or es // chunk < 2 or window >= num_src_rows:
        return None
    k_chunks = es // chunk
    src = perm.reshape(k_chunks, chunk)
    v = valid.reshape(k_chunks, chunk)
    lo = np.zeros(k_chunks, np.int32)
    idx = np.zeros((k_chunks, chunk), np.int32)
    mask = np.zeros((k_chunks, chunk), np.float32)
    out_pos = []
    hi_cap = max(num_src_rows - window, 0)
    for k in range(k_chunks):
        s, vk = src[k], v[k]
        center = int(np.median(s[vk])) if vk.any() else 0
        lo_k = min(max(center - window // 2, 0), hi_cap)
        inl = vk & (s >= lo_k) & (s < lo_k + window)
        lo[k] = lo_k
        idx[k] = np.clip(s - lo_k, 0, window - 1)
        mask[k] = inl
        bad = np.flatnonzero(vk & ~inl) + k * chunk
        if len(bad):
            out_pos.append(bad)
    out_pos = (np.concatenate(out_pos) if out_pos
               else np.zeros(0, np.int64))
    if len(out_pos) > max_outlier_frac * es:
        return None
    s_pad = max(512, -(-len(out_pos) // 512) * 512)
    out_src = np.zeros(s_pad, np.int32)
    out_seg = np.full(s_pad, pad_seg, np.int32)
    out_mask = np.zeros(s_pad, np.float32)
    out_src[: len(out_pos)] = perm[out_pos]
    out_seg[: len(out_pos)] = keys[out_pos]
    out_mask[: len(out_pos)] = 1.0
    return PermGatherPlan(
        lo=jnp.asarray(lo), idx=jnp.asarray(idx), mask=jnp.asarray(mask),
        out_src=jnp.asarray(out_src), out_seg=jnp.asarray(out_seg),
        out_mask=jnp.asarray(out_mask), window=int(window))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandedGatherPlan:
    """Banded decomposition of a FORWARD row gather ``table[indices]``
    (e.g. the sender gather x_proj[senders]) for tables past XLA's
    fast-gather regime (>= ~100 MB: the 524k/1M-node meshes).

    Output chunks read a ``window``-row dynamic slice of the table;
    out-of-window slots (rare: mesh senders are Morton-local in the
    receiver-sorted stream) are patched by a small per-chunk scatter of
    globally-gathered rows. Slots marked invalid at build time (pad edges,
    whose gathered rows are never observable — every consumer masks by
    edge_mask) read an arbitrary in-window row instead.
    """

    lo: jax.Array       # i32[K]     window start (table rows) per chunk
    idx: jax.Array      # i32[K, C]  window-local row per output slot
    out_pos: jax.Array  # i32[K, S]  chunk-local slot to patch (C = none)
    out_src: jax.Array  # i32[K, S]  global table row for the patch
    window: int = dataclasses.field(metadata=dict(static=True))


def build_banded_gather_plan(indices: np.ndarray, valid: np.ndarray,
                             num_table_rows: int, *, chunk: int,
                             window: int, max_outlier_frac: float = 0.05
                             ) -> Optional[BandedGatherPlan]:
    """Build a BandedGatherPlan for ``table[indices]``. ``valid`` marks
    slots whose value is observable (invalid slots may read garbage).
    Returns None when the stream is not a chunk multiple, the window does
    not shrink the table, or too many slots fall outside their window."""
    indices = np.asarray(indices, dtype=np.int64)
    valid = np.asarray(valid, dtype=bool)
    es = len(indices)
    if es % chunk or es // chunk < 2 or window >= num_table_rows:
        return None
    k_chunks = es // chunk
    src = indices.reshape(k_chunks, chunk)
    v = valid.reshape(k_chunks, chunk)
    lo = np.zeros(k_chunks, np.int32)
    idx = np.zeros((k_chunks, chunk), np.int32)
    hi_cap = max(num_table_rows - window, 0)
    out_pos, out_src, total_out = [], [], 0
    for k in range(k_chunks):
        s, vk = src[k], v[k]
        center = int(np.median(s[vk])) if vk.any() else 0
        lo_k = min(max(center - window // 2, 0), hi_cap)
        lo[k] = lo_k
        idx[k] = np.clip(s - lo_k, 0, window - 1)
        bad = np.flatnonzero(vk & ((s < lo_k) | (s >= lo_k + window)))
        out_pos.append(bad)
        out_src.append(s[bad])
        total_out += len(bad)
    if total_out > max_outlier_frac * es:
        return None
    s_pad = max(8, -(-max(len(p) for p in out_pos) // 8) * 8)
    pos = np.full((k_chunks, s_pad), chunk, np.int32)  # chunk = dropped
    srcs = np.zeros((k_chunks, s_pad), np.int32)
    for k in range(k_chunks):
        pos[k, : len(out_pos[k])] = out_pos[k]
        srcs[k, : len(out_src[k])] = out_src[k]
    return BandedGatherPlan(
        lo=jnp.asarray(lo), idx=jnp.asarray(idx),
        out_pos=jnp.asarray(pos), out_src=jnp.asarray(srcs),
        window=int(window))


def _pg_chunks_unrolled(n_rows: int) -> bool:
    """AERO_GNN_PG_UNROLL (auto | 0 | 1): execute the banded gathers' chunk
    loop as unrolled slices + one concatenate instead of a lax.scan. The
    scan's stacked [K, C, h] output lowers to an AllocateBuffer arena that
    XLA's buffer assignment cannot share or free early — with 15 unrolled
    layers each running windowed gathers, those arenas were the ~7 GB that
    kept the plans from fitting beside grouped remat at 786k (BASELINE.md
    "786k knee"); unrolled chunks write straight into the one [E, h]
    result buffer. But where the scan DOES fit it is faster on-chip
    (524k interleaved A/B: scan 870.2 / concat 1090.4 ms/step at w96,
    853.5 / 903.3 at w64 — the scan body double-buffers its window DMA;
    the concat form serializes per-chunk fusions), so auto keeps the scan
    up to ~2.5M stream rows (the 524k mesh) and unrolls above (786k/1M,
    where the scan form compile-OOMs)."""
    import os

    mode = os.environ.get("AERO_GNN_PG_UNROLL", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return n_rows > 2_500_000


def banded_gather(table: jax.Array, plan: BandedGatherPlan) -> jax.Array:
    """``table[indices]`` via windowed chunk gathers + outlier patches."""
    k_chunks, chunk = plan.idx.shape
    h = table.shape[1]

    def one(lo_k, idx_k, pos_k, src_k):
        win = jax.lax.dynamic_slice(table, (lo_k, jnp.zeros_like(lo_k)),
                                    (plan.window, h))
        rows = win.at[idx_k].get(mode="promise_in_bounds")
        fix = table.at[src_k].get(mode="promise_in_bounds")
        return rows.at[pos_k].set(fix, mode="drop",
                                  indices_are_sorted=True)

    if _pg_chunks_unrolled(k_chunks * chunk):
        return jnp.concatenate(
            [one(plan.lo[k], plan.idx[k], plan.out_pos[k], plan.out_src[k])
             for k in range(k_chunks)], axis=0)

    def body(carry, ins):
        return carry, one(*ins)

    _, out = jax.lax.scan(
        body, 0, (plan.lo, plan.idx, plan.out_pos, plan.out_src))
    return out.reshape(k_chunks * chunk, h)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SenderPlans:
    """Bundle of banded-gather plans for one sender stream: ``bwd`` covers
    the backward's [E, h] permutation gather (PermGatherPlan), ``fwd`` the
    forward's [N, h] -> [E, h] sender gather (BandedGatherPlan). Either may
    be None (plain XLA gather). GraphBatch.sender_plan carries this."""

    bwd: Optional[PermGatherPlan] = None
    fwd: Optional[BandedGatherPlan] = None


def banded_perm_gather(ct: jax.Array, plan: PermGatherPlan) -> jax.Array:
    """``ct[perm]`` with out-of-window slots zeroed (their contribution is
    re-added after the segment reduction — see PermGatherPlan)."""
    k_chunks, chunk = plan.idx.shape
    h = ct.shape[1]

    def one(lo_k, idx_k, m_k):
        win = jax.lax.dynamic_slice(ct, (lo_k, jnp.zeros_like(lo_k)),
                                    (plan.window, h))
        rows = win.at[idx_k].get(mode="promise_in_bounds")
        return rows * m_k[:, None].astype(rows.dtype)

    if _pg_chunks_unrolled(k_chunks * chunk):
        return jnp.concatenate(
            [one(plan.lo[k], plan.idx[k], plan.mask[k])
             for k in range(k_chunks)], axis=0)

    def body(carry, ins):
        return carry, one(*ins)

    _, out = jax.lax.scan(body, 0, (plan.lo, plan.idx, plan.mask))
    return out.reshape(k_chunks * chunk, h)


def _sender_gather_fwd_impl(x, senders, plan):
    if plan is not None and plan.fwd is not None:
        out = banded_gather(x, plan.fwd)
        # fwd plans may pad the index stream to a chunk multiple
        # (graph.padded builds them that way when the stream length has
        # no tile-divisor chunk near the optimum) — slice back
        if out.shape[0] != senders.shape[0]:
            out = out[: senders.shape[0]]
        return out
    return x.at[senders].get(mode="promise_in_bounds")


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_senders_impl(num_nodes: int, aligned: bool, x, senders,
                         sender_perm, senders_sorted, plan):
    return _sender_gather_fwd_impl(x, senders, plan)


def _gather_senders_fwd(num_nodes, aligned, x, senders, sender_perm,
                        senders_sorted, plan):
    out = _sender_gather_fwd_impl(x, senders, plan)
    return out, (senders, sender_perm, senders_sorted, plan)


def _dispatch_sorted_segment_sum(data, segment_ids, num_segments,
                                 aligned=False):
    """Sorted segment sum, routed to the Pallas kernel when the pallas
    backend is active and the stream is declared block-aligned."""
    from aero_gnn_tpu import ops as _ops

    if _ops.backend() == "pallas" and aligned:
        from aero_gnn_tpu.ops.pallas_segment import segment_agg_pallas

        return segment_agg_pallas(data, segment_ids, num_segments,
                                  aggregation="add")
    return jax.ops.segment_sum(data, segment_ids,
                               num_segments=num_segments,
                               indices_are_sorted=True)


def _gather_senders_bwd(num_nodes, aligned, res, ct):
    senders, sender_perm, senders_sorted, plan = res
    if plan is not None and plan.bwd is not None:
        pb = plan.bwd
        ct_sorted = banded_perm_gather(ct, pb)
        dx = _dispatch_sorted_segment_sum(ct_sorted, senders_sorted,
                                          num_nodes, aligned)
        g = ct.at[pb.out_src].get(mode="promise_in_bounds")
        dx = dx + jax.ops.segment_sum(
            g * pb.out_mask[:, None].astype(g.dtype), pb.out_seg,
            num_segments=num_nodes, indices_are_sorted=True)
        return dx, None, None, None, None
    ct_sorted = ct.at[sender_perm].get(mode="promise_in_bounds")
    dx = _dispatch_sorted_segment_sum(ct_sorted, senders_sorted, num_nodes,
                                      aligned)
    return dx, None, None, None, None


_gather_senders_impl.defvjp(_gather_senders_fwd, _gather_senders_bwd)


def gather_senders(x, senders, sender_perm=None, senders_sorted=None,
                   aligned: bool = False, plan: Optional[SenderPlans] = None):
    """``x[senders]`` whose backward is a sorted segment-sum.

    ``sender_perm`` sorts edges by sender; ``senders_sorted`` = the sender
    ids in that order. Falls back to the plain gather when absent.
    ``aligned`` declares the sender-sorted stream block-aligned
    (build_graph_batch(align_edges=True)) and gates the Pallas backward.
    ``plan`` (optional, GraphBatch.sender_plan — a SenderPlans bundle)
    routes the backward's [E, h] permutation gather and/or the forward's
    [N, h] sender gather through the banded window decomposition — ~4x on
    streams past XLA's fast-gather regime (>= ~100 MB source).
    """
    if sender_perm is None or senders_sorted is None:
        return gather(x, senders)
    return _gather_senders_impl(x.shape[0], aligned, x, senders,
                                sender_perm, senders_sorted, plan)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_receivers_impl(num_nodes: int, x, receivers):
    return x.at[receivers].get(mode="promise_in_bounds",
                               indices_are_sorted=True)


def _gather_receivers_fwd(num_nodes, x, receivers):
    return _gather_receivers_impl(num_nodes, x, receivers), (receivers,)


def _gather_receivers_bwd(num_nodes, res, ct):
    (receivers,) = res
    dx = _dispatch_sorted_segment_sum(ct, receivers, num_nodes)
    return dx, None


_gather_receivers_impl.defvjp(_gather_receivers_fwd, _gather_receivers_bwd)


def gather_receivers(x, receivers, aligned: bool = False):
    """``x[receivers]`` (ascending ids) with a sorted segment-sum backward.

    Under the pallas backend with a declared block-aligned stream, both
    directions run on the Pallas one-hot kernels.
    """
    from aero_gnn_tpu import ops as _ops

    if _ops.backend() == "pallas" and aligned:
        from aero_gnn_tpu.ops import pallas_segment as PS

        if (receivers.shape[0] % PS.ET == 0 and x.shape[0] % PS.NB == 0):
            return PS.gather_receivers_pallas(x, receivers)
    return _gather_receivers_impl(x.shape[0], x, receivers)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _segment_sum_sorted_impl(num_segments: int, data, segment_ids):
    return jax.ops.segment_sum(data, segment_ids,
                               num_segments=num_segments,
                               indices_are_sorted=True)


def _segment_sum_sorted_fwd(num_segments, data, segment_ids):
    return _segment_sum_sorted_impl(num_segments, data, segment_ids), \
        (segment_ids,)


def _segment_sum_sorted_bwd(num_segments, res, ct):
    (segment_ids,) = res
    return ct.at[segment_ids].get(mode="promise_in_bounds",
                                  indices_are_sorted=True), None


_segment_sum_sorted_impl.defvjp(_segment_sum_sorted_fwd,
                                _segment_sum_sorted_bwd)


def segment_sum_sorted(data, segment_ids, num_segments: int):
    """Sorted-id segment sum whose backward is a sorted gather."""
    return _segment_sum_sorted_impl(num_segments, data, segment_ids)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _segment_pool_sum_impl(num_segments: int, data, seg_ids, perm,
                           seg_sorted):
    ds = data.at[perm].get(mode="promise_in_bounds", unique_indices=True)
    return jax.ops.segment_sum(ds, seg_sorted, num_segments=num_segments,
                               indices_are_sorted=True)


def _sps_fwd(num_segments, data, seg_ids, perm, seg_sorted):
    return _segment_pool_sum_impl(num_segments, data, seg_ids, perm,
                                  seg_sorted), (seg_ids,)


def _sps_bwd(num_segments, res, ct):
    # the transpose of sum-pooling is the unpool broadcast: a plain gather
    (seg_ids,) = res
    return ct.at[seg_ids].get(mode="promise_in_bounds"), None, None, None


_segment_pool_sum_impl.defvjp(_sps_fwd, _sps_bwd)


def segment_pool_sum(data, seg_ids, num_segments: int, *, perm, seg_sorted):
    """Segment sum over UNSORTED ``seg_ids`` via a host-precomputed stable
    sort permutation: gather-by-perm + SORTED segment sum, with a plain
    gather as the backward (the unpool broadcast).

    XLA lowers the direct unsorted scatter-add to a serial TPU path
    (measured ~70x slower than the sorted reduction — see the module
    docstring); this keeps the fine->coarse hierarchy pooling transfers
    (models/bsms.py, /root/reference/models/bsms_mgn.py:265-288 semantics)
    on sorted ops in both directions. ``perm`` = stable argsort of
    ``seg_ids``; ``seg_sorted`` = seg_ids[perm] (HierarchyLevel carries
    both, graph.hierarchy.with_pool_perms)."""
    return _segment_pool_sum_impl(num_segments, data, seg_ids, perm,
                                  seg_sorted)


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
