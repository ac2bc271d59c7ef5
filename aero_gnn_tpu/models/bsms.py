"""Bi-Strided multi-scale MeshGraphNet (U-Net over graph hierarchies).

Re-design of /root/reference/models/bsms_mgn.py:9-306. The reference derives
its coarsening dynamically inside forward (per-graph Python loop + argsort +
torch.unique — bsms_mgn.py:217-301); here the hierarchy is PRECOMPUTED host
data (graph.hierarchy.build_hierarchy) and forward is pure static-shape
segment math:

  down:   x_c = segment_mean(x_f by fine_to_coarse)       (bsms_mgn.py:265)
          e_c = segment_mean(e_f by edge_to_coarse)       (bsms_mgn.py:283)
  up:     x_f = x_c[fine_to_coarse] + skip_x              (bsms_mgn.py:199-200)
          fine e / connectivity restored from the skip    (bsms_mgn.py:202-206)

Layer budget parity (bsms_mgn.py:68-81): ``layers_per_scale`` MGN layers per
down/up stage, bottleneck gets max(1, processor_size - 2*sum(down)).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from aero_gnn_tpu.graph.padded import GraphBatch
from aero_gnn_tpu.graph.hierarchy import HierarchyLevel
from aero_gnn_tpu.models.mgn import MGNConfig, run_processor, _sub
from aero_gnn_tpu.nn import blocks as B
from aero_gnn_tpu.nn import mlp as M
from aero_gnn_tpu.ops import (
    gather_senders,
    segment_mean,
    segment_pool_sum,
)


def _wec_weight(w: jax.Array, dt) -> jax.Array:
    """Conv/length weights stay f32 by default (products promote, segment
    sums accumulate in f32 — exact parity with the reference semantics).
    AERO_GNN_WEC_DTYPE=compute casts them to the compute dtype first so
    the [E, h] stream multiply stays bf16 (half the HBM bytes) — a perf
    mode measured in benchmarks/ablate_wec.py; only changes numerics on
    bf16 runs. NOTE: this contract governs the separate-multiply path
    only — the fused path (AERO_GNN_WEC_FUSED, default on, Pallas
    aligned streams) folds the weight into the aggregation kernel's
    one-hot select, where it participates at the compute dtype
    regardless of AERO_GNN_WEC_DTYPE (the select constant takes
    messages.dtype; accumulation stays f32 via the MXU)."""
    import os

    if os.environ.get("AERO_GNN_WEC_DTYPE") == "compute":
        return w.astype(dt)
    return w


def _wec_fused_enabled() -> bool:
    """AERO_GNN_WEC_FUSED (default on): fold the conv weight into the
    Pallas aggregation kernel's one-hot select (ops.aggregate_edges_
    weighted) instead of materializing the weighted [E, h] stream in HBM
    — the f32 weight x bf16 stream product wrote a full f32 [E, h] buffer
    between the gather and the aggregation kernel. Weight precision on
    the fused path follows the compute dtype (the WEC_DTYPE=compute
    semantics); set 0 for the separate-multiply f32 path."""
    import os

    return os.environ.get("AERO_GNN_WEC_FUSED", "1") == "1"


def _wec_A_raw(aligned, x, cs, ce, senders, receivers):
    """A x: receiver-sorted WeightedEdgeConv aggregation (fast forward —
    one small-table [N,h] gather + one Pallas MXU aggregation when the
    stream is block-aligned)."""
    from aero_gnn_tpu import ops as _ops

    xs = x.at[senders].get(mode="promise_in_bounds")
    if _wec_fused_enabled():
        return cs[:, None] * x + _ops.aggregate_edges_weighted(
            xs, ce, receivers, x.shape[0], aligned=aligned)
    return cs[:, None] * x + _ops.aggregate_edges(
        ce[:, None] * xs, receivers, x.shape[0], aggregation="add",
        aligned=aligned)


def _wec_At_raw(aligned, y, cs, ce, ce_t, senders, receivers, sperm, ssort):
    """A^T y: the exact transpose. On UNDIRECTED mesh streams the
    transposed conv equals the FORWARD conv with reverse-edge-permuted
    weights (conv_edge_t, host-precomputed: rev(e) swaps an edge with its
    opposite, so summing over senders of e == summing over receivers of
    rev(e)) — the adjoint rides the identical receiver-sorted fast path,
    zero run-time reorders. Fallback for asymmetric streams: reorder on
    the sender-sorted view ([E] index gathers — XLA's kCustom 1-D gather
    runs at ~40M rows/s, measured 8.8 ms/step at 65k, which is why the
    symmetric path exists)."""
    from aero_gnn_tpu import ops as _ops

    if ce_t is not None:
        return _wec_A_raw(aligned, y, cs, ce_t, senders, receivers)
    if sperm is None or ssort is None:
        zr = y.at[receivers].get(mode="promise_in_bounds")
        return cs[:, None] * y + jax.ops.segment_sum(
            ce[:, None] * zr, senders, num_segments=y.shape[0])
    recv_s = receivers.at[sperm].get(mode="promise_in_bounds")
    ce_s = ce.at[sperm].get(mode="promise_in_bounds")
    ys = y.at[recv_s].get(mode="promise_in_bounds")
    if _wec_fused_enabled():
        return cs[:, None] * y + _ops.aggregate_edges_weighted(
            ys, ce_s, ssort, y.shape[0], aligned=aligned)
    return cs[:, None] * y + _ops.aggregate_edges(
        ce_s[:, None] * ys, ssort, y.shape[0], aggregation="add",
        aligned=aligned)


def _wec_zero_tangents():
    # index/weight operands carry no gradients (hierarchy constants);
    # None = symbolic zero (repo custom_vjp convention, ops/scatter.py)
    return (None, None, None, None, None, None, None)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wec_A_op(aligned, x, cs, ce, ce_t, senders, receivers, sperm, ssort):
    return _wec_A_raw(aligned, x, cs, ce, senders, receivers)


def _wec_A_fwd(aligned, x, cs, ce, ce_t, senders, receivers, sperm, ssort):
    return _wec_A_raw(aligned, x, cs, ce, senders, receivers), \
        (cs, ce, ce_t, senders, receivers, sperm, ssort)


def _wec_A_bwd(aligned, res, ct):
    cs, ce, ce_t, senders, receivers, sperm, ssort = res
    dx = _wec_At_raw(aligned, ct, cs, ce, ce_t, senders, receivers, sperm,
                     ssort)
    return (dx,) + _wec_zero_tangents()


_wec_A_op.defvjp(_wec_A_fwd, _wec_A_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wec_At_op(aligned, z, cs, ce, ce_t, senders, receivers, sperm, ssort):
    return _wec_At_raw(aligned, z, cs, ce, ce_t, senders, receivers, sperm,
                       ssort)


def _wec_At_fwd(aligned, z, cs, ce, ce_t, senders, receivers, sperm, ssort):
    return _wec_At_raw(aligned, z, cs, ce, ce_t, senders, receivers, sperm,
                       ssort), (cs, ce, ce_t, senders, receivers, sperm,
                                ssort)


def _wec_At_bwd(aligned, res, ct):
    cs, ce, ce_t, senders, receivers, sperm, ssort = res
    dz = _wec_A_raw(aligned, ct, cs, ce, senders, receivers)
    return (dz,) + _wec_zero_tangents()


_wec_At_op.defvjp(_wec_At_fwd, _wec_At_bwd)


def wec_aggregate(level: HierarchyLevel, x: jax.Array, senders, receivers,
                  sperm=None, ssort=None, aligned: bool = False) -> jax.Array:
    """WeightedEdgeConv neighborhood aggregation on FINE node rows.

    x~_i = conv_self[i] x_i + sum_{e: recv(e)=i} conv_edge[e] x_{send(e)};
    rows sum to 1 (graph.hierarchy._conv_weights), so constant fields are
    preserved exactly. conv weights are f32 and zero on pad rows — products
    promote, the aggregation accumulates in f32, no masking needed.

    The conv and its adjoint are a mutually-transposed custom-VJP pair:
    every direction of every pass is one small-table [N,h] gather plus one
    sorted (Pallas MXU when aligned) aggregation — the naive autodiff
    route materializes [E,h] permutation gathers that run on XLA's
    row-rate-bound scatter/gather fusions (~100M rows/s, measured +27%
    on the 65k BSMS step before this, benchmarks/ablate_wec.py)."""
    cs = _wec_weight(level.conv_self, x.dtype)
    ce = _wec_weight(level.conv_edge, x.dtype)
    ce_t = (None if level.conv_edge_t is None
            else _wec_weight(level.conv_edge_t, x.dtype))
    return _wec_A_op(aligned, x, cs, ce, ce_t, senders, receivers, sperm,
                     ssort)


def wec_down(level: HierarchyLevel, x: jax.Array, senders, receivers,
             sperm=None, ssort=None, aligned: bool = False,
             pool=None) -> jax.Array:
    """Weighted fine->coarse node transfer (canonical BSMS-GNN): conv, then
    select each coarse node's representative fine node (rep_mask marks
    exactly one per coarse node). ``pool`` overrides the segment-sum used
    for the selection (models pass their sorted-pool closure)."""
    agg = wec_aggregate(level, x, senders, receivers, sperm, ssort, aligned)
    sel = agg * _wec_weight(level.rep_mask, agg.dtype)[:, None]
    if pool is not None:
        return pool(sel)
    return jax.ops.segment_sum(sel, level.fine_to_coarse,
                               num_segments=level.num_coarse_nodes_pad)


def wec_up(level: HierarchyLevel, xc_fine: jax.Array, senders, receivers,
           sperm=None, ssort=None, aligned: bool = False) -> jax.Array:
    """Weighted coarse->fine transfer — the EXACT adjoint of wec_down.

    ``xc_fine`` is the coarse tensor already gathered onto fine rows
    (x_c[fine_to_coarse]). Place each coarse value at its representative
    (z = rep_mask * xc_fine), then the TRANSPOSED conv spreads it over the
    fine neighborhood with the same weights:
      y[i] = conv_self[i] z[i] + sum_{e: send(e)=i} conv_edge[e] z[recv(e)].
    Runs as _wec_At_op: gather z by receivers-in-sender-order (small
    table) + one sorted/Pallas aggregation over ascending sender ids, with
    the receiver-sorted conv as its custom-VJP backward (see
    wec_aggregate). Aligned sender streams may repeat a masked pad row,
    whose conv_edge is 0, so those slots contribute exactly zero."""
    z = xc_fine * _wec_weight(level.rep_mask, xc_fine.dtype)[:, None]
    cs = _wec_weight(level.conv_self, z.dtype)
    ce = _wec_weight(level.conv_edge, z.dtype)
    ce_t = (None if level.conv_edge_t is None
            else _wec_weight(level.conv_edge_t, z.dtype))
    return _wec_At_op(aligned, z, cs, ce, ce_t, senders, receivers, sperm,
                      ssort)


def _sorted_pool_enabled() -> bool:
    """Gate for the sorted hierarchy-transfer path (segment_pool_sum +
    sorted unpool transpose). Default OFF: measured neutral on TPU
    (103.37 vs 102.86 ms/step, benchmarks/ablate_pool.py) — XLA's
    unsorted scatter does not hit its serial path at these fine->coarse
    shapes, unlike the edge-level gather transposes (ops/scatter.py).
    Kept selectable (AERO_GNN_SORTED_POOL=1) for layouts where it does."""
    import os

    return os.environ.get("AERO_GNN_SORTED_POOL", "0") == "1"


@dataclasses.dataclass(frozen=True)
class BSMSConfig(MGNConfig):
    num_scales: int = 3
    layers_per_scale: int = 2
    stride: int = 2
    hierarchy_mode: str = "stride"  # "stride" (reference parity) | "bistride"
    # fine->coarse transfer: "mean" (reference parity, bsms_mgn.py:265) |
    # "weighted" — the canonical BSMS-GNN WeightedEdgeConv (Cao et al. 2023;
    # the in-tree reference bsms_mgn.py:265-288 uses the scatter_mean
    # simplification). Down: one mass-normalized aggregation over the FINE
    # edge stream (conv_self/conv_edge, precomputed from geometric node
    # masses on host — graph.hierarchy._conv_weights) followed by selection
    # of each coarse node's representative fine node (rep_mask). Up: the
    # exact adjoint — place the coarse value at the representative, then the
    # TRANSPOSED conv spreads it over the fine neighborhood with the same
    # weights (the paper aggregates "in reverse direction with the same
    # edge weights"). Coarse edge features use a length-weighted mean
    # (HierarchyLevel.edge_weights) instead of the count mean.
    transfer: str = "mean"

    @property
    def down_counts(self) -> Sequence[int]:
        return [self.layers_per_scale] * max(self.num_scales - 1, 0)

    @property
    def bottleneck_count(self) -> int:
        return max(1, self.processor_size - 2 * sum(self.down_counts))

    def init(self, key: jax.Array, dtype=jnp.float32):
        kn, ke, kd, kstages = jax.random.split(key, 4)
        node_enc = M.mlp_init(
            kn, self.input_node_dim, self.hidden_dim_node_encoder,
            self.hidden_dim_processor,
            num_hidden_layers=self.num_hidden_layers_node_encoder,
            use_layer_norm=True, dtype=dtype)
        edge_enc = M.mlp_init(
            ke, self.input_edge_dim, self.hidden_dim_edge_encoder,
            self.hidden_dim_processor,
            num_hidden_layers=self.num_hidden_layers_edge_encoder,
            use_layer_norm=True, dtype=dtype)
        decoder = M.mlp_init(
            kd, self.hidden_dim_processor, self.hidden_dim_decoder,
            self.output_node_dim,
            num_hidden_layers=self.num_hidden_layers_decoder,
            use_layer_norm=False, dtype=dtype)

        def stack(key, count):
            keys = jax.random.split(key, count)
            layers = [B.mgn_layer_init(k, self.layer_cfg, dtype) for k in keys]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

        n_stages = 2 * len(self.down_counts) + 1
        stage_keys = jax.random.split(kstages, max(n_stages, 1))
        down = [stack(stage_keys[i], c) for i, c in enumerate(self.down_counts)]
        bottleneck = stack(stage_keys[len(self.down_counts)],
                           self.bottleneck_count)
        up = [stack(stage_keys[len(self.down_counts) + 1 + i], c)
              for i, c in enumerate(reversed(self.down_counts))]
        return {"node_encoder": node_enc, "edge_encoder": edge_enc,
                "down": down, "bottleneck": bottleneck, "up": up,
                "decoder": decoder}

    def apply(self, params, graph: GraphBatch, *,
              hierarchy: Tuple[HierarchyLevel, ...],
              rng: Optional[jax.Array] = None) -> jax.Array:
        if len(hierarchy) != self.num_scales - 1:
            raise ValueError(
                f"hierarchy has {len(hierarchy)} levels, expected "
                f"{self.num_scales - 1}")
        # The level-0 (fine) streams inherit the GraphBatch's block
        # alignment; coarse-level streams are aligned too when the
        # hierarchy went through graph.hierarchy.align_hierarchy (the
        # loader's pallas path), so the fused kernels run on every scale.
        # Unaligned hierarchies (built directly via build_hierarchy) keep
        # coarse levels on the XLA ops.
        return self._apply(params, graph, hierarchy, rng)

    def _apply(self, params, graph, hierarchy, rng):
        x = M.mlp_apply(params["node_encoder"], graph.x,
                        activation=self.activation, dropout=self.dropout,
                        rng=_sub(rng, 0))
        e = M.mlp_apply(params["edge_encoder"], graph.edge_attr,
                        activation=self.activation, dropout=self.dropout,
                        rng=_sub(rng, 1))
        if self.dropout > 0.0 and rng is not None:
            k1, k2 = jax.random.split(_sub(rng, 2))
            x = _dropout(x, self.dropout, k1)
            e = _dropout(e, self.dropout, k2)

        senders, receivers = graph.senders, graph.receivers
        node_mask, edge_mask = graph.node_mask, graph.edge_mask
        sperm, ssort = graph.sender_perm, graph.senders_sorted
        splan = graph.sender_plan
        aligned = graph.edges_aligned
        skips = []

        # ---- down path ----
        for s, level in enumerate(hierarchy):
            x, e = run_processor(params["down"][s], self.layer_cfg, x, e,
                                 senders, receivers, edge_mask,
                                 sender_perm=sperm, senders_sorted=ssort,
                                 sender_plan=splan,
                                 remat=self.remat,
                                 remat_policy=self.remat_policy,
                                 aligned=aligned, unroll=self.unroll)
            skips.append((x, e, senders, receivers, edge_mask, sperm, ssort,
                          splan, aligned))
            # fine->coarse transfers ride SORTED segment sums when the
            # level carries pool perms (ops.segment_pool_sum — XLA's
            # unsorted scatter-add is a serial TPU path); the jnp fallback
            # keeps hierarchies built without with_pool_perms working
            sorted_pool = _sorted_pool_enabled() \
                and level.node_pool_perm is not None

            def _pool_nodes(v):
                if sorted_pool:
                    return segment_pool_sum(
                        v, level.fine_to_coarse,
                        level.num_coarse_nodes_pad,
                        perm=level.node_pool_perm,
                        seg_sorted=level.node_pool_sorted)
                return jax.ops.segment_sum(
                    v, level.fine_to_coarse,
                    num_segments=level.num_coarse_nodes_pad)

            def _pool_edges(v):
                if sorted_pool:
                    return segment_pool_sum(
                        v, level.edge_to_coarse,
                        level.num_coarse_edges_pad,
                        perm=level.edge_pool_perm,
                        seg_sorted=level.edge_pool_sorted)
                return jax.ops.segment_sum(
                    v, level.edge_to_coarse,
                    num_segments=level.num_coarse_edges_pad)

            # masks/weights stay f32 so the products promote and the segment
            # sums ACCUMULATE in f32 (segment_mean's behavior — bf16 sums
            # lose precision for high-multiplicity coarse targets); the
            # results are cast back to the compute dtype — the f32 promotion
            # used to leak into every coarse level, silently running the
            # coarse processors (incl. the fused kernels) in f32
            dt = x.dtype
            if self.transfer == "weighted":
                x = wec_down(level, x, senders, receivers, sperm, ssort,
                             aligned, pool=_pool_nodes).astype(dt)
            else:
                x = _pool_nodes(x * node_mask[:, None])
                cnt = _pool_nodes(node_mask)
                x = (x / jnp.maximum(cnt, 1.0)[:, None]).astype(dt)
            if self.transfer == "weighted":
                # length-weighted coarse edge features (edge_weights are
                # fine edge lengths, zero on pads)
                w_e = _wec_weight(level.edge_weights * edge_mask, dt)
                es = _pool_edges(e * w_e[:, None])
                wsum = _pool_edges(w_e)
                e = (es / jnp.maximum(wsum, 1e-12)[:, None]).astype(dt)
            elif sorted_pool:
                es = _pool_edges(e * edge_mask[:, None])
                ecnt = _pool_edges(edge_mask)
                e = (es / jnp.maximum(ecnt, 1.0)[:, None]).astype(dt)
            else:
                e = segment_mean(e, level.edge_to_coarse,
                                 level.num_coarse_edges_pad, mask=edge_mask,
                                 indices_are_sorted=False).astype(dt)
            senders, receivers = level.senders, level.receivers
            node_mask, edge_mask = level.node_mask, level.edge_mask
            sperm, ssort = level.sender_perm, level.senders_sorted
            splan = None  # coarse streams are small; plain gather is optimal
            # coarse streams are block-aligned when the hierarchy went
            # through graph.hierarchy.align_hierarchy (loader does this
            # under the pallas backend) — then the fused kernels run on
            # every scale, not just the finest
            aligned = level.edges_aligned

        # ---- bottleneck ----
        x, e = run_processor(params["bottleneck"], self.layer_cfg, x, e,
                             senders, receivers, edge_mask,
                             sender_perm=sperm, senders_sorted=ssort,
                             sender_plan=splan,
                             remat=self.remat,
                             remat_policy=self.remat_policy,
                             aligned=aligned, unroll=self.unroll)

        # ---- up path ----
        for i in range(len(hierarchy)):
            level = hierarchy[-(i + 1)]
            (skip_x, skip_e, senders, receivers, edge_mask,
             sperm, ssort, splan, aligned) = skips[-(i + 1)]
            if _sorted_pool_enabled() and level.node_pool_perm is not None:
                # unpool gather with a sorted-transpose backward (the raw
                # gather's autodiff transpose is an unsorted scatter-add)
                xc = gather_senders(x, level.fine_to_coarse,
                                    level.node_pool_perm,
                                    level.node_pool_sorted, aligned=False)
            else:
                xc = x.at[level.fine_to_coarse].get(
                    mode="promise_in_bounds")
            if self.transfer == "weighted":
                xc = wec_up(level, xc, senders, receivers, sperm, ssort,
                            aligned).astype(xc.dtype)
            x = xc + skip_x
            e = skip_e
            x, e = run_processor(params["up"][i], self.layer_cfg, x, e,
                                 senders, receivers, edge_mask,
                                 sender_perm=sperm, senders_sorted=ssort,
                                 sender_plan=splan,
                                 remat=self.remat,
                                 remat_policy=self.remat_policy,
                                 aligned=aligned, unroll=self.unroll)

        return M.mlp_apply(params["decoder"], x, activation=self.activation)


def _dropout(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
