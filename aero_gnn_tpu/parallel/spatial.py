"""Spatial (graph) parallelism: one large mesh partitioned across devices.

The graph analogue of tensor/sequence parallelism (SURVEY §2c): nodes are
partitioned into P contiguous shards along a spatial sort order, every edge
lives on the shard of its RECEIVER (so aggregation is shard-local), and the
only cross-shard traffic is the sender-side feature exchange ("halo") once
per message-passing layer.

TPU-native halo exchange: with the concat-trick (EdgeBlockSum) layer the
node tensor crossing shards is the *projected* [N_local, h] sender features
— so the exchange is one `all_gather` of W_s·x per layer over the `graph`
ICI axis, not the raw concat inputs. XLA overlaps the gather with the local
e·W_e matmul. Gradients flow through the collective (reduce-scatter in the
transpose) automatically under shard_map.

Host-side partitioning (numpy): Morton-order sort for locality, uniform
shard sizes, per-shard edge padding — all static shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from aero_gnn_tpu.graph.order import morton_order
from aero_gnn_tpu.graph.padded import sort_edges_by_receiver, _round_up
from aero_gnn_tpu.nn import blocks as B
from aero_gnn_tpu.nn import mlp as M
from aero_gnn_tpu.parallel.xla_flags import async_jit_options


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpatialGraph:
    """One mesh partitioned into P shards; all arrays lead with [P, ...].

    ``senders_global`` indexes the concatenated [P * n_local] node order
    (shard-major), i.e. directly into the all-gathered tensor.
    """

    x: jax.Array  # [P, Nl, Dn]
    edge_attr: jax.Array  # [P, El, De]
    senders_global: jax.Array  # i32[P, El]
    receivers_local: jax.Array  # i32[P, El] in [0, Nl)
    node_mask: jax.Array  # f32[P, Nl]
    edge_mask: jax.Array  # f32[P, El]
    y: jax.Array  # [P, Nl, Dy]
    # per-shard sender sort: routes the sender gather's backward through a
    # SORTED segment sum over the gathered table (CLAUDE.md invariant —
    # XLA's gather transpose is an unsorted scatter-add); None on graphs
    # built before these fields existed (plain-gather fallback)
    sender_perm: Optional[jax.Array] = None  # i32[P, El]
    senders_sorted: Optional[jax.Array] = None  # i32[P, El]
    # static: per-shard edge streams are block-aligned (fused Pallas
    # kernels legal on the shard compute); explicit flag — divisible
    # shapes alone are unsafe (CLAUDE.md invariants)
    aligned: bool = dataclasses.field(default=False,
                                      metadata=dict(static=True))

    @property
    def num_parts(self) -> int:
        return self.x.shape[0]

    @property
    def nodes_per_part(self) -> int:
        return self.x.shape[1]


# canonical implementation lives in graph.order (shared with data.synthetic)
_morton_order = morton_order


def pack_aligned_edges(parts, num_parts, de, n_local_pad, dtype,
                       rows=None):
    """Block-align each shard's receiver-sorted (sender, recv_local, attr)
    edge stream (graph.padded._align_edge_blocks: every ALIGN_NODE_BLOCK
    node block owns whole ALIGN_EDGE_TILE-edge tiles) and pack shards to
    one padded length. Tail pad tiles point at the shard's last pad node
    (last block), mask 0 — so in-jit derive_tiles stays exact and the
    receiver stream stays sorted."""
    from aero_gnn_tpu.graph.padded import (
        ALIGN_EDGE_TILE, _align_edge_blocks)

    aligned = []
    for sp, rp, eap in parts:
        s_a, r_a, ea_a, valid, _, _ = _align_edge_blocks(
            sp.astype(np.int64), rp.astype(np.int64), eap, n_local_pad,
            dtype)
        aligned.append((s_a, r_a, ea_a, valid))
    need = max(len(a[0]) for a in aligned)
    el = _round_up(need, ALIGN_EDGE_TILE)
    if rows is not None:
        if rows < need or rows % ALIGN_EDGE_TILE:
            raise ValueError(
                f"aligned rows={rows} incompatible with required {need} "
                f"(tile {ALIGN_EDGE_TILE})")
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


def sender_sort(sc: np.ndarray):
    """Per-shard stable sender sort of a packed [P, El] sender stream ->
    (perm, sorted), for ops.gather_senders' sorted-transpose backward."""
    perm = np.argsort(sc, axis=1, kind="stable").astype(np.int32)
    return perm, np.take_along_axis(sc, perm, axis=1).astype(np.int32)


def partition_graph(
    *,
    senders: np.ndarray,
    receivers: np.ndarray,
    x: np.ndarray,
    edge_attr: np.ndarray,
    pos: np.ndarray,
    y: Optional[np.ndarray],
    num_parts: int,
    edges_pad_multiple: int = 128,
    dtype=np.float32,
    align_interior: bool = False,
) -> SpatialGraph:
    """Host-side partitioning of one REAL (unpadded) mesh into P shards.

    ``align_interior=True`` pads each shard's node count to whole
    ALIGN_NODE_BLOCK blocks and block-aligns the per-shard edge streams so
    the fused Pallas edge/node kernels run on the shard compute (gated by
    the static ``aligned`` flag)."""
    n = x.shape[0]
    order = _morton_order(pos)
    n_chunk = -(-n // num_parts)
    if align_interior:
        from aero_gnn_tpu.graph.padded import ALIGN_NODE_BLOCK

        n_local = _round_up(n_chunk + 1, ALIGN_NODE_BLOCK)
    else:
        n_local = n_chunk
    # new id: shard-major layout [P * n_local]; tail slots are dummies
    new_of_old = np.full(n, -1, dtype=np.int64)
    for p in range(num_parts):
        chunk = order[p * n_chunk:(p + 1) * n_chunk]
        new_of_old[chunk] = p * n_local + np.arange(len(chunk))

    s_new = new_of_old[senders]
    r_new = new_of_old[receivers]
    part_of_edge = r_new // n_local

    # per-shard edge lists, receiver-sorted, padded to a common length
    per_part_edges = []
    for p in range(num_parts):
        m = part_of_edge == p
        s_p, r_p, ea_p = s_new[m], r_new[m], edge_attr[m]
        perm = sort_edges_by_receiver(s_p, r_p)
        per_part_edges.append((s_p[perm], r_p[perm] - p * n_local,
                               ea_p[perm]))
    if align_interior:
        # NOTE alignment fills pad-slot senders with in-block LOCAL rows
        # (valid global-table indices of shard 0 / in-shard rows; masked)
        sg, rl, ea, em = pack_aligned_edges(
            per_part_edges, num_parts, edge_attr.shape[1], n_local, dtype)
        # pad-slot senders must stay in [0, P*n_local): pack_aligned_edges'
        # tail fill (n_local - 1) already is
    else:
        el = _round_up(
            max(max((len(t[0]) for t in per_part_edges), default=1), 1),
            edges_pad_multiple)
        sg = np.zeros((num_parts, el), dtype=np.int32)
        # sorted-safe pads: last local row, mask 0 (contributions exact 0)
        rl = np.full((num_parts, el), n_local - 1, dtype=np.int32)
        ea = np.zeros((num_parts, el, edge_attr.shape[1]), dtype=dtype)
        em = np.zeros((num_parts, el), dtype=dtype)
        for p, (s_p, r_p, ea_p) in enumerate(per_part_edges):
            k = len(s_p)
            sg[p, :k], rl[p, :k], ea[p, :k] = s_p, r_p, ea_p
            em[p, :k] = 1.0
    xs = np.zeros((num_parts, n_local, x.shape[1]), dtype=dtype)
    ys = np.zeros((num_parts, n_local,
                   y.shape[1] if y is not None else 1), dtype=dtype)
    nm = np.zeros((num_parts, n_local), dtype=dtype)
    for p in range(num_parts):
        chunk = order[p * n_chunk:(p + 1) * n_chunk]
        k = len(chunk)
        xs[p, :k] = x[chunk]
        if y is not None:
            ys[p, :k] = y[chunk]
        nm[p, :k] = 1.0

    sperm, ssort = sender_sort(sg)
    return SpatialGraph(
        x=jnp.asarray(xs), edge_attr=jnp.asarray(ea),
        senders_global=jnp.asarray(sg), receivers_local=jnp.asarray(rl),
        node_mask=jnp.asarray(nm), edge_mask=jnp.asarray(em),
        y=jnp.asarray(ys), sender_perm=jnp.asarray(sperm),
        senders_sorted=jnp.asarray(ssort), aligned=align_interior)


# ---------------------------------------------------------------------------
# sharded MGN forward
# ---------------------------------------------------------------------------

def _fused_spatial_ok(cfg: B.MGNLayerConfig, x, receivers_local,
                      aligned: bool) -> bool:
    """Gate for the fused Pallas per-shard compute (mirrors
    nn.blocks._fused_layer_ok): requires partition_graph's align_interior
    layout — divisible shapes alone are unsafe."""
    from aero_gnn_tpu import ops as _ops
    from aero_gnn_tpu.ops import pallas_segment as PS

    return (aligned and _ops.backend() == "pallas"
            and cfg.do_concat_trick
            and cfg.edge_sum_activation == "relu"
            and x.shape[0] % PS.NB == 0
            and receivers_local.shape[-1] % PS.ET == 0)


def _spatial_layer(layer_params, cfg: B.MGNLayerConfig, x, e,
                   senders_global, receivers_local, edge_mask,
                   axis: str, sender_perm=None, senders_sorted=None,
                   aligned: bool = False):
    """One MGN layer on a shard; one all_gather per layer for sender halos.
    Sender gathers route through ops.gather_senders when the shard carries
    a sender sort (sorted segment-sum backward). With the align_interior
    layout the edge chain + aggregation runs on the fused Pallas kernels
    (single-chip speed per shard)."""
    from aero_gnn_tpu import ops

    n_local = x.shape[0]
    if _fused_spatial_ok(cfg, x, receivers_local, aligned):
        from aero_gnn_tpu.ops.pallas_fused import fused_edge_layer

        p = layer_params["edge"]
        s_proj = x @ p["w_s"]
        d_proj = x @ p["w_d"] + p["b"]
        all_s = jax.lax.all_gather(s_proj, axis, tiled=True)  # [P*Nl, h]
        sg_rows = ops.gather_senders(all_s, senders_global, sender_perm,
                                     senders_sorted)
        h = s_proj.shape[1]
        ws = (jnp.stack([st["w"] for st in p["stack"][:-1]])
              if len(p["stack"]) > 1
              else jnp.zeros((0, h, h), s_proj.dtype))
        bs = (jnp.stack([st["b"] for st in p["stack"][:-1]])
              if len(p["stack"]) > 1
              else jnp.zeros((0, h), s_proj.dtype))
        e, agg = fused_edge_layer(
            e, sg_rows, d_proj, edge_mask, receivers_local,
            p["w_e"], ws, bs, p["stack"][-1]["w"], p["stack"][-1]["b"],
            p["ln"]["scale"], p["ln"]["bias"], n_local,
            cfg.edge_sum_activation)
        if cfg.aggregation == "mean":
            deg = jax.ops.segment_sum(edge_mask, receivers_local,
                                      num_segments=n_local,
                                      indices_are_sorted=True)
            agg = agg / jnp.maximum(deg, 1.0)[:, None]
        elif cfg.aggregation != "add":
            raise ValueError(
                f"Unsupported aggregation method: {cfg.aggregation}")
        x = B.node_block_post_residual(layer_params["node"], cfg, x, agg)
        return x, e
    if cfg.do_concat_trick:
        p = layer_params["edge"]
        e_proj = e @ p["w_e"]
        s_proj = x @ p["w_s"]
        d_proj = x @ p["w_d"] + p["b"]
        all_s = jax.lax.all_gather(s_proj, axis, tiled=True)  # [P*Nl, h]
        h0 = (e_proj
              + ops.gather_senders(all_s, senders_global, sender_perm,
                                   senders_sorted)
              + d_proj.at[receivers_local].get(mode="promise_in_bounds"))
        delta_e = B.edge_block_sum_post(p, h0, cfg)
    else:
        all_x = jax.lax.all_gather(x, axis, tiled=True)  # [P*Nl, h]
        x_src = ops.gather_senders(all_x, senders_global, sender_perm,
                                   senders_sorted)
        x_dst = x.at[receivers_local].get(mode="promise_in_bounds")
        edge_input = jnp.concatenate([e, x_src, x_dst], axis=-1)
        delta_e = M.mlp_apply(layer_params["edge"], edge_input,
                              activation=cfg.activation)
    e = e + delta_e

    msgs = e * edge_mask[:, None]
    agg = jax.ops.segment_sum(msgs, receivers_local, num_segments=n_local,
                              indices_are_sorted=True)
    if cfg.aggregation == "mean":
        deg = jax.ops.segment_sum(edge_mask, receivers_local,
                                  num_segments=n_local,
                                  indices_are_sorted=True)
        agg = agg / jnp.maximum(deg, 1.0)[:, None]
    elif cfg.aggregation != "add":
        raise ValueError(f"Unsupported aggregation method: {cfg.aggregation}")
    x = x + B.node_block_post(layer_params["node"], cfg, x, agg)
    return x, e


def spatial_mgn_forward(params, cfg, sg_block: SpatialGraph,
                        *, axis: str = "graph") -> jax.Array:
    """Per-shard MGN forward (call inside shard_map over ``axis``).

    ``sg_block`` fields are the SINGLE-shard slices (leading [P,...] axis
    already stripped). Uses the same parameter pytree as MGNConfig.
    """
    from aero_gnn_tpu.models.mgn import _cast, cast_params
    dt = getattr(cfg, "compute_dtype", "float32")
    params = cast_params(params, dt)
    if dt != "float32":
        sg_block = dataclasses.replace(
            sg_block, x=_cast(sg_block.x, dt),
            edge_attr=_cast(sg_block.edge_attr, dt),
            edge_mask=_cast(sg_block.edge_mask, dt))
    x = M.mlp_apply(params["node_encoder"], sg_block.x,
                    activation=cfg.activation)
    e = M.mlp_apply(params["edge_encoder"], sg_block.edge_attr,
                    activation=cfg.activation)
    layer_cfg = cfg.layer_cfg

    def body(carry, layer_params):
        x, e = carry
        x, e = _spatial_layer(layer_params, layer_cfg, x, e,
                              sg_block.senders_global,
                              sg_block.receivers_local,
                              sg_block.edge_mask, axis,
                              sg_block.sender_perm,
                              sg_block.senders_sorted,
                              aligned=sg_block.aligned)
        return (x, e), None

    if getattr(cfg, "remat", True):
        body = jax.checkpoint(body)
    from aero_gnn_tpu.models.mgn import scan_layers
    x, e = scan_layers(body, (x, e), params["layers"],
                       unroll=getattr(cfg, "unroll", False))
    return M.mlp_apply(params["decoder"], x,
                       activation=cfg.activation).astype(jnp.float32)


def spatial_model_forward(params, model_cfg, sg_block: SpatialGraph, *,
                          axis: str = "graph") -> jax.Array:
    """Model-kind dispatch for the spatially partitioned forward.

    Supports MGN (base), FourierMGN (local feature transform), and PoolMGN
    (global context via cross-shard masked-mean psum — the single-mesh
    analogue of per-graph pooling).
    """
    from aero_gnn_tpu.models.fouriermgn import FourierMGNConfig, fourier_embedding
    from aero_gnn_tpu.models.poolmgn import PoolMGNConfig

    if isinstance(model_cfg, FourierMGNConfig):
        emb = fourier_embedding(
            sg_block.x, dims=model_cfg.fourier_features_dim,
            freq_start=model_cfg.fourier_freq_start,
            freq_length=model_cfg.fourier_freq_length)
        sg_block = dataclasses.replace(
            sg_block, x=jnp.concatenate([sg_block.x, emb], axis=-1))
        return spatial_mgn_forward(params, model_cfg, sg_block, axis=axis)

    if isinstance(model_cfg, PoolMGNConfig):
        g = M.mlp_apply(params["global_encoder"], sg_block.x,
                        activation=model_cfg.activation)
        m = sg_block.node_mask[:, None]
        if model_cfg.global_pool_method == "mean":
            s = jax.lax.psum(jnp.sum(g * m, axis=0), axis)
            cnt = jax.lax.psum(jnp.sum(sg_block.node_mask), axis)
            pooled = s / jnp.maximum(cnt, 1.0)
        elif model_cfg.global_pool_method in ("add", "sum"):
            pooled = jax.lax.psum(jnp.sum(g * m, axis=0), axis)
        elif model_cfg.global_pool_method == "max":
            neg = jnp.finfo(g.dtype).min
            local = jnp.max(jnp.where(m > 0, g, neg), axis=0)
            pooled = jax.lax.pmax(local, axis)
        else:
            raise ValueError(
                f"Unsupported global pooling method: "
                f"{model_cfg.global_pool_method}")
        x_in = jnp.concatenate(
            [sg_block.x,
             jnp.broadcast_to(pooled[None], (sg_block.x.shape[0],
                                             pooled.shape[0]))], axis=-1)
        sg_block = dataclasses.replace(sg_block, x=x_in)
        return spatial_mgn_forward(params, model_cfg, sg_block, axis=axis)

    return spatial_mgn_forward(params, model_cfg, sg_block, axis=axis)


def make_spatial_forward(model_cfg, mesh: Mesh, *, axis: str = "graph"):
    """jitted SpatialGraph -> [P, Nl, Dy] predictions over the mesh axis."""

    def per_shard(params, sg):
        sg = jax.tree.map(lambda a: a[0], sg)
        out = spatial_model_forward(params, model_cfg, sg, axis=axis)
        return out[None]

    specs = P(axis)
    fwd = shard_map(per_shard, mesh=mesh,
                    in_specs=(P(), specs), out_specs=specs,
                    check_vma=False)
    return jax.jit(fwd, compiler_options=async_jit_options(mesh))


def make_spatial_train_step(model_cfg, optimizer, mesh: Mesh,
                            *, axis: str = "graph"):
    """jitted spatially-parallel train step: per-shard forward, globally
    masked MSE (psum over shards), grad psum, replicated params update."""
    import optax

    def per_shard(params, opt_state, sg):
        sg_l = jax.tree.map(lambda a: a[0], sg)

        def loss_fn(p):
            pred = spatial_mgn_forward(p, model_cfg, sg_l, axis=axis)
            m = sg_l.node_mask[:, None]
            se = jnp.sum(jnp.square(pred - sg_l.y) * m)  # LOCAL numerator
            cnt = jax.lax.psum(jnp.sum(m) * sg_l.y.shape[-1], axis)
            # this shard's SHARE of the global loss. Do NOT psum the
            # numerator inside the differentiated function: psum transposes
            # to psum, so a psum'd loss seeds every shard's backward with
            # the SUM of the per-shard seeds and the final grad all-reduce
            # comes out P x too large (caught by the ground-truth gradient
            # tests in tests/test_parallel.py). The count psum is safe —
            # no parameter path runs through it.
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # per-shard grads/losses hold partial contributions: SUM them
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
