"""Pallas TPU kernel: block-aligned segment aggregation (the SpMM half).

The edge layout is destination-sorted and block-aligned
(graph.padded.build_graph_batch(align_edges=True)): every 128-node output
block owns a whole number of 128-edge tiles, ``tile_block[t]`` maps tile ->
node block and ``tile_first[t]`` flags each block's first tile.

Kernel: 1-D grid over edge tiles; each step computes a one-hot matmul
``onehot(local_dst)^T @ msgs`` on the MXU ([128,128]x[128,h]) and
accumulates into the output node block, which Pallas keeps resident in VMEM
while consecutive tiles target the same block (output revisiting). The
one-hot's "wasted" FLOPs ride the otherwise-idle MXU — the op is
HBM-bandwidth-bound (reads each message row exactly once).

Mask semantics match torch_scatter ``dim_size`` (pad edges contribute
zeros; empty blocks produce zero rows). Backward (via custom VJP) is the
sorted gather ``ct[receivers] * mask``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aero_gnn_tpu.graph.padded import ALIGN_EDGE_TILE, ALIGN_NODE_BLOCK

NB = ALIGN_NODE_BLOCK  # output rows per node block
ET = ALIGN_EDGE_TILE   # edges per tile


def onehot_premask_enabled() -> bool:
    """AERO_GNN_ONEHOT: "premask" (default) folds the pad-edge mask into the
    receiver stream OUTSIDE the kernel (pad edges -> receiver -1, which falls
    outside every block's [0, NB) local range, so the one-hot row is all
    zeros without an in-kernel mask multiply). "mask" = legacy in-kernel
    [ET, NB] mask multiply + separate mask stream. The premask form removes
    one full-width VPU op per one-hot and the mask DMA from the serial
    per-tile chain."""
    import os

    return os.environ.get("AERO_GNN_ONEHOT", "premask") != "mask"


def premask_receivers(receivers: jax.Array, mask: jax.Array) -> jax.Array:
    """Fold the pad-edge mask into the receiver stream (pad -> -1). The
    result is ONLY for in-kernel one-hot construction — tile->block
    derivation (derive_tiles) must keep using the raw receivers."""
    return jnp.where(mask != 0, receivers,
                     jnp.int32(-1)).astype(receivers.dtype)


def build_onehot(recv_tile, base, dtype, mask_tile=None):
    """Shared in-kernel one-hot: rows = edges of the tile (inferred from
    ``recv_tile``), cols = local node ids of the block at ``base``. Built in
    f32 and cast by default: an i1-mask select straight into bf16 trips a
    Mosaic relayout bug ((8,128) vs (16,128) tiling) — set
    AERO_GNN_ONEHOT=premask_direct to probe whether the toolchain still has
    it (saves the [rows, NB] cast). With premasked receivers (mask_tile
    None) pad rows are already all-zero because their local id (-1 - base)
    matches no column."""
    import os

    rows = recv_tile.shape[0]
    local = recv_tile - base
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, NB), 1)
    if (mask_tile is None and dtype != jnp.float32
            and os.environ.get("AERO_GNN_ONEHOT") == "premask_direct"):
        return jnp.where(local == cols, jnp.ones((), dtype),
                         jnp.zeros((), dtype))
    eq = jnp.where(local == cols, 1.0, 0.0)
    if mask_tile is not None:
        eq = eq * mask_tile.astype(jnp.float32)
    return eq.astype(dtype)


def build_onehot_t(recv_row, base, dtype):
    """TRANSPOSED one-hot [NB, edges] from a ROW-layout receiver tile
    ``recv_row`` [1, edges] (premasked: pad edges -> -1).

    Why rows: an [E, 1] int32 operand is stored T(8,128)-tiled in HBM —
    128x padding — so every [ET, 1] block DMA moves ET*128*4 bytes (512 KB
    at ET=1024, ~2x the actual bf16 edge-tile traffic) and the buffer
    itself is 128x oversized (2 GB at 4M edges). A [n_tiles, ET] row
    layout stores the same data exactly and the transposed one-hot keeps
    every compare lane-aligned, with the consuming matmuls just flipping
    their contraction dims (MXU handles both)."""
    edges = recv_row.shape[1]
    local = recv_row - base  # [1, edges]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, edges), 0)
    eq = jnp.where(local == rows_iota, 1.0, 0.0)
    return eq.astype(dtype)


def recv_rows(receivers_premasked: jax.Array) -> jax.Array:
    """[E] premasked receivers -> [n_tiles, 1, ET] row layout (see
    build_onehot_t; the singleton sublane dim satisfies the TPU lowering's
    block-shape rule — sublane block == array dim)."""
    return receivers_premasked.reshape(-1, 1, ET)


def onehot_precomp_enabled() -> bool:
    """AERO_GNN_ONEHOT=precomp: materialize the full [n_tiles, NB, ET]
    transposed one-hot in HBM once per program (it is a pure function of
    the STATIC receiver stream, so XLA CSEs the per-layer builds and
    hoists the result out of the step loop) and DMA one [NB, ET] block
    per tile instead of building it on the VPU. Trades ~NB*ET*2 bytes of
    prefetchable HBM traffic per tile (which rides the kernels' spare
    bandwidth — they sit well above their HBM floors) for the per-tile
    compare+select+cast chain that is serialized on the in-order core's
    issue stream ahead of the dependent matmuls.

    Measured +7.5% SLOWER at 65k (BASELINE.md negative results) — kept as
    an opt-in probe. FOOTPRINT WARNING: the HBM operand is
    n_tiles*NB*ET*2 bytes bf16 (~0.5 GB per 1M edges) and is built
    independently in the fwd and bwd wrappers per layer, relying on XLA
    CSE across the custom_vjp/remat boundary; on the memory-tight >=262k
    meshes this risks OOM (precomp_onehot_t warns above 512 tiles)."""
    import os

    return os.environ.get("AERO_GNN_ONEHOT", "premask") == "precomp"


def precomp_onehot_t(recv2d: jax.Array, tile_block: jax.Array,
                     dtype) -> jax.Array:
    """[n_tiles, NB, ET] transposed one-hot from the [n_tiles, 1, ET]
    premasked row-layout receivers (see onehot_precomp_enabled). Pad
    edges carry receiver -1: outside every block's local range, so their
    columns are all-zero — the mask is already folded in."""
    n_tiles = recv2d.shape[0]
    if n_tiles > 512:
        import warnings

        warnings.warn(
            f"AERO_GNN_ONEHOT=precomp materializes a {n_tiles}x{NB}x{ET} "
            f"HBM one-hot (~{n_tiles * NB * ET * 2 / 2**30:.2f} GB bf16 "
            f"per instance, fwd+bwd per layer before XLA CSE) — likely to "
            f"OOM memory-tight >=262k meshes", stacklevel=3)
    local = recv2d - (tile_block * NB)[:, None, None]  # [T, 1, ET]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NB, 1), 1)
    eq = jnp.where(local == rows_iota, 1.0, 0.0)
    return eq.astype(dtype)


def _agg_kernel(tile_block_ref, tile_first_ref, recv_ref, msgs_ref,
                mask_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(tile_first_ref[t] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = tile_block_ref[t] * NB
    onehot = build_onehot(recv_ref[:], base, msgs_ref.dtype, mask_ref[:])
    # [NB(out_rows), ET(edges)] contraction on the MXU
    out_ref[:] += jax.lax.dot_general(
        onehot, msgs_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _agg_kernel_premask(tile_block_ref, tile_first_ref, recv_ref, msgs_ref,
                        out_ref):
    t = pl.program_id(0)

    @pl.when(tile_first_ref[t] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = tile_block_ref[t] * NB
    onehot_t = build_onehot_t(recv_ref[0], base, msgs_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        onehot_t, msgs_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _agg_kernel_premask_weighted(tile_block_ref, tile_first_ref, recv_ref,
                                 w_ref, msgs_ref, out_ref):
    """Weighted premask aggregation: the per-edge weight IS the one-hot's
    select value (where(recv==row, w, 0)), so the weighted stream
    w[e]*msgs[e] never materializes in HBM and the weighting costs zero
    extra VPU ops over the plain one-hot build. Weights ride the same
    [n_tiles, 1, ET] row layout as the receivers."""
    t = pl.program_id(0)

    @pl.when(tile_first_ref[t] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = tile_block_ref[t] * NB
    edges = recv_ref.shape[2]
    local = recv_ref[0] - base  # [1, ET]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, edges), 0)
    oh_w = jnp.where(local == rows_iota, w_ref[0],
                     jnp.zeros((), jnp.float32)).astype(msgs_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        oh_w, msgs_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _agg_kernel_premask_weighted2(tile_block_ref, tile_first_ref, recv_ref,
                                  w1_ref, w2_ref, m1_ref, m2_ref,
                                  out1_ref, out2_ref):
    """Dual-stream weighted aggregation: TWO message streams with TWO
    weight vectors over the SAME receiver layout in one kernel pass —
    the receiver DMA, the local-id compare and the tile loop are shared;
    only the select+cast and the one-hot matmul double (VERDICT r4 item
    8's "shared one-hot, two weight vectors" probe)."""
    t = pl.program_id(0)

    @pl.when(tile_first_ref[t] == 1)
    def _():
        out1_ref[:] = jnp.zeros_like(out1_ref)
        out2_ref[:] = jnp.zeros_like(out2_ref)

    base = tile_block_ref[t] * NB
    edges = recv_ref.shape[2]
    local = recv_ref[0] - base  # [1, ET]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, edges), 0)
    eq = local == rows_iota  # shared compare
    oh1 = jnp.where(eq, w1_ref[0],
                    jnp.zeros((), jnp.float32)).astype(m1_ref.dtype)
    oh2 = jnp.where(eq, w2_ref[0],
                    jnp.zeros((), jnp.float32)).astype(m2_ref.dtype)
    dn = (((1,), (0,)), ((), ()))
    out1_ref[:] += jax.lax.dot_general(
        oh1, m1_ref[:], dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(out1_ref.dtype)
    out2_ref[:] += jax.lax.dot_general(
        oh2, m2_ref[:], dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(out2_ref.dtype)


def segment_agg_weighted2_pallas(m1, w1, m2, w2, receivers,
                                 num_nodes: int):
    """Dual weighted aggregation over one shared receiver stream (probe;
    requires the block-aligned layout + premask mode and zero pad-edge
    weights). Forward only — the model's WEC pairs never co-execute
    (down and up convs sit on opposite sides of the U-Net bottleneck),
    so this exists to MEASURE what pair-batching could save; see
    benchmarks/micro_wec2.py."""
    assert m1.shape[0] % ET == 0 and num_nodes % NB == 0
    assert onehot_premask_enabled()
    tile_block, tile_first = derive_tiles(receivers)
    n_tiles = tile_block.shape[0]
    h = m1.shape[1]
    mask = jnp.ones(m1.shape[0], dtype=jnp.float32)
    recv2d = recv_rows(premask_receivers(receivers, mask))
    w1r = w1.astype(jnp.float32).reshape(-1, 1, ET)
    w2r = w2.astype(jnp.float32).reshape(-1, 1, ET)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ET, h), lambda t, tb, tf: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ET, h), lambda t, tb, tf: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NB, h), lambda t, tb, tf: (tb[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, h), lambda t, tb, tf: (tb[t], 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _agg_kernel_premask_weighted2,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_nodes, h), m1.dtype),
                   jax.ShapeDtypeStruct((num_nodes, h), m2.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_tiles * ET * NB * h,
            bytes_accessed=(m1.size + m2.size + 2 * num_nodes * h)
            * m1.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_block, tile_first, recv2d, w1r, w2r, m1, m2)


def _segment_sum_weighted_fwd(messages, weights, receivers, mask,
                              tile_block, tile_first, num_nodes: int):
    n_tiles = tile_block.shape[0]
    h = messages.shape[1]
    recv2d = recv_rows(premask_receivers(receivers, mask))
    w2d = weights.astype(jnp.float32).reshape(-1, 1, ET)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_block, tile_first
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ET, h), lambda t, tb, tf: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NB, h), lambda t, tb, tf: (tb[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _agg_kernel_premask_weighted,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, h), messages.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * ET * NB * h,
            bytes_accessed=(messages.size + num_nodes * h)
            * messages.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_block, tile_first, recv2d, w2d, messages)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _segment_sum_weighted_pallas(messages, weights, receivers, mask,
                                 tile_block, tile_first, num_nodes: int):
    return _segment_sum_weighted_fwd(messages, weights, receivers, mask,
                                     tile_block, tile_first, num_nodes)


def _sswp_fwd(messages, weights, receivers, mask, tile_block, tile_first,
              num_nodes):
    out = _segment_sum_weighted_fwd(messages, weights, receivers, mask,
                                    tile_block, tile_first, num_nodes)
    return out, (messages, weights, receivers, mask)


def _sswp_bwd(num_nodes, res, ct):
    messages, weights, receivers, mask = res
    ctg = ct.at[receivers].get(mode="promise_in_bounds",
                               indices_are_sorted=True)
    d_msgs = (ctg * weights[:, None].astype(jnp.float32)
              * mask[:, None]).astype(ctg.dtype)
    # weight cotangent so the Pallas path's grads agree with the XLA
    # fallback (multiply + segment sum): d_w[e] = <ct[recv[e]], msgs[e]>.
    # The WEC hot path (models/bsms.py) wraps this op in its own
    # zero-weight-tangent custom_vjp, so saving `messages` here adds no
    # residual to that path.
    d_w = (jnp.sum(ctg.astype(jnp.float32)
                   * messages.astype(jnp.float32), axis=1)
           * mask).astype(weights.dtype)
    return d_msgs, d_w, None, None, None, None


_segment_sum_weighted_pallas.defvjp(_sswp_fwd, _sswp_bwd)


def segment_agg_weighted_pallas(messages: jax.Array, weights: jax.Array,
                                receivers: jax.Array, num_nodes: int,
                                mask: jax.Array = None) -> jax.Array:
    """out[n] = sum_{e: recv(e)=n} weights[e] * messages[e], weight folded
    into the one-hot select (see _agg_kernel_premask_weighted). REQUIRES
    the block-aligned layout + premask mode; falls back to the sorted XLA
    path otherwise. Weights participate at ``messages.dtype`` precision
    inside the kernel (the WEC_DTYPE=compute semantics) and are
    differentiable on both paths (see _sswp_bwd). Pad edges: pass
    ``mask`` (folded into the premasked receiver stream like the
    unweighted path), or guarantee zero pad-edge weights — with neither,
    pad-edge contributions land on their receiver row (the last pad
    node)."""
    if (messages.shape[0] % ET != 0 or num_nodes % NB != 0
            or not onehot_premask_enabled()):
        from aero_gnn_tpu.ops import scatter as S

        m = messages if mask is None else messages * mask[:, None].astype(
            messages.dtype)
        return S.segment_sum_sorted(
            m * weights[:, None].astype(messages.dtype),
            receivers, num_nodes)
    tile_block, tile_first = derive_tiles(receivers)
    if mask is None:
        mask = jnp.ones(messages.shape[0], dtype=jnp.float32)
    else:
        mask = mask.astype(jnp.float32)
    return _segment_sum_weighted_pallas(messages, weights, receivers, mask,
                                        tile_block, tile_first, num_nodes)


def _segment_sum_fwd_pallas(messages, receivers, mask, tile_block,
                            tile_first, num_nodes: int):
    n_tiles = tile_block.shape[0]
    assert messages.shape[0] == n_tiles * ET, (
        f"messages rows {messages.shape[0]} != tiles {n_tiles} * {ET}")
    assert num_nodes % NB == 0, f"num_nodes {num_nodes} % {NB} != 0"
    h = messages.shape[1]
    premask = onehot_premask_enabled()
    if premask:
        recv2d = recv_rows(premask_receivers(receivers, mask))
        recv_spec = pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        recv2d = receivers.reshape(-1, 1)
        recv_spec = pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                                 memory_space=pltpu.VMEM)

    in_specs = [
        recv_spec,
        pl.BlockSpec((ET, h), lambda t, tb, tf: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [recv2d, messages]
    if not premask:
        in_specs.append(pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask.reshape(-1, 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_block, tile_first
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((NB, h), lambda t, tb, tf: (tb[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _agg_kernel_premask if premask else _agg_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, h), messages.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * ET * NB * h,
            bytes_accessed=(messages.size + num_nodes * h)
            * messages.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_block, tile_first, *operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _segment_sum_pallas(messages, receivers, mask, tile_block, tile_first,
                        num_nodes: int):
    return _segment_sum_fwd_pallas(messages, receivers, mask, tile_block,
                                   tile_first, num_nodes)


def _ssp_fwd(messages, receivers, mask, tile_block, tile_first, num_nodes):
    out = _segment_sum_fwd_pallas(messages, receivers, mask, tile_block,
                                  tile_first, num_nodes)
    return out, (receivers, mask)


def _ssp_bwd(num_nodes, res, ct):
    receivers, mask = res
    d_msgs = ct.at[receivers].get(mode="promise_in_bounds",
                                  indices_are_sorted=True)
    d_msgs = d_msgs * mask[:, None].astype(d_msgs.dtype)
    return d_msgs, None, None, None, None


_segment_sum_pallas.defvjp(_ssp_fwd, _ssp_bwd)


def _gather_kernel(tile_block_ref, recv_ref, nodes_ref, out_ref):
    """Block-aligned row gather: out[e] = nodes[recv[e]] via a one-hot MXU
    matmul (transposed-one-hot form, see build_onehot_t)."""
    t = pl.program_id(0)
    base = tile_block_ref[t] * NB
    onehot_t = build_onehot_t(recv_ref[0], base, nodes_ref.dtype)
    out_ref[:] = jax.lax.dot_general(
        onehot_t, nodes_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _gather_fwd_pallas(nodes, receivers, tile_block):
    n_tiles = tile_block.shape[0]
    h = nodes.shape[1]
    recv2d = recv_rows(receivers)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # tile_block
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, tb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, h), lambda t, tb: (tb[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ET, h), lambda t, tb: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * ET, h), nodes.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * ET * NB * h,
            bytes_accessed=(nodes.size + n_tiles * ET * h)
            * nodes.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_block, recv2d, nodes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_receivers_impl(nodes, receivers, num_nodes: int):
    tile_block, _ = derive_tiles(receivers)
    return _gather_fwd_pallas(nodes, receivers, tile_block)


def _grp_fwd(nodes, receivers, num_nodes):
    return _gather_receivers_impl(nodes, receivers, num_nodes), (receivers,)


def _grp_bwd(num_nodes, res, ct):
    (receivers,) = res
    tile_block, tile_first = derive_tiles(receivers)
    mask = jnp.ones(ct.shape[0], dtype=ct.dtype)
    d_nodes = _segment_sum_pallas(ct, receivers, mask, tile_block,
                                  tile_first, num_nodes)
    return d_nodes, None


_gather_receivers_impl.defvjp(_grp_fwd, _grp_bwd)


def gather_receivers_pallas(nodes, receivers):
    """Aligned-receiver row gather on the Pallas kernel; backward is the
    Pallas segment-sum. REQUIRES the block-aligned layout."""
    return _gather_receivers_impl(nodes, receivers, nodes.shape[0])


def derive_tiles(receivers: jax.Array):
    """Tile metadata from a block-aligned receiver stream (computable inside
    jit: each tile's first receiver determines its node block; pad tails
    point at the last pad node = last block)."""
    first_recv = receivers[::ET]
    tile_block = (first_recv // NB).astype(jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tile_block[:-1]])
    tile_first = (tile_block != prev).astype(jnp.int32)
    return tile_block, tile_first


def segment_agg_pallas(messages: jax.Array, receivers: jax.Array,
                       num_nodes: int, *, aggregation: str = "add",
                       mask: Optional[jax.Array] = None) -> jax.Array:
    """Aggregate edge messages by destination with the Pallas kernel.

    REQUIRES the block-aligned layout
    (graph.padded.build_graph_batch(align_edges=True)): edge count a
    multiple of 128, each 128-edge tile's real edges within one 128-node
    block, every block covered. Falls back to the XLA sorted path when the
    shape cannot be tiled.
    """
    if (messages.shape[0] % ET != 0 or num_nodes % NB != 0):
        from aero_gnn_tpu.ops import scatter as S

        if mask is not None:
            messages = messages * mask[:, None].astype(messages.dtype)
        out = S.segment_sum_sorted(messages, receivers, num_nodes)
        if aggregation == "mean":
            deg = S.degree(receivers, num_nodes, mask=mask,
                           dtype=messages.dtype)
            out = out / jnp.maximum(deg, 1.0)[:, None]
        return out

    tile_block, tile_first = derive_tiles(receivers)
    if mask is None:
        mask = jnp.ones(messages.shape[0], dtype=messages.dtype)
    out = _segment_sum_pallas(messages, receivers, mask, tile_block,
                              tile_first, num_nodes)
    if aggregation == "mean":
        ones = mask[:, None].astype(messages.dtype)
        deg = _segment_sum_pallas(ones, receivers, mask, tile_block,
                                  tile_first, num_nodes)
        out = out / jnp.maximum(deg, 1.0)
    elif aggregation != "add":
        raise ValueError(f"Unsupported aggregation method: {aggregation}")
    return out
