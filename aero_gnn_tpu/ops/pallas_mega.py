"""Fused full-MGN-layer Pallas kernel (edge update + node update).

Extends the fused edge-processor kernel (ops/pallas_fused.py) with a
per-node-block EPILOGUE: the grid walks receiver-sorted edge tiles, and
when it finishes a block's last tile — the aggregation for those NB nodes
is then complete in VMEM — it immediately runs the ENTIRE NodeBlock update
(split-concat node MLP + LayerNorm + residual,
/root/reference/models/mgnLayer.py:111-153 semantics with 'add'
aggregation and the edge->node residual order of :177-213) on the resident
[NB, h] aggregate:

    tiles of block b:   e' , agg_b += onehot^T @ e'      (as pallas_fused)
    last tile of b:     x'_b = x_b + LN(MLP([x_b, agg_b]))

vs the two-kernel composition this removes the separate node-block kernel
dispatch and the agg HBM round trip between them; in the backward the node
cotangent d_agg never touches HBM at all — it is produced per block at the
block's FIRST tile (backward node pass) into a VMEM scratch buffer and
consumed by that block's edge tiles as the aggregation cotangent.

Layout contract and masking semantics are identical to ops/pallas_fused
(block-aligned edges, build_graph_batch(align_edges=True)). 'add'
aggregation only — 'mean' needs the degree division between edge and node
blocks and stays on the two-kernel path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aero_gnn_tpu.graph.padded import ALIGN_EDGE_TILE, ALIGN_NODE_BLOCK
from aero_gnn_tpu.nn.mlp import LN_EPS
from aero_gnn_tpu.ops.pallas_fused import _colsum, _ln_bwd, _ln_stats
from aero_gnn_tpu.ops.pallas_segment import derive_tiles

NB = ALIGN_NODE_BLOCK
ET = ALIGN_EDGE_TILE


def mega_enabled() -> bool:
    """Default OFF: the single-kernel layer measured SLOWER than the
    two-kernel composition on the flagship bench (100.95 vs 97.60 ms/step,
    benchmarks/ablate_mega.py) — the per-block pl.when epilogues cost more
    in pipeline stalls than the saved node-kernel dispatch + agg round trip.
    Kept as an option (AERO_GNN_MEGA=1): the balance may differ at other
    hidden widths / tile geometries."""
    import os

    return os.environ.get("AERO_GNN_MEGA", "0") == "1"


def derive_tile_last(tile_block: jax.Array) -> jax.Array:
    """1 for each node block's final tile (next tile starts a new block)."""
    nxt = jnp.concatenate(
        [tile_block[1:], jnp.full((1,), -1, jnp.int32)])
    return (tile_block != nxt).astype(jnp.int32)


def _mm(a, b, ta=False, tb=False):
    dims = ((((0,) if ta else (1,)), ((1,) if tb else (0,))), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _edge_chain(e, sg, dg, w_e_ref, ws_ref, bs_ref, n_hidden):
    """relu MLP chain of the concat-trick edge update (pre-output-linear)."""
    h0 = _mm(e, w_e_ref[:]).astype(e.dtype) + sg + dg
    acts = [jnp.maximum(h0, 0)]
    for i in range(n_hidden):
        acts.append(jnp.maximum(
            _mm(acts[-1], ws_ref[i]).astype(e.dtype) + bs_ref[i], 0))
    return acts


def _node_chain(x, agg, w1x_ref, w1a_ref, b1_ref, ws_ref, bs_ref, n_hidden):
    acts = [jnp.maximum(
        (_mm(x, w1x_ref[:]) + _mm(agg, w1a_ref[:])).astype(x.dtype)
        + b1_ref[:], 0)]
    for k in range(n_hidden):
        acts.append(jnp.maximum(
            _mm(acts[-1], ws_ref[k]).astype(x.dtype) + bs_ref[k], 0))
    return acts


def _make_fwd_kernel(ne_hidden: int, nn_hidden: int):
    def kernel(tile_block_ref, tile_first_ref, tile_last_ref,
               recv_ref, e_ref, sg_ref, dproj_ref, x_ref, mask_ref,
               w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
               ln_scale_ref, ln_bias_ref,
               nw1x_ref, nw1a_ref, nb1_ref, nws_ref, nbs_ref,
               nwo_ref, nbo_ref, nscale_ref, nbias_ref,
               e_out_ref, agg_ref, x_out_ref):
        t = pl.program_id(0)

        @pl.when(tile_first_ref[t] == 1)
        def _():
            agg_ref[:] = jnp.zeros_like(agg_ref)

        e = e_ref[:]
        dt = e.dtype

        base = tile_block_ref[t] * NB
        local = recv_ref[:] - base
        cols = jax.lax.broadcasted_iota(jnp.int32, (ET, NB), 1)
        eq = jnp.where(local == cols, 1.0, 0.0)
        onehot = (eq * mask_ref[:].astype(jnp.float32)).astype(dt)

        dg = _mm(onehot, dproj_ref[:]).astype(dt)
        acts = _edge_chain(e, sg_ref[:], dg, w_e_ref, ws_ref, bs_ref,
                           ne_hidden)
        de = _mm(acts[-1], w_out_ref[:]).astype(dt) + b_out_ref[:]
        de32 = de.astype(jnp.float32)
        mu, var = _ln_stats(de32, de32.shape[-1])
        ln = (de32 - mu) * jax.lax.rsqrt(var + LN_EPS)
        ln = ln * ln_scale_ref[:].astype(jnp.float32) \
            + ln_bias_ref[:].astype(jnp.float32)
        e_new = e + ln.astype(dt)
        e_out_ref[:] = e_new

        agg_ref[:] += _mm(onehot, e_new, ta=True).astype(agg_ref.dtype)

        @pl.when(tile_last_ref[t] == 1)
        def _():
            # this block's aggregation is complete: node update in-VMEM
            x = x_ref[:]
            nacts = _node_chain(x, agg_ref[:].astype(dt), nw1x_ref,
                                nw1a_ref, nb1_ref, nws_ref, nbs_ref,
                                nn_hidden)
            d = _mm(nacts[-1], nwo_ref[:]).astype(dt) + nbo_ref[:]
            d32 = d.astype(jnp.float32)
            nmu, nvar = _ln_stats(d32, d32.shape[-1])
            nln = (d32 - nmu) * jax.lax.rsqrt(nvar + LN_EPS)
            nln = nln * nscale_ref[:].astype(jnp.float32) \
                + nbias_ref[:].astype(jnp.float32)
            x_out_ref[:] = x + nln.astype(dt)

    return kernel


def _specs(h, ne_hidden, nn_hidden, n_prefetch=3):
    """BlockSpec builders shared by the fwd (3 prefetch operands) and bwd
    (2) grids — only the index-map arity differs."""

    def tile_spec():
        return pl.BlockSpec((ET, h), lambda t, *s: (t, 0),
                            memory_space=pltpu.VMEM)

    def block_spec():
        return pl.BlockSpec((NB, h), lambda t, *s: (s[0][t], 0),
                            memory_space=pltpu.VMEM)

    def idx_spec():
        return pl.BlockSpec((ET, 1), lambda t, *s: (t, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda t, *s: (0,) * nd,
                            memory_space=pltpu.VMEM)

    nhe = max(ne_hidden, 1)
    nhn = max(nn_hidden, 1)
    edge_w = [const_spec((h, h)), const_spec((nhe, h, h)),
              const_spec((nhe, 1, h)), const_spec((h, h)),
              const_spec((1, h)), const_spec((1, h)), const_spec((1, h))]
    node_w = [const_spec((h, h)), const_spec((h, h)), const_spec((1, h)),
              const_spec((nhn, h, h)), const_spec((nhn, 1, h)),
              const_spec((h, h)), const_spec((1, h)),
              const_spec((1, h)), const_spec((1, h))]
    return tile_spec, block_spec, idx_spec, const_spec, edge_w, node_w


def _pack(ws, bs, h, dt):
    n = ws.shape[0]
    ws_in = ws if n else jnp.zeros((1, h, h), dt)
    bs_in = bs.reshape(n, 1, h) if n else jnp.zeros((1, 1, h), dt)
    return ws_in, bs_in


def _edge_weight_args(ep, h):
    ws_in, bs_in = _pack(ep["ws"], ep["bs"], h, ep["w_e"].dtype)
    return (ep["w_e"], ws_in, bs_in, ep["w_out"],
            ep["b_out"].reshape(1, h), ep["ln_scale"].reshape(1, h),
            ep["ln_bias"].reshape(1, h))


def _node_weight_args(npar, h):
    nws_in, nbs_in = _pack(npar["ws"], npar["bs"], h, npar["w1x"].dtype)
    return (npar["w1x"], npar["w1a"], npar["b1"].reshape(1, h),
            nws_in, nbs_in, npar["w_out"], npar["b_out"].reshape(1, h),
            npar["ln_scale"].reshape(1, h), npar["ln_bias"].reshape(1, h))


def _mega_fwd_call(e, sg, d_proj, x, mask, receivers, ep, npar,
                   num_nodes: int):
    n_tiles = receivers.shape[0] // ET
    h = e.shape[1]
    ne_hidden = ep["ws"].shape[0]
    nn_hidden = npar["ws"].shape[0]
    tile_block, tile_first = derive_tiles(receivers)
    tile_last = derive_tile_last(tile_block)
    recv2d = receivers.reshape(-1, 1)
    mask2d = mask.reshape(-1, 1)
    tile_spec, block_spec, idx_spec, const_spec, edge_w, node_w = _specs(
        h, ne_hidden, nn_hidden)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[idx_spec(), tile_spec(), tile_spec(), block_spec(),
                  block_spec(), idx_spec()] + edge_w + node_w,
        out_specs=(tile_spec(), block_spec(), block_spec()),
    )
    return pl.pallas_call(
        _make_fwd_kernel(ne_hidden, nn_hidden),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(e.shape, e.dtype),         # e'
            jax.ShapeDtypeStruct((num_nodes, h), e.dtype),  # agg
            jax.ShapeDtypeStruct((num_nodes, h), x.dtype),  # x'
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * ET * h * h * (2 + ne_hidden)
            + 4 * n_tiles * ET * NB * h
            + 2 * num_nodes * h * h * (3 + nn_hidden),
            bytes_accessed=5 * e.size * e.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_block, tile_first, tile_last, recv2d, e, sg, d_proj, x, mask2d,
      *_edge_weight_args(ep, h), *_node_weight_args(npar, h))


def _make_bwd_kernel(ne_hidden: int, nn_hidden: int):
    def kernel(tile_block_ref, tile_first_ref,
               recv_ref, e_ref, sg_ref, dproj_ref, x_ref, agg_in_ref,
               mask_ref,
               w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
               ln_scale_ref, ln_bias_ref,
               nw1x_ref, nw1a_ref, nb1_ref, nws_ref, nbs_ref,
               nwo_ref, nbo_ref, nscale_ref, nbias_ref,
               ct_e_ref, ct_x_ref,
               de_out_ref, dsg_out_ref, ddproj_ref, dx_ref,
               dwe_ref, dws_ref, dbs_ref, dwo_ref, dbo_ref,
               dscale_ref, dbias_ref,
               dnw1x_ref, dnw1a_ref, dnb1_ref, dnws_ref, dnbs_ref,
               dnwo_ref, dnbo_ref, dnscale_ref, dnbias_ref,
               dagg_scr):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            for r in (dwe_ref, dws_ref, dbs_ref, dwo_ref, dbo_ref,
                      dscale_ref, dbias_ref, dnw1x_ref, dnw1a_ref,
                      dnb1_ref, dnws_ref, dnbs_ref, dnwo_ref, dnbo_ref,
                      dnscale_ref, dnbias_ref):
                r[:] = jnp.zeros_like(r)

        e = e_ref[:]
        dt = e.dtype

        @pl.when(tile_first_ref[t] == 1)
        def _():
            # ---- node backward for this block (before its edge tiles) ----
            x = x_ref[:]
            agg = agg_in_ref[:].astype(dt)
            nacts = _node_chain(x, agg, nw1x_ref, nw1a_ref, nb1_ref,
                                nws_ref, nbs_ref, nn_hidden)
            d = _mm(nacts[-1], nwo_ref[:]).astype(dt) + nbo_ref[:]
            d32 = d.astype(jnp.float32)
            nmu, nvar = _ln_stats(d32, d32.shape[-1])
            ninv = jax.lax.rsqrt(nvar + LN_EPS)
            nxn = (d32 - nmu) * ninv

            ct32 = ct_x_ref[:].astype(jnp.float32)
            d_d, dsc, dbi = _ln_bwd(ct32, nxn, ninv,
                                    nscale_ref[:].astype(jnp.float32))
            dnscale_ref[:] += dsc
            dnbias_ref[:] += dbi
            d_d = d_d.astype(dt)

            dnwo_ref[:] += _mm(nacts[-1], d_d, ta=True)
            dnbo_ref[:] += _colsum(d_d)
            dz = _mm(d_d, nwo_ref[:], tb=True).astype(dt)
            dz = dz * (nacts[-1].astype(jnp.float32) > 0).astype(dt)
            for k in reversed(range(nn_hidden)):
                dnws_ref[k] += _mm(nacts[k], dz, ta=True)
                dnbs_ref[k] += _colsum(dz)
                dz = _mm(dz, nws_ref[k], tb=True).astype(dt)
                dz = dz * (nacts[k].astype(jnp.float32) > 0).astype(dt)
            dnw1x_ref[:] += _mm(x, dz, ta=True)
            dnw1a_ref[:] += _mm(agg, dz, ta=True)
            dnb1_ref[:] += _colsum(dz)
            # residual: ct_x flows straight through to x
            dx_ref[:] = ct_x_ref[:] + _mm(dz, nw1x_ref[:], tb=True).astype(dt)
            # the aggregation cotangent stays in VMEM for this block's tiles
            dagg_scr[:] = _mm(dz, nw1a_ref[:], tb=True).astype(dt)
            ddproj_ref[:] = jnp.zeros_like(ddproj_ref)

        # ---- edge backward (as pallas_fused, ct_agg from scratch) ----
        base = tile_block_ref[t] * NB
        local = recv_ref[:] - base
        cols = jax.lax.broadcasted_iota(jnp.int32, (ET, NB), 1)
        eq = jnp.where(local == cols, 1.0, 0.0)
        onehot = (eq * mask_ref[:].astype(jnp.float32)).astype(dt)

        dg = _mm(onehot, dproj_ref[:]).astype(dt)
        acts = _edge_chain(e, sg_ref[:], dg, w_e_ref, ws_ref, bs_ref,
                           ne_hidden)
        d = _mm(acts[-1], w_out_ref[:]).astype(dt) + b_out_ref[:]
        d32 = d.astype(jnp.float32)
        mu, var = _ln_stats(d32, d32.shape[-1])
        inv = jax.lax.rsqrt(var + LN_EPS)
        xn = (d32 - mu) * inv

        ct_total = ct_e_ref[:] + _mm(onehot, dagg_scr[:]).astype(dt)
        ct32 = ct_total.astype(jnp.float32)
        d_d, dsc, dbi = _ln_bwd(ct32, xn, inv,
                                ln_scale_ref[:].astype(jnp.float32))
        dscale_ref[:] += dsc
        dbias_ref[:] += dbi
        d_d = d_d.astype(dt)

        dwo_ref[:] += _mm(acts[-1], d_d, ta=True)
        dbo_ref[:] += _colsum(d_d)
        dz = _mm(d_d, w_out_ref[:], tb=True).astype(dt)
        dz = dz * (acts[-1].astype(jnp.float32) > 0).astype(dt)
        for i in reversed(range(ne_hidden)):
            dws_ref[i] += _mm(acts[i], dz, ta=True)
            dbs_ref[i] += _colsum(dz)
            dz = _mm(dz, ws_ref[i], tb=True).astype(dt)
            dz = dz * (acts[i].astype(jnp.float32) > 0).astype(dt)

        dwe_ref[:] += _mm(e, dz, ta=True)
        de_out_ref[:] = ct_total + _mm(dz, w_e_ref[:], tb=True).astype(dt)
        dsg_out_ref[:] = dz
        ddproj_ref[:] += _mm(onehot, dz, ta=True).astype(ddproj_ref.dtype)

    return kernel


def _mega_bwd_call(e, sg, d_proj, x, agg, mask, receivers, ep, npar,
                   num_nodes: int, ct_e, ct_x):
    n_tiles = receivers.shape[0] // ET
    h = e.shape[1]
    ne_hidden = ep["ws"].shape[0]
    nn_hidden = npar["ws"].shape[0]
    tile_block, tile_first = derive_tiles(receivers)
    recv2d = receivers.reshape(-1, 1)
    mask2d = mask.reshape(-1, 1)
    tile_spec, block_spec, idx_spec, const_spec, edge_w, node_w = _specs(
        h, ne_hidden, nn_hidden, n_prefetch=2)
    nhe = max(ne_hidden, 1)
    nhn = max(nn_hidden, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[idx_spec(), tile_spec(), tile_spec(), block_spec(),
                  block_spec(), block_spec(), idx_spec()]
        + edge_w + node_w + [tile_spec(), block_spec()],
        out_specs=(
            tile_spec(), tile_spec(), block_spec(), block_spec(),
            const_spec((h, h)), const_spec((nhe, h, h)),
            const_spec((nhe, 1, h)), const_spec((h, h)),
            const_spec((1, h)), const_spec((1, h)), const_spec((1, h)),
            const_spec((h, h)), const_spec((h, h)), const_spec((1, h)),
            const_spec((nhn, h, h)), const_spec((nhn, 1, h)),
            const_spec((h, h)), const_spec((1, h)),
            const_spec((1, h)), const_spec((1, h)),
        ),
        scratch_shapes=[pltpu.VMEM((NB, h), e.dtype)],
    )
    outs = pl.pallas_call(
        _make_bwd_kernel(ne_hidden, nn_hidden),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(e.shape, e.dtype),          # d_e
            jax.ShapeDtypeStruct(e.shape, e.dtype),          # d_sg
            jax.ShapeDtypeStruct((num_nodes, h), e.dtype),   # d_dproj
            jax.ShapeDtypeStruct((num_nodes, h), x.dtype),   # d_x
            jax.ShapeDtypeStruct((h, h), jnp.float32),       # dW_e
            jax.ShapeDtypeStruct((nhe, h, h), jnp.float32),  # dWs
            jax.ShapeDtypeStruct((nhe, 1, h), jnp.float32),  # dbs
            jax.ShapeDtypeStruct((h, h), jnp.float32),       # dW_out
            jax.ShapeDtypeStruct((1, h), jnp.float32),       # db_out
            jax.ShapeDtypeStruct((1, h), jnp.float32),       # dscale
            jax.ShapeDtypeStruct((1, h), jnp.float32),       # dbias
            jax.ShapeDtypeStruct((h, h), jnp.float32),       # dnW1x
            jax.ShapeDtypeStruct((h, h), jnp.float32),       # dnW1a
            jax.ShapeDtypeStruct((1, h), jnp.float32),       # dnb1
            jax.ShapeDtypeStruct((nhn, h, h), jnp.float32),  # dnWs
            jax.ShapeDtypeStruct((nhn, 1, h), jnp.float32),  # dnbs
            jax.ShapeDtypeStruct((h, h), jnp.float32),       # dnW_out
            jax.ShapeDtypeStruct((1, h), jnp.float32),       # dnb_out
            jax.ShapeDtypeStruct((1, h), jnp.float32),       # dnscale
            jax.ShapeDtypeStruct((1, h), jnp.float32),       # dnbias
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * n_tiles * ET * h * h * (2 + ne_hidden))
            + 6 * n_tiles * ET * NB * h
            + 6 * num_nodes * h * h * (3 + nn_hidden),
            bytes_accessed=8 * e.size * e.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_block, tile_first, recv2d, e, sg, d_proj, x, agg, mask2d,
      *_edge_weight_args(ep, h), *_node_weight_args(npar, h), ct_e, ct_x)
    (d_e, d_sg, d_dproj, d_x, dwe, dws, dbs, dwo, dbo, dscale, dbias,
     dnw1x, dnw1a, dnb1, dnws, dnbs, dnwo, dnbo, dnscale, dnbias) = outs
    d_ep = {
        "w_e": dwe.astype(ep["w_e"].dtype),
        "ws": dws[:ne_hidden].astype(ep["ws"].dtype),
        "bs": (dbs[:ne_hidden, 0].astype(ep["bs"].dtype) if ne_hidden
               else jnp.zeros_like(ep["bs"])),
        "w_out": dwo.astype(ep["w_out"].dtype),
        "b_out": dbo[0].astype(ep["b_out"].dtype),
        "ln_scale": dscale[0].astype(ep["ln_scale"].dtype),
        "ln_bias": dbias[0].astype(ep["ln_bias"].dtype),
    }
    d_np = {
        "w1x": dnw1x.astype(npar["w1x"].dtype),
        "w1a": dnw1a.astype(npar["w1a"].dtype),
        "b1": dnb1[0].astype(npar["b1"].dtype),
        "ws": dnws[:nn_hidden].astype(npar["ws"].dtype),
        "bs": (dnbs[:nn_hidden, 0].astype(npar["bs"].dtype) if nn_hidden
               else jnp.zeros_like(npar["bs"])),
        "w_out": dnwo.astype(npar["w_out"].dtype),
        "b_out": dnbo[0].astype(npar["b_out"].dtype),
        "ln_scale": dnscale[0].astype(npar["ln_scale"].dtype),
        "ln_bias": dnbias[0].astype(npar["ln_bias"].dtype),
    }
    return (d_e, d_sg, d_dproj.astype(d_proj.dtype), d_x, None, None,
            d_ep, d_np)


def _equiv(e, sg, d_proj, x, mask, receivers, ep, npar, num_nodes: int):
    """jnp reference composition (tests and the non-Pallas backward)."""
    from aero_gnn_tpu.ops import pallas_fused as PF
    from aero_gnn_tpu.ops import pallas_node as PN

    e_new, agg = PF._equiv(
        e, sg, d_proj, mask, receivers, ep["w_e"], ep["ws"], ep["bs"],
        ep["w_out"], ep["b_out"], ep["ln_scale"], ep["ln_bias"], num_nodes)
    x_new = PN._equiv(
        x, agg.astype(x.dtype), npar["w1x"], npar["w1a"], npar["b1"],
        npar["ws"], npar["bs"], npar["w_out"], npar["b_out"],
        npar["ln_scale"], npar["ln_bias"])
    return x_new, e_new


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_mgn_layer(e, sg, d_proj, x, mask, receivers, ep, npar,
                    num_nodes: int) -> Tuple[jax.Array, jax.Array]:
    """Whole residual MGN processor layer in one Pallas kernel:
    (x, e) -> (x', e'). ``ep``/``npar`` are the edge/node parameter dicts
    (see _edge_weight_args/_node_weight_args); 'add' aggregation, ReLU."""
    x_new, e_new, _ = _fmgn_fwd_impl(e, sg, d_proj, x, mask, receivers,
                                     ep, npar, num_nodes)
    return x_new, e_new


def _fmgn_fwd_impl(e, sg, d_proj, x, mask, receivers, ep, npar, num_nodes):
    e_new, agg, x_new = _mega_fwd_call(e, sg, d_proj, x, mask, receivers,
                                       ep, npar, num_nodes)
    return x_new, e_new, agg


def _fmgn_fwd(e, sg, d_proj, x, mask, receivers, ep, npar, num_nodes):
    x_new, e_new, agg = _fmgn_fwd_impl(e, sg, d_proj, x, mask, receivers,
                                       ep, npar, num_nodes)
    # name the aggregate so the save_fused remat policy stores it and the
    # backward never re-runs this forward kernel (models/mgn.run_processor)
    agg = checkpoint_name(agg, "mgn_agg")
    return (x_new, e_new), (e, sg, d_proj, x, agg, mask, receivers, ep, npar)


def _fmgn_bwd(num_nodes, res, ct):
    e, sg, d_proj, x, agg, mask, receivers, ep, npar = res
    ct_x, ct_e = ct
    import os

    if os.environ.get("AERO_GNN_FUSED_BWD", "1") == "1":
        return _mega_bwd_call(e, sg, d_proj, x, agg, mask, receivers,
                              ep, npar, num_nodes, ct_e, ct_x)
    _, vjp = jax.vjp(
        lambda *a: _equiv(*a, num_nodes=num_nodes),
        e, sg, d_proj, x, mask, receivers, ep, npar)
    g = vjp((ct_x, ct_e))
    return (g[0], g[1], g[2], g[3], None, None, g[6], g[7])


fused_mgn_layer.defvjp(_fmgn_fwd, _fmgn_bwd)
