"""Fused edge-processor Pallas kernel.

One pass over edge tiles computes the ENTIRE concat-trick edge update plus
the destination aggregation without materializing any [E, h] intermediate
in HBM:

    dg = onehot(recv) @ d_proj_block (in-kernel receiver gather, masked)
    h0 = e @ W_e + sg + dg          (sg = pre-gathered sender projections)
    z  = act(h0); z = act(z @ W_i + b_i) ...      (hidden stack)
    de = z @ W_out + b_out;  de = LayerNorm(de)
    e' = e + de
    agg[dst] += e' * mask           (one-hot MXU accumulation per block)

vs the unfused XLA path this saves ~6 [E, h] HBM round-trips per layer
(dg/h0/z1/z2/de plus the aggregation's input re-read): the receiver-side
gather never touches HBM — its one-hot matrix is shared with the
aggregation and its operand is the [NB, h] projection block that Pallas
keeps resident while consecutive tiles target the same node block. Weights
live in VMEM across the whole grid (constant index maps).

Backward (custom VJP): a matching fused backward kernel recomputes the
chain per tile in VMEM and produces the input gradients plus weight-grad
accumulators that stay VMEM-resident across the entire grid (constant
output index maps, written back once). The d_proj gradient is accumulated
per node block in-kernel (the transpose of the in-kernel gather), so the
receiver-side backward also never materializes an [E, h] cotangent. Set
AERO_GNN_FUSED_BWD=0 to fall back to autodiff through the jnp-equivalent
composition.

Masking contract: the receiver gather is masked (pad edges read zeros, not
the pad node's row) — pad-edge rows of e' carry masked-gather garbage
either way and are never observable (every consumer masks by edge_mask).

Layout contract: block-aligned edges (graph.padded align_edges) — ET-row
tiles per NB-node block, receiver-sorted. Same as ops.pallas_segment.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aero_gnn_tpu.graph.padded import ALIGN_EDGE_TILE, ALIGN_NODE_BLOCK
from aero_gnn_tpu.nn.mlp import LN_EPS
from aero_gnn_tpu.ops.pallas_segment import derive_tiles

NB = ALIGN_NODE_BLOCK
ET = ALIGN_EDGE_TILE


def ln_mxu_mode() -> str:
    """AERO_GNN_LN_MXU mode: "0" = all LayerNorm reductions on the VPU,
    "1" = all on the MXU, "2" (default) = lane means on the MXU but
    dscale/dbias ROW sums on the VPU. Lane means (jnp.mean(axis=-1)) lower
    to cross-lane shuffle chains on the VPU (+0.157 ms/layer-fwd vs +0.042
    as skinny ones-matmuls, benchmarks/ln_variants.py), while the row sums
    overlap with the MXU-contended backward for free (97.51 / 97.62 / 99.8
    ms/step for modes 2/1/0, benchmarks/ablate_ln.py)."""
    import os

    return os.environ.get("AERO_GNN_LN_MXU", "2")


def ln_mxu_enabled() -> bool:
    return ln_mxu_mode() in ("1", "2")


def _ln_stats(d32, h):
    """(mu, var) over the lane dim of a [rows, h] f32 tile."""
    if ln_mxu_enabled():
        ones = jnp.full((h, 1), 1.0 / h, jnp.float32)
        mm = functools.partial(jax.lax.dot_general,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        # shifted one-pass: var(x) = E[(x-s)^2] - (E[x-s])^2 with s = first
        # lane per row. The shift costs one VPU subtract but removes the
        # catastrophic cancellation of raw E[x^2]-mu^2 when |mean| >> std
        # (x-s is already ~std-sized), while keeping both matmuls
        # independent (unlike a true two-pass, which serializes on mu).
        s = jax.lax.slice_in_dim(d32, 0, 1, axis=1)
        y = d32 - s
        mu_y = mm(y, ones)
        # can still round slightly negative for near-constant rows; clamp
        # so rsqrt(var+eps) never sees a negative argument (NaN)
        var = jnp.maximum(mm(y * y, ones) - mu_y * mu_y, 0.0)
        mu = mu_y + s
    else:
        mu = jnp.mean(d32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(d32 - mu), axis=-1, keepdims=True)
    return mu, var


def _colsum(x):
    """Column sums of a [rows, h] tile -> [1, h] f32 on the VPU.

    Deliberately NOT a ones-row MXU matmul: the backward kernels are
    MXU-contended (weight-grad matmuls), and an in-process A/B showed the
    matmul form costs +2.5 ms/step while the sublane-reduction sum
    overlaps with MXU work for free (ablate_ln.py, 97.6 -> 100.1)."""
    return jnp.sum(x.astype(jnp.float32), axis=0, keepdims=True)


def _ln_bwd(ct32, xn, inv, scale32):
    """LayerNorm backward over a [rows, h] f32 tile -> (d_d, dscale, dbias).

    Same math as the standard LN VJP; with ln_mxu_enabled() every reduction
    (two lane means, two row sums) rides the MXU as a skinny matmul instead
    of VPU shuffle-reduction chains.
    """
    rows, h = ct32.shape
    t1 = ct32 * xn
    g = ct32 * scale32
    if ln_mxu_enabled():
        mmc = functools.partial(jax.lax.dot_general,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ones_h = jnp.full((h, 1), 1.0 / h, jnp.float32)
        mean_g = mmc(g, ones_h)
        mean_gxn = mmc(g * xn, ones_h)
        if ln_mxu_mode() == "2":
            # lane means on MXU, row sums on VPU (overlap with MXU work)
            dscale = jnp.sum(t1, axis=0, keepdims=True)
            dbias = jnp.sum(ct32, axis=0, keepdims=True)
        else:
            ones_rows = jnp.full((1, rows), 1.0, jnp.float32)
            dscale = mmc(ones_rows, t1)
            dbias = mmc(ones_rows, ct32)
    else:
        mean_g = jnp.mean(g, axis=-1, keepdims=True)
        mean_gxn = jnp.mean(g * xn, axis=-1, keepdims=True)
        dscale = jnp.sum(t1, axis=0, keepdims=True)
        dbias = jnp.sum(ct32, axis=0, keepdims=True)
    d_d = (g - mean_g - xn * mean_gxn) * inv
    return d_d, dscale, dbias


def _make_kernel(n_hidden: int, activation: str):
    if activation != "relu":
        raise ValueError("fused kernel supports relu (the reference "
                         "hardcodes ReLU in EdgeBlockSum)")

    def kernel(tile_block_ref, tile_first_ref,
               recv_ref, e_ref, sg_ref, dproj_ref, mask_ref,
               w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
               ln_scale_ref, ln_bias_ref,
               e_out_ref, agg_ref):
        t = pl.program_id(0)

        @pl.when(tile_first_ref[t] == 1)
        def _():
            agg_ref[:] = jnp.zeros_like(agg_ref)

        e = e_ref[:]

        # shared masked one-hot: rows=edges, cols=local node ids
        base = tile_block_ref[t] * NB
        local = recv_ref[:] - base
        cols = jax.lax.broadcasted_iota(jnp.int32, (ET, NB), 1)
        eq = jnp.where(local == cols, 1.0, 0.0)
        onehot = (eq * mask_ref[:].astype(jnp.float32)).astype(e.dtype)

        # in-kernel receiver gather: [ET, NB] @ [NB, h]
        dg = jax.lax.dot_general(
            onehot, dproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(e.dtype)

        h0 = jax.lax.dot_general(
            e, w_e_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(e.dtype) + sg_ref[:] + dg
        z = jnp.maximum(h0, 0)
        for i in range(n_hidden):
            z = jnp.maximum(
                jax.lax.dot_general(
                    z, ws_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(e.dtype) + bs_ref[i], 0)
        de = jax.lax.dot_general(
            z, w_out_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(e.dtype) + b_out_ref[:]

        # LayerNorm with f32 statistics
        def32 = de.astype(jnp.float32)
        mu, var = _ln_stats(def32, def32.shape[-1])
        ln = (def32 - mu) * jax.lax.rsqrt(var + LN_EPS)
        ln = ln * ln_scale_ref[:].astype(jnp.float32) \
            + ln_bias_ref[:].astype(jnp.float32)

        e_new = e + ln.astype(e.dtype)
        e_out_ref[:] = e_new

        # masked one-hot aggregation into the resident output block
        agg_ref[:] += jax.lax.dot_general(
            onehot, e_new, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(agg_ref.dtype)

    return kernel


def _fused_fwd(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
               ln_scale, ln_bias, num_nodes: int, activation: str):
    n_tiles = receivers.shape[0] // ET
    h = e.shape[1]
    n_hidden = ws.shape[0]
    tile_block, tile_first = derive_tiles(receivers)
    recv2d = receivers.reshape(-1, 1)
    mask2d = mask.reshape(-1, 1)

    def tile_spec():
        return pl.BlockSpec((ET, h), lambda t, tb, tf: (t, 0),
                            memory_space=pltpu.VMEM)

    def block_spec():
        return pl.BlockSpec((NB, h), lambda t, tb, tf: (tb[t], 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda t, tb, tf: (0,) * nd,
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                         memory_space=pltpu.VMEM),  # recv
            tile_spec(),  # e
            tile_spec(),  # sg
            block_spec(),  # d_proj (node block)
            pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                         memory_space=pltpu.VMEM),  # mask
            const_spec((h, h)),  # w_e
            const_spec((max(n_hidden, 1), h, h)),  # ws
            const_spec((max(n_hidden, 1), 1, h)),  # bs
            const_spec((h, h)),  # w_out
            const_spec((1, h)),  # b_out
            const_spec((1, h)),  # ln_scale
            const_spec((1, h)),  # ln_bias
        ],
        out_specs=(
            tile_spec(),   # e'
            block_spec(),  # agg
        ),
    )
    ws_in = ws if n_hidden else jnp.zeros((1, h, h), e.dtype)
    bs_in = (bs.reshape(n_hidden, 1, h) if n_hidden
             else jnp.zeros((1, 1, h), e.dtype))
    return pl.pallas_call(
        _make_kernel(n_hidden, activation),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(e.shape, e.dtype),
            jax.ShapeDtypeStruct((num_nodes, h), e.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * ET * h * h * (2 + n_hidden)
            + 4 * n_tiles * ET * NB * h,
            bytes_accessed=4 * e.size * e.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_block, tile_first, recv2d, e, sg, d_proj, mask2d,
      w_e, ws_in, bs_in, w_out, b_out.reshape(1, h),
      ln_scale.reshape(1, h), ln_bias.reshape(1, h))


def _equiv(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
           ln_scale, ln_bias, num_nodes: int):
    """jnp reference composition (used for the backward pass and tests)."""
    from aero_gnn_tpu.ops.scatter import segment_sum_sorted

    dg = d_proj.at[receivers].get(
        mode="promise_in_bounds", indices_are_sorted=True)
    dg = dg * mask[:, None].astype(dg.dtype)
    h0 = e @ w_e + sg + dg
    z = jnp.maximum(h0, 0)
    for i in range(ws.shape[0]):
        z = jnp.maximum(z @ ws[i] + bs[i], 0)
    de = z @ w_out + b_out
    de32 = de.astype(jnp.float32)
    mu = jnp.mean(de32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(de32 - mu), axis=-1, keepdims=True)
    ln = (de32 - mu) * jax.lax.rsqrt(var + LN_EPS)
    ln = ln * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    e_new = e + ln.astype(e.dtype)
    agg = segment_sum_sorted(e_new * mask[:, None].astype(e_new.dtype),
                             receivers, num_nodes)
    return e_new, agg


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def fused_edge_layer(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out,
                     b_out, ln_scale, ln_bias, num_nodes: int,
                     activation: str = "relu"
                     ) -> Tuple[jax.Array, jax.Array]:
    """Fused concat-trick edge update + in-kernel receiver gather +
    aggregation -> (e', agg). ``d_proj`` is the [N, h] receiver-side node
    projection; its gather to edges happens inside the kernel."""
    return _fused_fwd(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out,
                      b_out, ln_scale, ln_bias, num_nodes, activation)


def _fel_fwd(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
             ln_scale, ln_bias, num_nodes, activation):
    out = _fused_fwd(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out,
                     b_out, ln_scale, ln_bias, num_nodes, activation)
    return out, (e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
                 ln_scale, ln_bias)


def _fel_bwd(num_nodes, activation, res, ct):
    (e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
     ln_scale, ln_bias) = res
    import os

    if os.environ.get("AERO_GNN_FUSED_BWD", "1") == "1":
        return _fused_bwd(e, sg, d_proj, mask, receivers, w_e, ws, bs,
                          w_out, b_out, ln_scale, ln_bias, num_nodes, ct)
    _, vjp = jax.vjp(
        lambda *a: _equiv(*a, num_nodes=num_nodes),
        e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
        ln_scale, ln_bias)
    grads = vjp(ct)
    # mask/receivers are integer/indicator inputs: no gradient
    return (grads[0], grads[1], grads[2], None, None, grads[5], grads[6],
            grads[7], grads[8], grads[9], grads[10], grads[11])


fused_edge_layer.defvjp(_fel_fwd, _fel_bwd)


# ---------------------------------------------------------------------------
# fused backward kernel: recompute the chain in VMEM per tile and produce
# input grads + weight-grad accumulators (VMEM-resident across the grid).
# d_proj's gradient accumulates per node block (revisited like agg).
# ---------------------------------------------------------------------------

def _make_bwd_kernel(n_hidden: int):
    def kernel(tile_block_ref, tile_first_ref,
               recv_ref, e_ref, sg_ref, dproj_ref, mask_ref,
               w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
               ln_scale_ref, ln_bias_ref, ct_e_ref, ct_agg_ref,
               de_out_ref, dsg_out_ref, ddproj_ref,
               dwe_ref, dws_ref, dbs_ref, dwo_ref, dbo_ref,
               dscale_ref, dbias_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dwe_ref[:] = jnp.zeros_like(dwe_ref)
            dws_ref[:] = jnp.zeros_like(dws_ref)
            dbs_ref[:] = jnp.zeros_like(dbs_ref)
            dwo_ref[:] = jnp.zeros_like(dwo_ref)
            dbo_ref[:] = jnp.zeros_like(dbo_ref)
            dscale_ref[:] = jnp.zeros_like(dscale_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        @pl.when(tile_first_ref[t] == 1)
        def _():
            ddproj_ref[:] = jnp.zeros_like(ddproj_ref)

        def mm(a, b, ta=False, tb=False):
            dims = ((((0,) if ta else (1,)), ((1,) if tb else (0,))),
                    ((), ()))
            return jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32)

        e = e_ref[:]
        dt = e.dtype

        # shared masked one-hot (same as forward)
        base = tile_block_ref[t] * NB
        local = recv_ref[:] - base
        cols = jax.lax.broadcasted_iota(jnp.int32, (ET, NB), 1)
        eq = jnp.where(local == cols, 1.0, 0.0)
        onehot = (eq * mask_ref[:].astype(jnp.float32)).astype(dt)

        # ---- recompute forward chain (activations stay in VMEM) ----
        dg = mm(onehot, dproj_ref[:]).astype(dt)
        h0 = mm(e, w_e_ref[:]).astype(dt) + sg_ref[:] + dg
        acts = [jnp.maximum(h0, 0)]
        for i in range(n_hidden):
            acts.append(jnp.maximum(
                mm(acts[-1], ws_ref[i]).astype(dt) + bs_ref[i], 0))
        d = mm(acts[-1], w_out_ref[:]).astype(dt) + b_out_ref[:]
        d32 = d.astype(jnp.float32)
        mu, var = _ln_stats(d32, d32.shape[-1])
        inv = jax.lax.rsqrt(var + LN_EPS)
        xn = (d32 - mu) * inv

        # ---- cotangent of e': direct + through the aggregation ----
        # gather ct_agg rows for each edge: [ET, NB] @ [NB, h]
        ct_total = ct_e_ref[:] + mm(onehot, ct_agg_ref[:]).astype(dt)

        # ---- LayerNorm backward (f32) ----
        ct32 = ct_total.astype(jnp.float32)
        d_d, dscale, dbias = _ln_bwd(
            ct32, xn, inv, ln_scale_ref[:].astype(jnp.float32))
        dscale_ref[:] += dscale
        dbias_ref[:] += dbias
        d_d = d_d.astype(dt)

        # ---- output linear ----
        dwo_ref[:] += mm(acts[-1], d_d, ta=True)
        dbo_ref[:] += _colsum(d_d)
        dz = mm(d_d, w_out_ref[:], tb=True).astype(dt)
        # relu mask in f32: Mosaic lacks bf16 vector comparisons
        dz = dz * (acts[-1].astype(jnp.float32) > 0).astype(dt)

        # ---- hidden stack (reverse) ----
        for i in reversed(range(n_hidden)):
            dws_ref[i] += mm(acts[i], dz, ta=True)
            dbs_ref[i] += _colsum(dz)
            dz = mm(dz, ws_ref[i], tb=True).astype(dt)
            dz = dz * (acts[i].astype(jnp.float32) > 0).astype(dt)

        # dz is now d(h0) == d_sg == d_dg (pre-mask)
        dwe_ref[:] += mm(e, dz, ta=True)
        d_e = ct_total + mm(dz, w_e_ref[:], tb=True).astype(dt)
        de_out_ref[:] = d_e
        dsg_out_ref[:] = dz
        # d(d_proj): transpose of the masked in-kernel gather
        ddproj_ref[:] += mm(onehot, dz, ta=True).astype(ddproj_ref.dtype)

    return kernel


def _fused_bwd(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
               ln_scale, ln_bias, num_nodes: int, ct):
    ct_e, ct_agg = ct
    n_tiles = receivers.shape[0] // ET
    h = e.shape[1]
    n_hidden = ws.shape[0]
    tile_block, tile_first = derive_tiles(receivers)
    recv2d = receivers.reshape(-1, 1)
    mask2d = mask.reshape(-1, 1)

    def tile_spec():
        return pl.BlockSpec((ET, h), lambda t, tb, tf: (t, 0),
                            memory_space=pltpu.VMEM)

    def block_spec():
        return pl.BlockSpec((NB, h), lambda t, tb, tf: (tb[t], 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda t, tb, tf: (0,) * nd,
                            memory_space=pltpu.VMEM)

    nh = max(n_hidden, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                         memory_space=pltpu.VMEM),  # recv
            tile_spec(), tile_spec(),    # e, sg
            block_spec(),                # d_proj (node block)
            pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                         memory_space=pltpu.VMEM),  # mask
            const_spec((h, h)),          # w_e
            const_spec((nh, h, h)),      # ws
            const_spec((nh, 1, h)),      # bs
            const_spec((h, h)),          # w_out
            const_spec((1, h)),          # b_out
            const_spec((1, h)),          # ln_scale
            const_spec((1, h)),          # ln_bias
            tile_spec(),                 # ct_e
            block_spec(),                # ct_agg
        ],
        out_specs=(
            tile_spec(),                 # d_e
            tile_spec(),                 # d_sg
            block_spec(),                # d_dproj (per-block accumulator)
            const_spec((h, h)),          # dW_e   (resident accumulators)
            const_spec((nh, h, h)),      # dWs
            const_spec((nh, 1, h)),      # dbs
            const_spec((h, h)),          # dW_out
            const_spec((1, h)),          # db_out
            const_spec((1, h)),          # dscale
            const_spec((1, h)),          # dbias
        ),
    )
    ws_in = ws if n_hidden else jnp.zeros((1, h, h), e.dtype)
    bs_in = (bs.reshape(n_hidden, 1, h) if n_hidden
             else jnp.zeros((1, 1, h), e.dtype))
    outs = pl.pallas_call(
        _make_bwd_kernel(n_hidden),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(e.shape, e.dtype),      # d_e
            jax.ShapeDtypeStruct(e.shape, e.dtype),      # d_sg
            jax.ShapeDtypeStruct((num_nodes, h), e.dtype),  # d_dproj
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((nh, h, h), jnp.float32),
            jax.ShapeDtypeStruct((nh, 1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * n_tiles * ET * h * h * (2 + n_hidden))
            + 6 * n_tiles * ET * NB * h,
            bytes_accessed=7 * e.size * e.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_block, tile_first, recv2d, e, sg, d_proj, mask2d,
      w_e, ws_in, bs_in, w_out, b_out.reshape(1, h),
      ln_scale.reshape(1, h), ln_bias.reshape(1, h), ct_e, ct_agg)
    (d_e, d_sg, d_dproj, dwe, dws, dbs, dwo, dbo, dscale, dbias) = outs
    dws_out = dws[:n_hidden].astype(ws.dtype)
    dbs_out = dbs[:n_hidden, 0].astype(bs.dtype) if n_hidden \
        else jnp.zeros_like(bs)
    return (d_e, d_sg, d_dproj.astype(d_proj.dtype), None, None,
            dwe.astype(w_e.dtype), dws_out, dbs_out,
            dwo.astype(w_out.dtype), dbo[0].astype(b_out.dtype),
            dscale[0].astype(ln_scale.dtype), dbias[0].astype(ln_bias.dtype))
