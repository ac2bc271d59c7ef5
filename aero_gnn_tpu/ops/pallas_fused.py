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
from aero_gnn_tpu.ops.pallas_segment import (
    build_onehot, build_onehot_t, derive_tiles, onehot_precomp_enabled,
    onehot_premask_enabled, precomp_onehot_t, premask_receivers, recv_rows)

NB = ALIGN_NODE_BLOCK
ET = ALIGN_EDGE_TILE


def _warn_precomp_ignored(which, *, premask, save_acts, split, ET):
    """AERO_GNN_ONEHOT=precomp only applies on the split-ILP kernels; a
    silent fallback to the in-kernel one-hot would mislabel A/B probe
    measurements (ADVICE r3), so say when the precondition fails."""
    import warnings

    reason = ("premask layout off" if not premask else
              "save_acts forward" if save_acts else
              f"split={split} (need >=2 with ET {ET} divisible)")
    warnings.warn(
        f"AERO_GNN_ONEHOT=precomp ignored in the fused {which} kernel "
        f"({reason}); measuring the in-kernel one-hot instead",
        stacklevel=3)


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


def _relu_mask(dz, act, dt):
    """dz masked by act > 0. Default: compare in f32 (historically Mosaic
    lacked bf16 vector comparisons); AERO_GNN_BF16_CMP=1 probes the direct
    bf16 compare (saves a [rows, h] cast per mask)."""
    import os

    if os.environ.get("AERO_GNN_BF16_CMP") == "1":
        return dz * (act > 0).astype(dt)
    return dz * (act.astype(jnp.float32) > 0).astype(dt)


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


def save_acts_enabled() -> bool:
    """AERO_GNN_SAVE_ACTS=1: the fused forward additionally writes the
    post-ReLU activations ``zs``, the pre-LayerNorm output ``d`` (exact —
    already bf16-rounded in forward) and the f32 LN stats ``mu``/``inv`` to
    HBM, and the fused backward consumes them instead of recomputing the
    whole forward chain per tile. Trades ~3 extra [E, h] streams each way
    (DMA, overlappable) for ~5 fewer dependent MXU ops + their VPU
    interleave in the serial backward chain. Default off pending A/B."""
    import os

    return os.environ.get("AERO_GNN_SAVE_ACTS", "0") == "1"


def fwd_split() -> int:
    """AERO_GNN_FWD_SPLIT=K (default 8): like bwd_split but for the fused
    forward — the per-tile forward is a ~5-deep dependent matmul chain
    (gather, h0, hidden stack, out, aggregation). K interleaved row groups
    keep the MXU pipeline fed across the dependencies. Measured (65k
    bench): K=4 66.5 -> 65.9 ms/step, K=2 neutral; round-4 retune K=8
    beats K=4 at 65k (60.53 vs 60.95 ms/step) AND 524k (869.8 vs 876.7)
    — 128-row groups still fill the 8-sublane VPU/MXU tiles. Requires the
    premask path; incompatible with save_acts (whose saved layout is
    per-tile)."""
    import os

    try:
        return int(os.environ.get("AERO_GNN_FWD_SPLIT", "8"))
    except ValueError:
        return 8


def _make_kernel(n_hidden: int, activation: str, premask: bool,
                 save_acts: bool = False):
    if activation != "relu":
        raise ValueError("fused kernel supports relu (the reference "
                         "hardcodes ReLU in EdgeBlockSum)")

    def kernel(tile_block_ref, tile_first_ref,
               recv_ref, e_ref, sg_ref, dproj_ref, *rest):
        if premask:
            mask_ref = None
        else:
            mask_ref, rest = rest[0], rest[1:]
        (w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
         ln_scale_ref, ln_bias_ref, e_out_ref, agg_ref) = rest[:9]
        if save_acts:
            zs_out_ref, d_out_ref, mu_out_ref, inv_out_ref = rest[9:]
        t = pl.program_id(0)

        @pl.when(tile_first_ref[t] == 1)
        def _():
            agg_ref[:] = jnp.zeros_like(agg_ref)

        e = e_ref[:]

        # shared one-hot (transposed [NB, ET] row form when premasked —
        # see pallas_segment.build_onehot_t)
        base = tile_block_ref[t] * NB
        if premask:
            onehot_t = build_onehot_t(recv_ref[0], base, e.dtype)
            dg = jax.lax.dot_general(
                onehot_t, dproj_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(e.dtype)
        else:
            onehot = build_onehot(recv_ref[:], base, e.dtype, mask_ref[:])
            dg = jax.lax.dot_general(
                onehot, dproj_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(e.dtype)

        h0 = jax.lax.dot_general(
            e, w_e_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(e.dtype) + sg_ref[:] + dg
        z = jnp.maximum(h0, 0)
        if save_acts:
            zs_out_ref[0] = z
        for i in range(n_hidden):
            z = jnp.maximum(
                jax.lax.dot_general(
                    z, ws_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(e.dtype) + bs_ref[i], 0)
            if save_acts:
                zs_out_ref[i + 1] = z
        de = jax.lax.dot_general(
            z, w_out_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(e.dtype) + b_out_ref[:]

        # LayerNorm with f32 statistics
        def32 = de.astype(jnp.float32)
        mu, var = _ln_stats(def32, def32.shape[-1])
        inv = jax.lax.rsqrt(var + LN_EPS)
        if save_acts:
            d_out_ref[:] = de
            mu_out_ref[:] = mu
            inv_out_ref[:] = inv
        ln = (def32 - mu) * inv
        ln = ln * ln_scale_ref[:].astype(jnp.float32) \
            + ln_bias_ref[:].astype(jnp.float32)

        e_new = e + ln.astype(e.dtype)
        e_out_ref[:] = e_new

        # masked one-hot aggregation into the resident output block
        if premask:
            agg_ref[:] += jax.lax.dot_general(
                onehot_t, e_new, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(agg_ref.dtype)
        else:
            agg_ref[:] += jax.lax.dot_general(
                onehot, e_new, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(agg_ref.dtype)

    return kernel



def mm_native_out() -> bool:
    """AERO_GNN_MM_NATIVE=1: chain matmuls emit their compute dtype via
    preferred_element_type instead of an explicit f32->bf16 cast op
    (accumulator matmuls stay f32). Probes whether Mosaic folds the round
    into the MXU epilogue."""
    import os

    return os.environ.get("AERO_GNN_MM_NATIVE", "0") == "1"


def _make_kernel_split(n_hidden: int, activation: str, split: int,
                       precomp: bool = False):
    """Premask-only forward with ``split`` interleaved row groups per tile
    (see fwd_split). With ``precomp`` the transposed one-hot arrives as a
    DMA'd [NB, ET] operand (onehot_precomp_enabled) instead of being
    built from the receiver rows on the VPU."""
    if activation != "relu":
        raise ValueError("fused kernel supports relu (the reference "
                         "hardcodes ReLU in EdgeBlockSum)")

    def kernel(tile_block_ref, tile_first_ref,
               recv_ref, *rest):
        if precomp:
            (oh_ref, e_ref, sg_ref, dproj_ref,
             w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
             ln_scale_ref, ln_bias_ref, e_out_ref, agg_ref) = rest
        else:
            (e_ref, sg_ref, dproj_ref,
             w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
             ln_scale_ref, ln_bias_ref, e_out_ref, agg_ref) = rest
        t = pl.program_id(0)

        @pl.when(tile_first_ref[t] == 1)
        def _():
            agg_ref[:] = jnp.zeros_like(agg_ref)

        def mm(a, b, ta=False):
            dims = ((((0,) if ta else (1,)), ((0,))), ((), ()))
            return jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32)

        S = ET // split
        R = range(split)

        def half(a, i):
            return jax.lax.slice_in_dim(a, i * S, (i + 1) * S, axis=0)

        e_full = e_ref[:]
        dt = e_full.dtype

        def mmd(a, b, ta=False):
            # chain matmul: output already in the compute dtype
            if mm_native_out():
                dims = ((((0,) if ta else (1,)), ((0,))), ((), ()))
                return jax.lax.dot_general(a, b, dims,
                                           preferred_element_type=dt)
            return mm(a, b, ta=ta).astype(dt)
        sg_full = sg_ref[:]
        dproj = dproj_ref[:]
        w_e = w_e_ref[:]
        w_out = w_out_ref[:]
        base = tile_block_ref[t] * NB
        recv = recv_ref[0]  # [1, ET] row layout
        scale32 = ln_scale_ref[:].astype(jnp.float32)
        bias32 = ln_bias_ref[:].astype(jnp.float32)

        if precomp:
            oh = oh_ref[0]  # [NB, ET]
            onehot_t = [jax.lax.slice_in_dim(oh, i * S, (i + 1) * S,
                                             axis=1) for i in R]
        else:
            onehot_t = [build_onehot_t(
                jax.lax.slice_in_dim(recv, i * S, (i + 1) * S, axis=1),
                base, dt) for i in R]
        e_h = [half(e_full, i) for i in R]
        dg = [mmd(onehot_t[i], dproj, ta=True) for i in R]
        z = [jnp.maximum(mmd(e_h[i], w_e)
                         + half(sg_full, i) + dg[i], 0) for i in R]
        for l in range(n_hidden):
            z = [jnp.maximum(mmd(z[i], ws_ref[l]) + bs_ref[l], 0)
                 for i in R]
        de = [mmd(z[i], w_out) + b_out_ref[:] for i in R]
        d32 = [de[i].astype(jnp.float32) for i in R]
        stats = [_ln_stats(d32[i], d32[i].shape[-1]) for i in R]
        ln = [(d32[i] - stats[i][0])
              * jax.lax.rsqrt(stats[i][1] + LN_EPS) for i in R]
        e_new = [e_h[i] + (ln[i] * scale32 + bias32).astype(dt) for i in R]
        for i in R:
            e_out_ref[i * S:(i + 1) * S] = e_new[i]
        agg_parts = [mm(onehot_t[i], e_new[i]) for i in R]
        acc = agg_parts[0]
        for i in R[1:]:
            acc = acc + agg_parts[i]
        agg_ref[:] += acc.astype(agg_ref.dtype)

    return kernel


def _fused_fwd(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
               ln_scale, ln_bias, num_nodes: int, activation: str,
               save_acts: bool = False):
    n_tiles = receivers.shape[0] // ET
    h = e.shape[1]
    n_hidden = ws.shape[0]
    tile_block, tile_first = derive_tiles(receivers)
    premask = onehot_premask_enabled()
    if premask:
        recv2d = recv_rows(premask_receivers(receivers, mask))
        recv_spec = pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        recv2d = receivers.reshape(-1, 1)
        recv_spec = pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                                 memory_space=pltpu.VMEM)
    mask2d = None if premask else mask.reshape(-1, 1)

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

    mask_specs = [] if premask else [
        pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                     memory_space=pltpu.VMEM)]
    mask_operands = [] if premask else [mask2d]
    extra_out_specs = []
    extra_out_shapes = []
    if save_acts:
        nh1 = n_hidden + 1
        extra_out_specs = [
            pl.BlockSpec((nh1, ET, h), lambda t, tb, tf: (0, t, 0),
                         memory_space=pltpu.VMEM),  # zs
            tile_spec(),                            # d (pre-LN, bf16 exact)
            pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                         memory_space=pltpu.VMEM),  # mu (f32)
            pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                         memory_space=pltpu.VMEM),  # inv (f32)
        ]
        extra_out_shapes = [
            jax.ShapeDtypeStruct((nh1, e.shape[0], h), e.dtype),
            jax.ShapeDtypeStruct(e.shape, e.dtype),
            jax.ShapeDtypeStruct((e.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((e.shape[0], 1), jnp.float32),
        ]
    split = fwd_split()
    use_split = premask and not save_acts and split >= 2 and ET % split == 0
    precomp = use_split and onehot_precomp_enabled()
    if onehot_precomp_enabled() and not use_split:
        _warn_precomp_ignored("forward", premask=premask,
                              save_acts=save_acts, split=split, ET=ET)
    oh_operands = []
    oh_specs = []
    if precomp:
        oh_operands = [precomp_onehot_t(recv2d, tile_block, e.dtype)]
        oh_specs = [pl.BlockSpec((1, NB, ET), lambda t, tb, tf: (t, 0, 0),
                                 memory_space=pltpu.VMEM)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            recv_spec,    # recv ([1, ET] rows when premasked)
            *oh_specs,    # precomputed transposed one-hot (precomp mode)
            tile_spec(),  # e
            tile_spec(),  # sg
            block_spec(),  # d_proj (node block)
            *mask_specs,  # mask (legacy mode only)
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
            *extra_out_specs,
        ),
    )
    ws_in = ws if n_hidden else jnp.zeros((1, h, h), e.dtype)
    bs_in = (bs.reshape(n_hidden, 1, h) if n_hidden
             else jnp.zeros((1, 1, h), e.dtype))
    if use_split:
        fwd_kernel = _make_kernel_split(n_hidden, activation, split,
                                        precomp=precomp)
    else:
        fwd_kernel = _make_kernel(n_hidden, activation, premask, save_acts)
    return pl.pallas_call(
        fwd_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(e.shape, e.dtype),
            jax.ShapeDtypeStruct((num_nodes, h), e.dtype),
            *extra_out_shapes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * ET * h * h * (2 + n_hidden)
            + 4 * n_tiles * ET * NB * h,
            bytes_accessed=4 * e.size * e.dtype.itemsize
            + (n_tiles * NB * ET * e.dtype.itemsize if precomp else 0),
            transcendentals=0,
        ),
    )(tile_block, tile_first, recv2d, *oh_operands, e, sg, d_proj,
      *mask_operands,
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
    if save_acts_enabled():
        e2, agg, zs, d, mu, inv = _fused_fwd(
            e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
            ln_scale, ln_bias, num_nodes, activation, save_acts=True)
        # sg / d_proj are NOT residuals here (the saved backward never
        # touches them) — holding them would pin ~[E+N, h] per layer.
        return (e2, agg), (e, None, None, mask, receivers, w_e, ws, bs,
                           w_out, b_out, ln_scale, ln_bias, (zs, d, mu, inv))
    out = _fused_fwd(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out,
                     b_out, ln_scale, ln_bias, num_nodes, activation)
    return out, (e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
                 ln_scale, ln_bias, None)


def _fel_bwd(num_nodes, activation, res, ct):
    (e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
     ln_scale, ln_bias, saved) = res
    import os

    if saved is not None:
        return _fused_bwd_saved(e, mask, receivers, w_e, ws, w_out,
                                ln_scale, saved, num_nodes, ct,
                                bs_shape=bs, b_out_shape=b_out,
                                ln_bias_shape=ln_bias)
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

def _make_bwd_kernel(n_hidden: int, premask: bool):
    def kernel(tile_block_ref, tile_first_ref,
               recv_ref, e_ref, sg_ref, dproj_ref, *rest):
        if premask:
            (w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
             ln_scale_ref, ln_bias_ref, ct_e_ref, ct_agg_ref,
             de_out_ref, dsg_out_ref, ddproj_ref,
             dwe_ref, dws_ref, dbs_ref, dwo_ref, dbo_ref,
             dscale_ref, dbias_ref) = rest
            mask_ref = None
        else:
            (mask_ref, w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
             ln_scale_ref, ln_bias_ref, ct_e_ref, ct_agg_ref,
             de_out_ref, dsg_out_ref, ddproj_ref,
             dwe_ref, dws_ref, dbs_ref, dwo_ref, dbo_ref,
             dscale_ref, dbias_ref) = rest
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

        # shared one-hot (transposed row form when premasked)
        base = tile_block_ref[t] * NB
        if premask:
            onehot_t = build_onehot_t(recv_ref[0], base, dt)
        else:
            onehot = build_onehot(recv_ref[:], base, dt, mask_ref[:])

        def oh_gather(block):
            # [ET, h] rows gathered from a [NB, h] block
            if premask:
                return mm(onehot_t, block, ta=True)
            return mm(onehot, block)

        def oh_scatter(rows):
            # [NB, h] accumulation of [ET, h] rows
            if premask:
                return mm(onehot_t, rows)
            return mm(onehot, rows, ta=True)

        # ---- recompute forward chain (activations stay in VMEM) ----
        dg = oh_gather(dproj_ref[:]).astype(dt)
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
        ct_total = ct_e_ref[:] + oh_gather(ct_agg_ref[:]).astype(dt)

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
        dz = _relu_mask(mm(d_d, w_out_ref[:], tb=True).astype(dt),
                        acts[-1], dt)

        # ---- hidden stack (reverse) ----
        for i in reversed(range(n_hidden)):
            dws_ref[i] += mm(acts[i], dz, ta=True)
            dbs_ref[i] += _colsum(dz)
            dz = _relu_mask(mm(dz, ws_ref[i], tb=True).astype(dt),
                            acts[i], dt)

        # dz is now d(h0) == d_sg == d_dg (pre-mask)
        dwe_ref[:] += mm(e, dz, ta=True)
        d_e = ct_total + mm(dz, w_e_ref[:], tb=True).astype(dt)
        de_out_ref[:] = d_e
        dsg_out_ref[:] = dz
        # d(d_proj): transpose of the masked in-kernel gather
        ddproj_ref[:] += oh_scatter(dz).astype(ddproj_ref.dtype)

    return kernel


def _fused_bwd(e, sg, d_proj, mask, receivers, w_e, ws, bs, w_out, b_out,
               ln_scale, ln_bias, num_nodes: int, ct):
    ct_e, ct_agg = ct
    n_tiles = receivers.shape[0] // ET
    h = e.shape[1]
    n_hidden = ws.shape[0]
    tile_block, tile_first = derive_tiles(receivers)
    premask = onehot_premask_enabled()
    if premask:
        recv2d = recv_rows(premask_receivers(receivers, mask))
        recv_spec = pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        recv2d = receivers.reshape(-1, 1)
        recv_spec = pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                                 memory_space=pltpu.VMEM)
    mask2d = None if premask else mask.reshape(-1, 1)

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
    mask_specs = [] if premask else [
        pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                     memory_space=pltpu.VMEM)]
    mask_operands = [] if premask else [mask2d]
    split = bwd_split()
    use_split = premask and split >= 2 and ET % split == 0
    precomp = use_split and onehot_precomp_enabled()
    if onehot_precomp_enabled() and not use_split:
        _warn_precomp_ignored("backward", premask=premask,
                              save_acts=False, split=split, ET=ET)
    oh_operands = []
    oh_specs = []
    if precomp:
        oh_operands = [precomp_onehot_t(recv2d, tile_block, e.dtype)]
        oh_specs = [pl.BlockSpec((1, NB, ET), lambda t, tb, tf: (t, 0, 0),
                                 memory_space=pltpu.VMEM)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            recv_spec,                   # recv ([1, ET] rows when premasked)
            *oh_specs,                   # precomputed one-hot (precomp mode)
            tile_spec(), tile_spec(),    # e, sg
            block_spec(),                # d_proj (node block)
            *mask_specs,                 # mask (legacy mode only)
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
    if use_split:
        bwd_kernel = _make_bwd_kernel_split(n_hidden, split,
                                            precomp=precomp)
    else:
        bwd_kernel = _make_bwd_kernel(n_hidden, premask)
    outs = pl.pallas_call(
        bwd_kernel,
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
            bytes_accessed=7 * e.size * e.dtype.itemsize
            + (n_tiles * NB * ET * e.dtype.itemsize if precomp else 0),
            transcendentals=0,
        ),
    )(tile_block, tile_first, recv2d, *oh_operands, e, sg, d_proj,
      *mask_operands,
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


def bwd_split() -> int:
    """AERO_GNN_BWD_SPLIT=K (default 2): the fused backward processes each
    edge tile as K independent row groups with the ops of each stage emitted
    interleaved. The per-tile computation is one long DEPENDENT matmul chain
    (~14 MXU ops); on an in-order core each dependent matmul pays the MXU
    pipeline latency. K independent half-chains give the core an issue-ready
    op while the other chain's result is still in flight. Measured (65k
    bench, unrolled processor): K=2 69.8 -> 66.3 ms/step; K=4 67.1 (more
    VPU splitting overhead than latency left to hide). 0 disables. Requires
    the premask one-hot path (falls back to the unsplit kernel otherwise)."""
    import os

    try:
        return int(os.environ.get("AERO_GNN_BWD_SPLIT", "2"))
    except ValueError:
        return 2


def _make_bwd_kernel_split(n_hidden: int, split: int,
                           precomp: bool = False):
    """Premask-only backward with ``split`` interleaved row groups per tile
    (see bwd_split). Stage-by-stage list comprehensions emit the groups'
    ops adjacently, so consecutive MXU ops are data-independent. With
    ``precomp`` the transposed one-hot arrives as a DMA'd [NB, ET]
    operand (onehot_precomp_enabled) instead of a VPU build."""

    def kernel(tile_block_ref, tile_first_ref,
               recv_ref, *rest):
        if precomp:
            (oh_ref, e_ref, sg_ref, dproj_ref,
             w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
             ln_scale_ref, ln_bias_ref, ct_e_ref, ct_agg_ref,
             de_out_ref, dsg_out_ref, ddproj_ref,
             dwe_ref, dws_ref, dbs_ref, dwo_ref, dbo_ref,
             dscale_ref, dbias_ref) = rest
        else:
            (e_ref, sg_ref, dproj_ref,
             w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
             ln_scale_ref, ln_bias_ref, ct_e_ref, ct_agg_ref,
             de_out_ref, dsg_out_ref, ddproj_ref,
             dwe_ref, dws_ref, dbs_ref, dwo_ref, dbo_ref,
             dscale_ref, dbias_ref) = rest
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

        S = ET // split
        R = range(split)

        def half(a, i):
            return jax.lax.slice_in_dim(a, i * S, (i + 1) * S, axis=0)

        e_full = e_ref[:]
        dt = e_full.dtype

        def mmd(a, b, ta=False, tb=False):
            # chain matmul: output already in the compute dtype
            if mm_native_out():
                dims = ((((0,) if ta else (1,)), ((1,) if tb else (0,))),
                        ((), ()))
                return jax.lax.dot_general(a, b, dims,
                                           preferred_element_type=dt)
            return mm(a, b, ta=ta, tb=tb).astype(dt)
        sg_full = sg_ref[:]
        ct_e_full = ct_e_ref[:]
        dproj = dproj_ref[:]
        ct_agg = ct_agg_ref[:]
        w_e = w_e_ref[:]
        w_out = w_out_ref[:]
        scale32 = ln_scale_ref[:].astype(jnp.float32)
        base = tile_block_ref[t] * NB
        recv = recv_ref[0]  # [1, ET] row layout

        if precomp:
            oh = oh_ref[0]  # [NB, ET]
            onehot_t = [jax.lax.slice_in_dim(oh, i * S, (i + 1) * S,
                                             axis=1) for i in R]
        else:
            onehot_t = [build_onehot_t(
                jax.lax.slice_in_dim(recv, i * S, (i + 1) * S, axis=1),
                base, dt) for i in R]
        e_h = [half(e_full, i) for i in R]

        # ---- recompute forward chain, stagewise-interleaved ----
        dg = [mmd(onehot_t[i], dproj, ta=True) for i in R]
        h0 = [mmd(e_h[i], w_e) + half(sg_full, i) + dg[i]
              for i in R]
        acts = [[jnp.maximum(h0[i], 0)] for i in R]
        for l in range(n_hidden):
            zi = [mmd(acts[i][-1], ws_ref[l]) + bs_ref[l]
                  for i in R]
            for i in R:
                acts[i].append(jnp.maximum(zi[i], 0))
        d = [mmd(acts[i][-1], w_out) + b_out_ref[:] for i in R]
        d32 = [d[i].astype(jnp.float32) for i in R]
        stats = [_ln_stats(d32[i], d32[i].shape[-1]) for i in R]
        inv = [jax.lax.rsqrt(stats[i][1] + LN_EPS) for i in R]
        xn = [(d32[i] - stats[i][0]) * inv[i] for i in R]

        # ---- cotangents ----
        ct_tot = [half(ct_e_full, i) + mmd(onehot_t[i], ct_agg, ta=True)
                  for i in R]
        ct32 = [ct_tot[i].astype(jnp.float32) for i in R]
        if ln_mxu_mode() == "2":
            # LN backward inlined stagewise so the row groups' ops
            # interleave (the _ln_bwd call would serialize per group)
            h = ct32[0].shape[1]
            ones_h = jnp.full((h, 1), 1.0 / h, jnp.float32)
            mmc = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g = [ct32[i] * scale32 for i in R]
            gxn = [g[i] * xn[i] for i in R]
            mean_g = [mmc(g[i], ones_h) for i in R]
            mean_gxn = [mmc(gxn[i], ones_h) for i in R]
            t1 = [ct32[i] * xn[i] for i in R]
            acc_s = _colsum(t1[0])
            acc_b = _colsum(ct32[0])
            for i in R[1:]:
                acc_s = acc_s + _colsum(t1[i])
                acc_b = acc_b + _colsum(ct32[i])
            d_d32 = [(g[i] - mean_g[i] - xn[i] * mean_gxn[i]) * inv[i]
                     for i in R]
            lnb = [(d_d32[i], None, None) for i in R]
        else:
            lnb = [_ln_bwd(ct32[i], xn[i], inv[i], scale32) for i in R]
            acc_s = lnb[0][1]
            acc_b = lnb[0][2]
            for i in R[1:]:
                acc_s = acc_s + lnb[i][1]
                acc_b = acc_b + lnb[i][2]
        dscale_ref[:] += acc_s
        dbias_ref[:] += acc_b
        d_d = [lnb[i][0].astype(dt) for i in R]

        dwo_parts = [mm(acts[i][-1], d_d[i], ta=True) for i in R]
        dwo_acc = dwo_parts[0]
        for i in R[1:]:
            dwo_acc = dwo_acc + dwo_parts[i]
        dwo_ref[:] += dwo_acc
        dbo_acc = _colsum(d_d[0])
        for i in R[1:]:
            dbo_acc = dbo_acc + _colsum(d_d[i])
        dbo_ref[:] += dbo_acc
        dz = [mmd(d_d[i], w_out, tb=True) for i in R]
        dz = [_relu_mask(dz[i], acts[i][-1], dt) for i in R]

        for l in reversed(range(n_hidden)):
            dws_parts = [mm(acts[i][l], dz[i], ta=True) for i in R]
            acc = dws_parts[0]
            for i in R[1:]:
                acc = acc + dws_parts[i]
            dws_ref[l] += acc
            acc = _colsum(dz[0])
            for i in R[1:]:
                acc = acc + _colsum(dz[i])
            dbs_ref[l] += acc
            dz = [mmd(dz[i], ws_ref[l], tb=True) for i in R]
            dz = [_relu_mask(dz[i], acts[i][l], dt) for i in R]

        dwe_parts = [mm(e_h[i], dz[i], ta=True) for i in R]
        acc = dwe_parts[0]
        for i in R[1:]:
            acc = acc + dwe_parts[i]
        dwe_ref[:] += acc
        d_e = [ct_tot[i] + mmd(dz[i], w_e, tb=True) for i in R]
        for i in R:
            de_out_ref[i * S:(i + 1) * S] = d_e[i]
            dsg_out_ref[i * S:(i + 1) * S] = dz[i]
        ddp_parts = [mm(onehot_t[i], dz[i]) for i in R]
        acc = ddp_parts[0]
        for i in R[1:]:
            acc = acc + ddp_parts[i]
        ddproj_ref[:] += acc.astype(ddproj_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# saved-activations backward (AERO_GNN_SAVE_ACTS=1): the forward streamed the
# post-ReLU activations, pre-LN output and f32 LN stats to HBM, so this
# kernel starts directly at the LayerNorm backward — the per-tile serial
# chain drops the gather + 3-matmul recompute (and its VPU interleave), and
# the sg / d_proj streams disappear from the backward entirely. The one-hot
# here is always premasked (receiver -1 on pad edges).
# ---------------------------------------------------------------------------

def _make_bwd_kernel_saved(n_hidden: int):
    def kernel(tile_block_ref, tile_first_ref,
               recv_ref, e_ref, zs_ref, d_ref, mu_ref, inv_ref,
               w_e_ref, ws_ref, w_out_ref, ln_scale_ref,
               ct_e_ref, ct_agg_ref,
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

        base = tile_block_ref[t] * NB
        onehot_t = build_onehot_t(recv_ref[0], base, dt)

        # xn recomputed exactly: d is the forward's bf16 value, mu/inv the
        # forward's f32 stats
        inv = inv_ref[:]
        xn = (d_ref[:].astype(jnp.float32) - mu_ref[:]) * inv

        ct_total = ct_e_ref[:] + mm(onehot_t, ct_agg_ref[:],
                                    ta=True).astype(dt)
        ct32 = ct_total.astype(jnp.float32)
        d_d, dscale, dbias = _ln_bwd(
            ct32, xn, inv, ln_scale_ref[:].astype(jnp.float32))
        dscale_ref[:] += dscale
        dbias_ref[:] += dbias
        d_d = d_d.astype(dt)

        z_last = zs_ref[n_hidden]
        dwo_ref[:] += mm(z_last, d_d, ta=True)
        dbo_ref[:] += _colsum(d_d)
        dz = _relu_mask(mm(d_d, w_out_ref[:], tb=True).astype(dt),
                        z_last, dt)

        for i in reversed(range(n_hidden)):
            zi = zs_ref[i]
            dws_ref[i] += mm(zi, dz, ta=True)
            dbs_ref[i] += _colsum(dz)
            dz = _relu_mask(mm(dz, ws_ref[i], tb=True).astype(dt),
                            zi, dt)

        dwe_ref[:] += mm(e, dz, ta=True)
        de_out_ref[:] = ct_total + mm(dz, w_e_ref[:], tb=True).astype(dt)
        dsg_out_ref[:] = dz
        ddproj_ref[:] += mm(onehot_t, dz).astype(ddproj_ref.dtype)

    return kernel


def _fused_bwd_saved(e, mask, receivers, w_e, ws, w_out, ln_scale, saved,
                     num_nodes: int, ct, *, bs_shape, b_out_shape,
                     ln_bias_shape):
    zs, d, mu, inv = saved
    ct_e, ct_agg = ct
    n_tiles = receivers.shape[0] // ET
    h = e.shape[1]
    n_hidden = ws.shape[0]
    tile_block, tile_first = derive_tiles(receivers)
    recv2d = recv_rows(premask_receivers(receivers, mask))

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

    def col_spec():
        return pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                            memory_space=pltpu.VMEM)

    nh = max(n_hidden, 1)
    nh1 = n_hidden + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # recv rows (premasked)
            tile_spec(),                 # e
            pl.BlockSpec((nh1, ET, h), lambda t, tb, tf: (0, t, 0),
                         memory_space=pltpu.VMEM),  # zs
            tile_spec(),                 # d
            col_spec(),                  # mu
            col_spec(),                  # inv
            const_spec((h, h)),          # w_e
            const_spec((nh, h, h)),      # ws
            const_spec((h, h)),          # w_out
            const_spec((1, h)),          # ln_scale
            tile_spec(),                 # ct_e
            block_spec(),                # ct_agg
        ],
        out_specs=(
            tile_spec(),                 # d_e
            tile_spec(),                 # d_sg
            block_spec(),                # d_dproj
            const_spec((h, h)),          # dW_e
            const_spec((nh, h, h)),      # dWs
            const_spec((nh, 1, h)),      # dbs
            const_spec((h, h)),          # dW_out
            const_spec((1, h)),          # db_out
            const_spec((1, h)),          # dscale
            const_spec((1, h)),          # dbias
        ),
    )
    ws_in = ws if n_hidden else jnp.zeros((1, h, h), e.dtype)
    outs = pl.pallas_call(
        _make_bwd_kernel_saved(n_hidden),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(e.shape, e.dtype),
            jax.ShapeDtypeStruct(e.shape, e.dtype),
            jax.ShapeDtypeStruct((num_nodes, h), e.dtype),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((nh, h, h), jnp.float32),
            jax.ShapeDtypeStruct((nh, 1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * n_tiles * ET * h * h * (2 + n_hidden))
            + 4 * n_tiles * ET * NB * h,
            bytes_accessed=9 * e.size * e.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_block, tile_first, recv2d, e, zs, d, mu, inv,
      w_e, ws_in, w_out, ln_scale.reshape(1, h), ct_e, ct_agg)
    (d_e, d_sg, d_dproj, dwe, dws, dbs, dwo, dbo, dscale, dbias) = outs
    dws_out = dws[:n_hidden].astype(ws.dtype)
    dbs_out = dbs[:n_hidden, 0].astype(bs_shape.dtype) if n_hidden \
        else jnp.zeros_like(bs_shape)
    # sg / d_proj share e's compute dtype (the whole chain is one dtype)
    return (d_e, d_sg, d_dproj.astype(e.dtype), None, None,
            dwe.astype(w_e.dtype), dws_out, dbs_out,
            dwo.astype(w_out.dtype), dbo[0].astype(b_out_shape.dtype),
            dscale[0].astype(ln_scale.dtype),
            dbias[0].astype(ln_bias_shape.dtype))
