"""Fused node-block Pallas kernel.

One pass over node row blocks computes the ENTIRE NodeBlock update
(/root/reference/models/mgnLayer.py:111-153 semantics, concat form) plus the
residual without materializing any [N, h] intermediate in HBM:

    z  = act(x @ W1x + agg @ W1a + b1)     (split of the concat first linear)
    z  = act(z @ W_i + b_i) ...            (hidden stack)
    d  = z @ W_out + b_out;  d = LayerNorm(d)
    x' = x + d

The concat [x, agg] of the unfused path is never built: the first linear is
split row-wise (W1x = W1[:h], W1a = W1[h:]) which is the same math. vs the
XLA path this saves the concat materialization plus ~4 [N, h] HBM
round-trips per layer. Weights live in VMEM across the whole grid (constant
index maps).

Backward (custom VJP): a matching kernel recomputes the dense chain per
block in VMEM and produces d_x / d_agg plus weight-grad accumulators that
stay VMEM-resident across the grid (constant output index maps). Set
AERO_GNN_FUSED_NODE=0 to fall back to the XLA composition.

Unlike the edge kernel this one has no gather/scatter: it requires only
``num_nodes % block == 0`` (block = 512 when divisible, else the 256-node
ALIGN_NODE_BLOCK), not the aligned-edge layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aero_gnn_tpu.nn.mlp import LN_EPS
from aero_gnn_tpu.ops.pallas_fused import _colsum, _ln_bwd, _ln_stats


def _mm(a, b, ta=False, tb=False):
    dims = ((((0,) if ta else (1,)), ((1,) if tb else (0,))), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def node_split(blk: int) -> int:
    """AERO_GNN_NODE_SPLIT=K (default 2): interleaved row groups per node
    block, same rationale as pallas_fused.bwd_split — the per-block chain
    is ~4 (fwd) / ~12 (bwd) dependent MXU ops."""
    import os

    try:
        k = int(os.environ.get("AERO_GNN_NODE_SPLIT", "2"))
    except ValueError:
        k = 2
    return k if k >= 2 and blk % k == 0 else 1


def _row_groups(blk: int):
    split = node_split(blk)
    S = blk // split

    def half(a, i):
        return jax.lax.slice_in_dim(a, i * S, (i + 1) * S, axis=0)

    return range(split), S, half


def _make_fwd_kernel(n_hidden: int, blk: int):
    def kernel(x_ref, agg_ref, w1x_ref, w1a_ref, b1_ref, ws_ref, bs_ref,
               wo_ref, bo_ref, scale_ref, bias_ref, out_ref):
        x_full = x_ref[:]
        agg_full = agg_ref[:]
        dt = x_full.dtype
        R, S, half = _row_groups(blk)
        x = [half(x_full, i) for i in R]
        z = [jnp.maximum(
            (_mm(x[i], w1x_ref[:])
             + _mm(half(agg_full, i), w1a_ref[:])).astype(dt)
            + b1_ref[:], 0) for i in R]
        for k in range(n_hidden):
            z = [jnp.maximum(_mm(z[i], ws_ref[k]).astype(dt) + bs_ref[k], 0)
                 for i in R]
        d = [_mm(z[i], wo_ref[:]).astype(dt) + bo_ref[:] for i in R]
        d32 = [d[i].astype(jnp.float32) for i in R]
        stats = [_ln_stats(d32[i], d32[i].shape[-1]) for i in R]
        ln = [(d32[i] - stats[i][0])
              * jax.lax.rsqrt(stats[i][1] + LN_EPS) for i in R]
        scale32 = scale_ref[:].astype(jnp.float32)
        bias32 = bias_ref[:].astype(jnp.float32)
        for i in R:
            out_ref[i * S:(i + 1) * S] = \
                x[i] + (ln[i] * scale32 + bias32).astype(dt)

    return kernel


def _block_rows(n: int) -> int:
    return 512 if n % 512 == 0 else 256


def _specs(n_rows: int, h: int, n_hidden: int):
    blk = _block_rows(n_rows)

    def row_spec():
        return pl.BlockSpec((blk, h), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    nh = max(n_hidden, 1)
    weight_specs = [
        const_spec((h, h)),      # w1x
        const_spec((h, h)),      # w1a
        const_spec((1, h)),      # b1
        const_spec((nh, h, h)),  # ws
        const_spec((nh, 1, h)),  # bs
        const_spec((h, h)),      # w_out
        const_spec((1, h)),      # b_out
        const_spec((1, h)),      # ln scale
        const_spec((1, h)),      # ln bias
    ]
    return blk, row_spec, const_spec, weight_specs


def _pack_weights(ws, bs, n_hidden, h, dt):
    ws_in = ws if n_hidden else jnp.zeros((1, h, h), dt)
    bs_in = (bs.reshape(n_hidden, 1, h) if n_hidden
             else jnp.zeros((1, 1, h), dt))
    return ws_in, bs_in


def _fused_node_fwd(x, agg, w1x, w1a, b1, ws, bs, w_out, b_out,
                    ln_scale, ln_bias):
    n, h = x.shape
    n_hidden = ws.shape[0]
    blk, row_spec, const_spec, weight_specs = _specs(n, h, n_hidden)
    ws_in, bs_in = _pack_weights(ws, bs, n_hidden, h, x.dtype)
    return pl.pallas_call(
        _make_fwd_kernel(n_hidden, blk),
        grid=(n // blk,),
        in_specs=[row_spec(), row_spec()] + weight_specs,
        out_specs=row_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * h * (3 + n_hidden),
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, agg, w1x, w1a, b1.reshape(1, h), ws_in, bs_in,
      w_out, b_out.reshape(1, h), ln_scale.reshape(1, h),
      ln_bias.reshape(1, h))


@jax.custom_vjp
def fused_node_layer(x, agg, w1x, w1a, b1, ws, bs, w_out, b_out,
                     ln_scale, ln_bias):
    """Fused NodeBlock + residual: x + LN(MLP([x, agg])) with the concat
    first linear split into ``w1x``/``w1a``. Requires square hidden chain
    (all dims == h) and ReLU."""
    return _fused_node_fwd(x, agg, w1x, w1a, b1, ws, bs, w_out, b_out,
                           ln_scale, ln_bias)


def _fnl_fwd(x, agg, w1x, w1a, b1, ws, bs, w_out, b_out, ln_scale, ln_bias):
    out = _fused_node_fwd(x, agg, w1x, w1a, b1, ws, bs, w_out, b_out,
                          ln_scale, ln_bias)
    return out, (x, agg, w1x, w1a, b1, ws, bs, w_out, b_out,
                 ln_scale, ln_bias)


def _make_bwd_kernel(n_hidden: int, blk: int):
    def kernel(x_ref, agg_ref, w1x_ref, w1a_ref, b1_ref, ws_ref, bs_ref,
               wo_ref, bo_ref, scale_ref, bias_ref, ct_ref,
               dx_ref, dagg_ref, dw1x_ref, dw1a_ref, db1_ref,
               dws_ref, dbs_ref, dwo_ref, dbo_ref, dscale_ref, dbias_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1x_ref[:] = jnp.zeros_like(dw1x_ref)
            dw1a_ref[:] = jnp.zeros_like(dw1a_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dws_ref[:] = jnp.zeros_like(dws_ref)
            dbs_ref[:] = jnp.zeros_like(dbs_ref)
            dwo_ref[:] = jnp.zeros_like(dwo_ref)
            dbo_ref[:] = jnp.zeros_like(dbo_ref)
            dscale_ref[:] = jnp.zeros_like(dscale_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        x_full = x_ref[:]
        agg_full = agg_ref[:]
        ct_full = ct_ref[:]
        dt = x_full.dtype
        R, S, half = _row_groups(blk)
        x = [half(x_full, i) for i in R]
        agg = [half(agg_full, i) for i in R]
        ct = [half(ct_full, i) for i in R]
        scale32 = scale_ref[:].astype(jnp.float32)

        def accum(ref, parts):
            acc = parts[0]
            for p in parts[1:]:
                acc = acc + p
            ref[:] += acc

        # ---- recompute the dense chain, stagewise-interleaved ----
        acts = [[jnp.maximum(
            (_mm(x[i], w1x_ref[:]) + _mm(agg[i], w1a_ref[:])).astype(dt)
            + b1_ref[:], 0)] for i in R]
        for k in range(n_hidden):
            zk = [_mm(acts[i][-1], ws_ref[k]).astype(dt) + bs_ref[k]
                  for i in R]
            for i in R:
                acts[i].append(jnp.maximum(zk[i], 0))
        d = [_mm(acts[i][-1], wo_ref[:]).astype(dt) + bo_ref[:] for i in R]
        d32 = [d[i].astype(jnp.float32) for i in R]
        stats = [_ln_stats(d32[i], d32[i].shape[-1]) for i in R]
        inv = [jax.lax.rsqrt(stats[i][1] + LN_EPS) for i in R]
        xn = [(d32[i] - stats[i][0]) * inv[i] for i in R]

        # ---- LayerNorm backward (f32) ----
        ct32 = [ct[i].astype(jnp.float32) for i in R]
        lnb = [_ln_bwd(ct32[i], xn[i], inv[i], scale32) for i in R]
        accum(dscale_ref, [lnb[i][1] for i in R])
        accum(dbias_ref, [lnb[i][2] for i in R])
        d_d = [lnb[i][0].astype(dt) for i in R]

        # ---- output linear ----
        accum(dwo_ref, [_mm(acts[i][-1], d_d[i], ta=True) for i in R])
        accum(dbo_ref, [_colsum(d_d[i]) for i in R])
        dz = [_mm(d_d[i], wo_ref[:], tb=True).astype(dt) for i in R]
        dz = [dz[i] * (acts[i][-1].astype(jnp.float32) > 0).astype(dt)
              for i in R]

        # ---- hidden stack (reverse) ----
        for k in reversed(range(n_hidden)):
            parts = [_mm(acts[i][k], dz[i], ta=True) for i in R]
            acc = parts[0]
            for p in parts[1:]:
                acc = acc + p
            dws_ref[k] += acc
            parts = [_colsum(dz[i]) for i in R]
            acc = parts[0]
            for p in parts[1:]:
                acc = acc + p
            dbs_ref[k] += acc
            dz = [_mm(dz[i], ws_ref[k], tb=True).astype(dt) for i in R]
            dz = [dz[i] * (acts[i][k].astype(jnp.float32) > 0).astype(dt)
                  for i in R]

        # ---- first (split) linear ----
        accum(dw1x_ref, [_mm(x[i], dz[i], ta=True) for i in R])
        accum(dw1a_ref, [_mm(agg[i], dz[i], ta=True) for i in R])
        accum(db1_ref, [_colsum(dz[i]) for i in R])
        # residual: ct flows straight through to x as well
        for i in R:
            dx_ref[i * S:(i + 1) * S] = \
                ct[i] + _mm(dz[i], w1x_ref[:], tb=True).astype(dt)
            dagg_ref[i * S:(i + 1) * S] = \
                _mm(dz[i], w1a_ref[:], tb=True).astype(dt)

    return kernel


def _fnl_bwd(res, ct):
    (x, agg, w1x, w1a, b1, ws, bs, w_out, b_out, ln_scale, ln_bias) = res
    import os

    if os.environ.get("AERO_GNN_FUSED_NODE_BWD", "1") != "1":
        _, vjp = jax.vjp(_equiv, x, agg, w1x, w1a, b1, ws, bs, w_out, b_out,
                         ln_scale, ln_bias)
        return vjp(ct)

    n, h = x.shape
    n_hidden = ws.shape[0]
    blk, row_spec, const_spec, weight_specs = _specs(n, h, n_hidden)
    ws_in, bs_in = _pack_weights(ws, bs, n_hidden, h, x.dtype)
    nh = max(n_hidden, 1)
    outs = pl.pallas_call(
        _make_bwd_kernel(n_hidden, blk),
        grid=(n // blk,),
        in_specs=[row_spec(), row_spec()] + weight_specs + [row_spec()],
        out_specs=(
            row_spec(), row_spec(),
            const_spec((h, h)), const_spec((h, h)), const_spec((1, h)),
            const_spec((nh, h, h)), const_spec((nh, 1, h)),
            const_spec((h, h)), const_spec((1, h)),
            const_spec((1, h)), const_spec((1, h)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),       # d_x
            jax.ShapeDtypeStruct(x.shape, x.dtype),       # d_agg
            jax.ShapeDtypeStruct((h, h), jnp.float32),    # dW1x
            jax.ShapeDtypeStruct((h, h), jnp.float32),    # dW1a
            jax.ShapeDtypeStruct((1, h), jnp.float32),    # db1
            jax.ShapeDtypeStruct((nh, h, h), jnp.float32),
            jax.ShapeDtypeStruct((nh, 1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),    # dW_out
            jax.ShapeDtypeStruct((1, h), jnp.float32),    # db_out
            jax.ShapeDtypeStruct((1, h), jnp.float32),    # dscale
            jax.ShapeDtypeStruct((1, h), jnp.float32),    # dbias
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * h * h * (3 + n_hidden),
            bytes_accessed=5 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, agg, w1x, w1a, b1.reshape(1, h), ws_in, bs_in,
      w_out, b_out.reshape(1, h), ln_scale.reshape(1, h),
      ln_bias.reshape(1, h), ct)
    (dx, dagg, dw1x, dw1a, db1, dws, dbs, dwo, dbo, dscale, dbias) = outs
    dws_out = dws[:n_hidden].astype(ws.dtype)
    dbs_out = dbs[:n_hidden, 0].astype(bs.dtype) if n_hidden \
        else jnp.zeros_like(bs)
    return (dx, dagg, dw1x.astype(w1x.dtype), dw1a.astype(w1a.dtype),
            db1[0].astype(b1.dtype), dws_out, dbs_out,
            dwo.astype(w_out.dtype), dbo[0].astype(b_out.dtype),
            dscale[0].astype(ln_scale.dtype), dbias[0].astype(ln_bias.dtype))


fused_node_layer.defvjp(_fnl_fwd, _fnl_bwd)


def _equiv(x, agg, w1x, w1a, b1, ws, bs, w_out, b_out, ln_scale, ln_bias):
    """jnp reference composition (tests and the non-Pallas backward)."""
    z = jnp.maximum(x @ w1x + agg @ w1a + b1, 0)
    for i in range(ws.shape[0]):
        z = jnp.maximum(z @ ws[i] + bs[i], 0)
    d = z @ w_out + b_out
    d32 = d.astype(jnp.float32)
    mu = jnp.mean(d32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(d32 - mu), axis=-1, keepdims=True)
    ln = (d32 - mu) * jax.lax.rsqrt(var + LN_EPS)
    ln = ln * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    return x + ln.astype(x.dtype)
