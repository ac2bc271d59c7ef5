"""One-off TPU experiment: cost decomposition of the fused edge BACKWARD
kernel. Builds stripped variants of the backward kernel body and times
them as forward pallas_calls (same tile streams/outputs), isolating:

  * full       — the real backward body
  * nowgrads   — weight-grad accumulators dropped (dwe/dws/dbs/dwo/dbo)
  * norelu     — relu masks on dz dropped
  * noddproj   — the per-block d_proj accumulation dropped
  * noln       — LN recompute + LN backward dropped (d_d := ct)
  * norecomp   — forward-chain recompute dropped (acts := ct-shaped dummies)

Usage: python benchmarks/bwd_variants.py (TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, time_scan_fn, log  # noqa: E402

L = 15
H = 128
NHID = 2


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.nn.mlp import LN_EPS
    from aero_gnn_tpu.ops.pallas_fused import _ln_bwd, _ln_stats
    from aero_gnn_tpu.ops.pallas_segment import derive_tiles, NB, ET

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms  NB={NB} ET={ET}")
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    np_pad = -(-(n_nodes + 1) // 512) * 512
    graph = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
    N, E = graph.num_nodes_pad, graph.num_edges_pad
    log(f"padded N={N} E={E}")
    dt = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    e0 = jax.random.normal(ks[0], (E, H), dt)
    sg0 = jax.random.normal(ks[1], (E, H), dt)
    dproj0 = jax.random.normal(ks[2], (N, H), dt)
    ct_e0 = jax.random.normal(ks[3], (E, H), dt)
    ct_agg0 = jax.random.normal(ks[4], (N, H), dt)
    w_e = jax.random.normal(ks[5], (H, H), dt) * 0.05
    ws = jax.random.normal(ks[6], (NHID, H, H), dt) * 0.05
    bs = jnp.zeros((NHID, 1, H), dt)
    w_out = jax.random.normal(ks[7], (H, H), dt) * 0.05
    b_out = jnp.zeros((1, H), dt)
    lscale = jnp.ones((1, H), dt)
    lbias = jnp.zeros((1, H), dt)

    receivers = graph.receivers
    mask = graph.edge_mask
    tile_block, tile_first = derive_tiles(receivers)
    recv2d = receivers.reshape(-1, 1)
    mask2d = mask.reshape(-1, 1)

    def make_kernel(wgrads=True, relu=True, ddproj=True, ln=True,
                    recomp=True):
        def kernel(tb_ref, tf_ref, recv_ref, e_ref, sg_ref, dproj_ref,
                   mask_ref, w_e_ref, ws_ref, bs_ref, w_out_ref, b_out_ref,
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

            @pl.when(tf_ref[t] == 1)
            def _():
                ddproj_ref[:] = jnp.zeros_like(ddproj_ref)

            def mm(a, b, ta=False, tb=False):
                dims = ((((0,) if ta else (1,)), ((1,) if tb else (0,))),
                        ((), ()))
                return jax.lax.dot_general(
                    a, b, dims, preferred_element_type=jnp.float32)

            e = e_ref[:]
            dtl = e.dtype
            base = tb_ref[t] * NB
            local = recv_ref[:] - base
            cols = jax.lax.broadcasted_iota(jnp.int32, (ET, NB), 1)
            eq = jnp.where(local == cols, 1.0, 0.0)
            onehot = (eq * mask_ref[:].astype(jnp.float32)).astype(dtl)

            if recomp:
                dg = mm(onehot, dproj_ref[:]).astype(dtl)
                h0 = mm(e, w_e_ref[:]).astype(dtl) + sg_ref[:] + dg
                acts = [jnp.maximum(h0, 0)]
                for i in range(NHID):
                    acts.append(jnp.maximum(
                        mm(acts[-1], ws_ref[i]).astype(dtl) + bs_ref[i], 0))
            else:
                acts = [e + sg_ref[:]] * (NHID + 1)
            if ln and recomp:
                d = mm(acts[-1], w_out_ref[:]).astype(dtl) + b_out_ref[:]
                d32 = d.astype(jnp.float32)
                mu, var = _ln_stats(d32, H)
                inv = jax.lax.rsqrt(var + LN_EPS)
                xn = (d32 - mu) * inv

            ct_total = ct_e_ref[:] + mm(onehot, ct_agg_ref[:]).astype(dtl)
            ct32 = ct_total.astype(jnp.float32)
            if ln and recomp:
                d_d, dscale, dbias = _ln_bwd(
                    ct32, xn, inv, ln_scale_ref[:].astype(jnp.float32))
                dscale_ref[:] += dscale
                dbias_ref[:] += dbias
                d_d = d_d.astype(dtl)
            else:
                d_d = ct_total

            if wgrads:
                dwo_ref[:] += mm(acts[-1], d_d, ta=True)
                dbo_ref[:] += jnp.sum(d_d.astype(jnp.float32), axis=0,
                                      keepdims=True)
            dz = mm(d_d, w_out_ref[:], tb=True).astype(dtl)
            if relu:
                dz = dz * (acts[-1].astype(jnp.float32) > 0).astype(dtl)

            for i in reversed(range(NHID)):
                if wgrads:
                    dws_ref[i] += mm(acts[i], dz, ta=True)
                    dbs_ref[i] += jnp.sum(dz.astype(jnp.float32), axis=0,
                                          keepdims=True)
                dz = mm(dz, ws_ref[i], tb=True).astype(dtl)
                if relu:
                    dz = dz * (acts[i].astype(jnp.float32) > 0).astype(dtl)

            if wgrads:
                dwe_ref[:] += mm(e, dz, ta=True)
            de_out_ref[:] = ct_total + mm(dz, w_e_ref[:], tb=True).astype(dtl)
            dsg_out_ref[:] = dz
            if ddproj:
                ddproj_ref[:] += mm(onehot, dz, ta=True).astype(
                    ddproj_ref.dtype)

        return kernel

    def build(**flags):
        def tile_spec():
            return pl.BlockSpec((ET, H), lambda t, tb, tf: (t, 0),
                                memory_space=pltpu.VMEM)

        def block_spec():
            return pl.BlockSpec((NB, H), lambda t, tb, tf: (tb[t], 0),
                                memory_space=pltpu.VMEM)

        def const_spec(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda t, tb, tf: (0,) * nd,
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(E // ET,),
            in_specs=[
                pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                             memory_space=pltpu.VMEM),
                tile_spec(), tile_spec(), block_spec(),
                pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                             memory_space=pltpu.VMEM),
                const_spec((H, H)), const_spec((NHID, H, H)),
                const_spec((NHID, 1, H)), const_spec((H, H)),
                const_spec((1, H)), const_spec((1, H)), const_spec((1, H)),
                tile_spec(), block_spec(),
            ],
            out_specs=(
                tile_spec(), tile_spec(), block_spec(),
                const_spec((H, H)), const_spec((NHID, H, H)),
                const_spec((NHID, 1, H)), const_spec((H, H)),
                const_spec((1, H)), const_spec((1, H)), const_spec((1, H)),
            ),
        )

        def call(e, sg, dp, ct_e, ct_agg):
            return pl.pallas_call(
                make_kernel(**flags),
                grid_spec=grid_spec,
                out_shape=(
                    jax.ShapeDtypeStruct((E, H), dt),
                    jax.ShapeDtypeStruct((E, H), dt),
                    jax.ShapeDtypeStruct((N, H), dt),
                    jax.ShapeDtypeStruct((H, H), jnp.float32),
                    jax.ShapeDtypeStruct((NHID, H, H), jnp.float32),
                    jax.ShapeDtypeStruct((NHID, 1, H), jnp.float32),
                    jax.ShapeDtypeStruct((H, H), jnp.float32),
                    jax.ShapeDtypeStruct((1, H), jnp.float32),
                    jax.ShapeDtypeStruct((1, H), jnp.float32),
                    jax.ShapeDtypeStruct((1, H), jnp.float32),
                ),
            )(tile_block, tile_first, recv2d, e, sg, dp, mask2d,
              w_e, ws, bs, w_out, b_out, lscale, lbias, ct_e, ct_agg)

        @jax.jit
        def chain(e, sg, dp, ct_e, ct_agg):
            def body(carry, _):
                ee, acc = carry
                de, dsg, ddp, *rest = call(ee, sg, dp, ct_e, ct_agg)
                return (de, acc + dsg[0, 0].astype(jnp.float32)
                        + ddp[0, 0].astype(jnp.float32)
                        + rest[0][0, 0]), None
            (ee, acc), _ = jax.lax.scan(
                body, (e, jnp.float32(0.0)), None, length=L)
            return acc + jnp.sum(ee[:1, :1].astype(jnp.float32))

        return chain

    cases = [
        ("full", {}),
        ("nowgrads", {"wgrads": False}),
        ("norelu", {"relu": False}),
        ("noddproj", {"ddproj": False}),
        ("noln", {"ln": False}),
        ("norecomp", {"recomp": False, "ln": False}),
    ]
    for name, flags in cases:
        try:
            fn = build(**flags)
            t = time_scan_fn(fn, (e0, sg0, dproj0, ct_e0, ct_agg0), rtt,
                             iters=L)
            log(f"{name:12s} {t*1e3:7.3f} ms/layer-bwd")
        except Exception as ex:  # noqa: BLE001
            log(f"{name:12s} FAILED: {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
