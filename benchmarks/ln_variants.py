"""One-off TPU experiment: LayerNorm-cost variants for the fused edge
kernel. The stripped matmul chain (onehot_variants.py "legacy") runs at
~0.185 ms/layer-fwd while the full fused forward costs ~1.0 — this
isolates how much of the gap is the f32 LayerNorm, and whether moving its
lane-dimension reductions (jnp.mean(axis=-1), a slow cross-lane shuffle
chain on the VPU) onto the MXU via skinny ones-matmuls wins.

Usage: python benchmarks/ln_variants.py (TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, time_scan_fn, log  # noqa: E402

L = 15
H = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.nn.mlp import LN_EPS
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
    W = jax.random.normal(ks[3], (4, H, H), dt) * 0.05
    lnp = jnp.stack([jnp.ones((H,), dt), jnp.zeros((H,), dt)]).reshape(2, 1, H)

    receivers = graph.receivers
    mask = graph.edge_mask
    tile_block, tile_first = derive_tiles(receivers)
    recv2d = receivers.reshape(-1, 1)
    mask2d = mask.reshape(-1, 1)

    def make_kernel(variant):
        def kernel(tb_ref, tf_ref, idx_ref, m_ref, e_ref, sg_ref, dp_ref,
                   w_ref, lnp_ref, eo_ref, agg_ref):
            t = pl.program_id(0)

            @pl.when(tf_ref[t] == 1)
            def _():
                agg_ref[:] = jnp.zeros_like(agg_ref)

            e = e_ref[:]
            cols = jax.lax.broadcasted_iota(jnp.int32, (ET, NB), 1)
            loc = idx_ref[:] - tb_ref[t] * NB
            eq = jnp.where(loc == cols, 1.0, 0.0)
            onehot = (eq * m_ref[:].astype(jnp.float32)).astype(e.dtype)

            dg = jax.lax.dot_general(
                onehot, dp_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(e.dtype)
            z = jnp.maximum(jax.lax.dot_general(
                e, w_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(e.dtype)
                + sg_ref[:] + dg, 0)
            for i in (1, 2):
                z = jnp.maximum(jax.lax.dot_general(
                    z, w_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(e.dtype), 0)
            d = jax.lax.dot_general(
                z, w_ref[3], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # keep f32

            if variant == "noln":
                out = d.astype(e.dtype)
            elif variant == "ln_lane":
                mu = jnp.mean(d, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(d - mu), axis=-1, keepdims=True)
                ln = (d - mu) * jax.lax.rsqrt(var + LN_EPS)
                ln = ln * lnp_ref[0].astype(jnp.float32) \
                    + lnp_ref[1].astype(jnp.float32)
                out = ln.astype(e.dtype)
            elif variant == "ln_mxu":
                ones = jnp.full((H, 1), 1.0 / H, jnp.float32)
                mu = jax.lax.dot_general(
                    d, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [ET,1]
                ex2 = jax.lax.dot_general(
                    d * d, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                var = ex2 - mu * mu
                ln = (d - mu) * jax.lax.rsqrt(var + LN_EPS)
                ln = ln * lnp_ref[0].astype(jnp.float32) \
                    + lnp_ref[1].astype(jnp.float32)
                out = ln.astype(e.dtype)
            elif variant == "ln_mxu_bf16norm":
                # stats in f32 via MXU, the normalize arithmetic in bf16
                ones = jnp.full((H, 1), 1.0 / H, jnp.float32)
                mu = jax.lax.dot_general(
                    d, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ex2 = jax.lax.dot_general(
                    d * d, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                var = ex2 - mu * mu
                inv = jax.lax.rsqrt(var + LN_EPS)
                ln = (d.astype(e.dtype) - mu.astype(e.dtype)) \
                    * inv.astype(e.dtype)
                out = ln * lnp_ref[0] + lnp_ref[1]
            else:
                raise ValueError(variant)

            enew = e + out
            eo_ref[:] = enew
            agg_ref[:] += jax.lax.dot_general(
                onehot, enew, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(agg_ref.dtype)

        return kernel

    def build(variant):
        def tile_spec():
            return pl.BlockSpec((ET, H), lambda t, tb, tf: (t, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(E // ET,),
            in_specs=[
                pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ET, 1), lambda t, tb, tf: (t, 0),
                             memory_space=pltpu.VMEM),
                tile_spec(), tile_spec(),
                pl.BlockSpec((NB, H), lambda t, tb, tf: (tb[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, H, H), lambda t, tb, tf: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, H), lambda t, tb, tf: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                tile_spec(),
                pl.BlockSpec((NB, H), lambda t, tb, tf: (tb[t], 0),
                             memory_space=pltpu.VMEM),
            ),
        )

        def call(e, sg, dp):
            return pl.pallas_call(
                make_kernel(variant),
                grid_spec=grid_spec,
                out_shape=(jax.ShapeDtypeStruct((E, H), dt),
                           jax.ShapeDtypeStruct((N, H), dt)),
            )(tile_block, tile_first, recv2d, mask2d, e, sg, dp, W, lnp)

        @jax.jit
        def chain(e, sg, dp):
            def body(carry, _):
                ee, acc = carry
                enew, agg = call(ee, sg, dp)
                return (enew, acc + agg[0, 0].astype(jnp.float32)), None
            (ee, acc), _ = jax.lax.scan(
                body, (e, jnp.float32(0.0)), None, length=L)
            return acc + jnp.sum(ee[:1, :1].astype(jnp.float32))

        return chain

    ref = {}
    for variant in ["noln", "ln_lane", "ln_mxu", "ln_mxu_bf16norm"]:
        try:
            fn = build(variant)
            t = time_scan_fn(fn, (e0, sg0, dproj0), rtt, iters=L)
            val = float(fn(e0, sg0, dproj0))
            tag = "ln_mxu_parity" if variant.startswith("ln_mxu") else variant
            base = ref.setdefault("ln_lane" if variant != "noln" else variant,
                                  val)
            ok = "OK" if abs(val - base) <= 1e-2 * max(1.0, abs(base)) \
                else f"vs ln_lane: {val} / {base}"
            log(f"{variant:18s} {t*1e3:7.3f} ms/layer-fwd   [{ok}]")
        except Exception as ex:  # noqa: BLE001
            log(f"{variant:18s} FAILED: {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
