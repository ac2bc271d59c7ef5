"""One-off TPU experiment: one-hot construction variants for the fused
edge kernel. Times a stripped kernel (one-hot gather + agg + 4-matmul
chain, forward only) under different one-hot builds to pick the fastest.

Usage: python benchmarks/onehot_variants.py (TPU).
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
    ITERS = int(os.environ.get("BENCH_ITERS", 16))
    dt = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    e0 = jax.random.normal(ks[0], (E, H), dt)
    sg0 = jax.random.normal(ks[1], (E, H), dt)
    dproj0 = jax.random.normal(ks[2], (N, H), dt)
    W = jax.random.normal(ks[3], (4, H, H), dt) * 0.05

    receivers = graph.receivers
    mask = graph.edge_mask
    tile_block, tile_first = derive_tiles(receivers)
    base = jnp.repeat(tile_block.astype(jnp.int32) * NB, ET)
    local_masked = jnp.where(mask > 0, receivers - base, -1).reshape(-1, 1)
    recv2d = receivers.reshape(-1, 1)
    mask2d = mask.reshape(-1, 1)

    def make_kernel(variant):
        def kernel(tb_ref, tf_ref, idx_ref, m_ref, e_ref, sg_ref, dp_ref,
                   w_ref, eo_ref, agg_ref):
            t = pl.program_id(0)

            @pl.when(tf_ref[t] == 1)
            def _():
                agg_ref[:] = jnp.zeros_like(agg_ref)

            e = e_ref[:]
            cols = jax.lax.broadcasted_iota(jnp.int32, (ET, NB), 1)
            if variant == "legacy":
                loc = idx_ref[:] - tb_ref[t] * NB
                eq = jnp.where(loc == cols, 1.0, 0.0)
                onehot = (eq * m_ref[:].astype(jnp.float32)).astype(e.dtype)
            elif variant == "fold":
                eq = jnp.where(idx_ref[:] == cols, 1.0, 0.0)
                onehot = eq.astype(e.dtype)
            elif variant == "fold_mul":
                # masked local, but keep a f32 multiply before the cast
                eq = jnp.where(idx_ref[:] == cols, 1.0, 0.0)
                onehot = (eq * m_ref[:].astype(jnp.float32)).astype(e.dtype)
            elif variant == "fold_bf16":
                # select straight into bf16 constants
                one = jnp.asarray(1.0, e.dtype)
                zero = jnp.asarray(0.0, e.dtype)
                onehot = jnp.where(idx_ref[:] == cols, one, zero)
            elif variant == "legacy_localized":
                # legacy ops but the base-subtract removed (pre-localized)
                eq = jnp.where(idx_ref[:] == cols, 1.0, 0.0)
                onehot = (eq * m_ref[:].astype(jnp.float32)).astype(e.dtype)
            else:
                raise ValueError(variant)

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
            enew = e + jax.lax.dot_general(
                z, w_ref[3], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(e.dtype)
            eo_ref[:] = enew
            agg_ref[:] += jax.lax.dot_general(
                onehot, enew, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(agg_ref.dtype)

        return kernel

    def build(variant):
        idx = recv2d if variant == "legacy" else local_masked

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
            )(tile_block, tile_first, idx, mask2d, e, sg, dp, W)

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

    ref = None
    for variant in ["legacy", "fold", "fold_mul", "fold_bf16",
                    "legacy_localized"]:
        try:
            fn = build(variant)
            t = time_scan_fn(fn, (e0, sg0, dproj0), rtt, iters=L)
            val = float(fn(e0, sg0, dproj0))
            if ref is None:
                ref = val
            ok = "OK" if abs(val - ref) <= 1e-2 * max(1.0, abs(ref)) \
                else f"MISMATCH ({val} vs {ref})"
            log(f"{variant:18s} {t*1e3:7.3f} ms/layer-fwd   [{ok}]")
        except Exception as ex:  # noqa: BLE001
            log(f"{variant:18s} FAILED: {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
