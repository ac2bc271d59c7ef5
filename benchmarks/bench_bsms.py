"""BSMS train-step benchmark (TPU): fine-only vs fully-aligned hierarchy.

Times the bi-stride multi-scale U-Net (15 processor layers over 3 scales)
on the bench mesh, comparing the coarse-levels-on-XLA layout
(realign_level0 only — the pre-align_hierarchy behavior) against the fully
block-aligned hierarchy where the fused Pallas kernels run on every scale.

Usage: python benchmarks/bench_bsms.py (TPU). BENCH_NODES overrides size.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, time_scan_fn, log  # noqa: E402

H_DIM = 128


def build_levels(mesh, graph, amap, *, aligned: bool, num_scales=3):
    import numpy as np
    from aero_gnn_tpu.graph import hierarchy as H
    from aero_gnn_tpu.graph.padded import bucket_size

    n = mesh["x"].shape[0]
    real = H.build_hierarchy_real(
        senders=mesh["senders"], receivers=mesh["receivers"],
        node_graph=np.zeros(n, np.int64), num_nodes=n,
        pos=mesh["pos"].astype(np.float64), num_scales=num_scales,
        mode="bistride")
    plan = [(bucket_size(lv["num_nodes"] + 1), bucket_size(lv["num_edges"]))
            for lv in real]
    levels = H.collate_hierarchies(
        [real], num_fine_nodes_pad=graph.num_nodes_pad,
        num_fine_edges_pad=graph.num_edges_pad, pad_plan=plan)
    if aligned:
        levels = H.align_hierarchy(levels, amap)
    else:
        levels[0] = H.realign_level0(levels[0], amap)
    for s, lv in enumerate(levels):
        log(f"  level {s}: Nc={lv.num_coarse_nodes_pad} "
            f"Ec={lv.num_coarse_edges_pad} (real {int(lv.n_edge)}) "
            f"aligned={lv.edges_aligned}")
    return tuple(levels)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.bsms import BSMSConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse
    from aero_gnn_tpu import ops

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms")
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512
    graph, amap = padded.build_graph_batch(
        **mesh, num_nodes_pad=np_pad, align_edges=True,
        return_align_map=True)
    log(f"mesh {n_nodes} nodes / {n_edges} edges "
        f"(aligned {graph.num_nodes_pad}/{graph.num_edges_pad})")
    ITERS = int(os.environ.get("BENCH_ITERS", 16))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    import dataclasses as dc

    base_cfg = BSMSConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=15, hidden_dim_processor=H_DIM,
        hidden_dim_node_encoder=H_DIM, hidden_dim_edge_encoder=H_DIM,
        hidden_dim_decoder=H_DIM,
        num_hidden_layers_node_processor=2,
        num_hidden_layers_edge_processor=2,
        num_hidden_layers_node_encoder=2,
        num_hidden_layers_edge_encoder=2,
        num_hidden_layers_decoder=2,
        aggregation="add", do_concat_trick=True, compute_dtype=dtype,
        num_scales=3, layers_per_scale=2, hierarchy_mode="bistride",
        # remat off when the mesh fits HBM (same rationale as bench.py)
        remat=(n_nodes > 262144
               if os.environ.get("BENCH_REMAT", "auto") == "auto"
               else os.environ.get("BENCH_REMAT") == "1"))
    # unrolled per-scale processors (no lax.scan residual stacking; same
    # rationale/measurements as bench.py: auto = inverse of remat)
    unroll_env = os.environ.get("BENCH_UNROLL", "auto")
    base_cfg = dc.replace(
        base_cfg,
        unroll=(not base_cfg.remat) if unroll_env == "auto"
        else unroll_env == "1")
    params = base_cfg.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)

    def make_step(cfg, levels):
        @jax.jit
        def train_k(params, opt_state, graph):
            def body(carry, _):
                p, o = carry

                def loss_fn(q):
                    pred = cfg.apply(q, graph, hierarchy=levels)
                    return masked_mse(pred, graph.y, graph.node_mask)

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=ITERS)
            return losses[-1]

        return train_k

    with ops.use_backend("pallas"):
        for name, aligned, transfer in (
                ("fine-only alignment (coarse on XLA)", False, "mean"),
                ("fully aligned hierarchy", True, "mean"),
                ("fully aligned + WeightedEdgeConv transfer", True,
                 "weighted")):
            log(f"--- {name} ---")
            levels = build_levels(mesh, graph, amap, aligned=aligned)
            cfg = dc.replace(base_cfg, transfer=transfer)
            step = make_step(cfg, levels)
            t = time_scan_fn(step, (params, opt_state, graph), rtt,
                             iters=ITERS)
            log(f"{name}: {t*1e3:.2f} ms/step "
                f"-> {n_edges/t:,.0f} fine-edges/s")


if __name__ == "__main__":
    main()
