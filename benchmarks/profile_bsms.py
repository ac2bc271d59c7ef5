"""Capture a device trace of the BSMS train step (TPU), mean or weighted.

Companion to benchmarks/profile_step.py for the multi-scale model — used
to attribute the WeightedEdgeConv transfer cost (benchmarks/ablate_wec.py
measured mean 61.7 vs weighted 78.3 ms/step at 65k; this shows WHERE).

Usage: python benchmarks/profile_bsms.py [--logdir DIR] [--iters K]
       [--transfer mean|weighted]
Analyze with benchmarks/profile_report.py --logdir DIR.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, log  # noqa: E402
from benchmarks.bench_bsms import build_levels, H_DIM  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default="/tmp/aero_profile_bsms")
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--transfer", default="weighted")
    args = parser.parse_args()

    import jax
    import optax

    from aero_gnn_tpu import ops
    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.bsms import BSMSConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse

    measure_rtt()
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    np_pad = -(-(n_nodes + 1) // 512) * 512
    graph, amap = padded.build_graph_batch(
        **mesh, num_nodes_pad=np_pad, align_edges=True,
        return_align_map=True)
    float(graph.edge_mask[0])

    cfg = BSMSConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=15, hidden_dim_processor=H_DIM,
        hidden_dim_node_encoder=H_DIM, hidden_dim_edge_encoder=H_DIM,
        hidden_dim_decoder=H_DIM,
        num_hidden_layers_node_processor=2,
        num_hidden_layers_edge_processor=2,
        num_hidden_layers_node_encoder=2,
        num_hidden_layers_edge_encoder=2,
        num_hidden_layers_decoder=2,
        aggregation="add", do_concat_trick=True, compute_dtype="bfloat16",
        num_scales=3, layers_per_scale=2, hierarchy_mode="bistride",
        transfer=args.transfer, remat=False, unroll=True)

    with ops.use_backend("pallas"):
        levels = build_levels(mesh, graph, amap, aligned=True)
        params = cfg.init(jax.random.PRNGKey(0))
        optimizer = make_optimizer(1e-3)
        opt_state = optimizer.init(params)

        @jax.jit
        def train_step(params, opt_state, graph):
            def loss_fn(q):
                pred = cfg.apply(q, graph, hierarchy=levels)
                return masked_mse(pred, graph.y, graph.node_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params, opt_state, loss = train_step(params, opt_state, graph)
        log(f"warmup loss {float(loss):.6f}")

        jax.profiler.start_trace(args.logdir)
        for _ in range(args.iters):
            params, opt_state, loss = train_step(params, opt_state, graph)
        log(f"traced loss {float(loss):.6f}")  # host fetch = real sync
        jax.profiler.stop_trace()
    log(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()
