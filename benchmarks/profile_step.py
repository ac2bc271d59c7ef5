"""Capture a device trace of the flagship MGN train step (TPU).

Writes a TensorBoard/xprof trace to --logdir (default /tmp/aero_profile);
analyze headlessly with benchmarks/profile_report.py or interactively with
``xprof --logdir ...``.

Usage: python benchmarks/profile_step.py [--logdir DIR] [--iters K]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, log  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default="/tmp/aero_profile")
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    import jax
    import optax

    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse
    from aero_gnn_tpu import ops

    measure_rtt()
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    np_pad = -(-(n_nodes + 1) // 512) * 512
    graph = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
    float(graph.edge_mask[0])

    cfg = MGNConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=15, hidden_dim_processor=128,
        hidden_dim_node_encoder=128, hidden_dim_edge_encoder=128,
        hidden_dim_decoder=128,
        num_hidden_layers_node_processor=2,
        num_hidden_layers_edge_processor=2,
        num_hidden_layers_node_encoder=2,
        num_hidden_layers_edge_encoder=2,
        num_hidden_layers_decoder=2,
        aggregation="add", do_concat_trick=True,
        compute_dtype="bfloat16",
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
        unroll=os.environ.get("BENCH_UNROLL", "1") == "1")

    with ops.use_backend("pallas"):
        params = cfg.init(jax.random.PRNGKey(0))
        optimizer = make_optimizer(1e-3)
        opt_state = optimizer.init(params)

        @jax.jit
        def train_step(params, opt_state, graph):
            def loss_fn(q):
                pred = cfg.apply(q, graph)
                return masked_mse(pred, graph.y, graph.node_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        # compile + warm up outside the trace
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
