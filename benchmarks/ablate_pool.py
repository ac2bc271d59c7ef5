"""One-off TPU A/B: BSMS hierarchy transfers via sorted pooling
(AERO_GNN_SORTED_POOL=1, gather-by-perm + sorted segment sum + sorted
unpool transpose) vs the direct XLA unsorted scatter path (=0), in ONE
process on the fully aligned hierarchy.

Usage: python benchmarks/ablate_pool.py (TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, time_scan_fn, log  # noqa: E402
from benchmarks.bench_bsms import build_levels, H_DIM  # noqa: E402


def main():
    import jax
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
    ITERS = int(os.environ.get("BENCH_ITERS", 16))

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
        num_scales=3, layers_per_scale=2, hierarchy_mode="bistride")
    params = cfg.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    levels = build_levels(mesh, graph, amap, aligned=True)

    def make_step():
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

    results = {}
    with ops.use_backend("pallas"):
        for mode in ["0", "1", "1", "0"]:
            os.environ["AERO_GNN_SORTED_POOL"] = mode
            step = make_step()
            t = time_scan_fn(step, (params, opt_state, graph), rtt,
                             iters=ITERS)
            loss = float(step(params, opt_state, graph))
            results.setdefault(mode, []).append(t)
            log(f"SORTED_POOL={mode}: {t*1e3:.2f} ms/step "
                f"({n_edges/t:,.0f} fine-edges/s)  loss={loss:.6f}")
    for mode, ts in sorted(results.items()):
        best = min(ts)
        log(f"best SORTED_POOL={mode}: {best*1e3:.2f} ms/step "
            f"({n_edges/best:,.0f} fine-edges/s)")


if __name__ == "__main__":
    main()
