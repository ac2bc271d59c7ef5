"""One-off TPU ablation: full-step overhead outside the 15 MP layers.

Times the flagship MGN as: forward only, value_and_grad (no optimizer),
full train step (grad + Adam), and an encoders+decoder-only model
(processor_size=0), using the bench harness's chained-scan timing.
Usage: python benchmarks/ablate_step.py (TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, time_scan_fn, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse
    from aero_gnn_tpu import ops

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms")
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    np_pad = -(-(n_nodes + 1) // 512) * 512
    graph = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
    ITERS = int(os.environ.get("BENCH_ITERS", 16))

    def build(processor_size=15):
        return MGNConfig(
            input_node_dim=6, input_edge_dim=3, output_node_dim=4,
            processor_size=processor_size, hidden_dim_processor=128,
            hidden_dim_node_encoder=128, hidden_dim_edge_encoder=128,
            hidden_dim_decoder=128,
            num_hidden_layers_node_processor=2,
            num_hidden_layers_edge_processor=2,
            num_hidden_layers_node_encoder=2,
            num_hidden_layers_edge_encoder=2,
            num_hidden_layers_decoder=2,
            aggregation="add", do_concat_trick=True,
            compute_dtype="bfloat16")

    with ops.use_backend("pallas"):
        for name, psize in [("enc+dec + 1 layer", 1),
                            ("full model (15 layers)", 15)]:
            cfg = build(psize)
            params = cfg.init(jax.random.PRNGKey(0))
            optimizer = make_optimizer(1e-3)
            opt_state = optimizer.init(params)

            @jax.jit
            def fwd_k(params, graph, cfg=cfg):
                def body(acc, _):
                    g = graph.replace(x=graph.x + acc * 1e-30)
                    pred = cfg.apply(params, g)
                    return acc + pred[0, 0], None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=ITERS)
                return acc

            @jax.jit
            def grad_k(params, graph, cfg=cfg):
                def body(carry, _):
                    p, acc = carry

                    def loss_fn(q):
                        g = graph.replace(x=graph.x + acc * 1e-30)
                        pred = cfg.apply(q, g)
                        return masked_mse(pred, graph.y, graph.node_mask)

                    loss, grads = jax.value_and_grad(loss_fn)(p)
                    # consume grads cheaply but data-dependently
                    gsum = sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                               for l in jax.tree_util.tree_leaves(grads))
                    return (p, acc + loss * 1e-30 + gsum), None
                (_, acc), _ = jax.lax.scan(body, (params, jnp.float32(0.0)),
                                           None, length=ITERS)
                return acc

            @jax.jit
            def train_k(params, opt_state, graph, cfg=cfg,
                        optimizer=optimizer):
                def body(carry, _):
                    p, o = carry

                    def loss_fn(q):
                        pred = cfg.apply(q, graph)
                        return masked_mse(pred, graph.y, graph.node_mask)

                    loss, grads = jax.value_and_grad(loss_fn)(p)
                    updates, o = optimizer.update(grads, o, p)
                    return (optax.apply_updates(p, updates), o), loss
                (_, _), losses = jax.lax.scan(body, (params, opt_state),
                                              None, length=ITERS)
                return losses[-1]

            t_f = time_scan_fn(fwd_k, (params, graph), rtt, iters=ITERS)
            t_g = time_scan_fn(grad_k, (params, graph), rtt, iters=ITERS)
            t_t = time_scan_fn(train_k, (params, opt_state, graph), rtt,
                               iters=ITERS)
            log(f"{name:28s} fwd {t_f*1e3:7.2f}  fwd+bwd {t_g*1e3:7.2f}  "
                f"train {t_t*1e3:7.2f} ms/step")


if __name__ == "__main__":
    main()
