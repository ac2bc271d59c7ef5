"""Split-ILP geometry retune at 524k (round 4).

The AERO_GNN_{FWD,BWD}_SPLIT interleave factors were swept at 65k
(optimal 4/2, BASELINE.md); the 524k working set (grouped remat replay,
HBM-pressure scheduling) could prefer different geometry. Interleaved
single-process A/B on the K=3 unrolled save_fused config. Result
(BASELINE.md): FWD_SPLIT=8 wins -0.8% at 524k (869.8 vs 876.7 ms);
BWD_SPLIT=4 / FWD_SPLIT=2 neutral-to-worse. Defaults stay 65k-optimal.

Usage: python benchmarks/ablate_split524.py (TPU, ~15 min).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import get_mesh, measure_rtt, time_scan_fn, log

def main():
    import jax, optax
    from aero_gnn_tpu import ops
    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse

    rtt = measure_rtt(); log(f"RTT {rtt*1e3:.1f} ms")
    n_nodes = 524288
    mesh = get_mesh(n_nodes); n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512
    g = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad, align_edges=True)
    float(g.edge_mask[0])
    ITERS = 8

    def build():
        cfg = MGNConfig(
            input_node_dim=6, input_edge_dim=3, output_node_dim=4,
            processor_size=15, hidden_dim_processor=128,
            hidden_dim_node_encoder=128, hidden_dim_edge_encoder=128,
            hidden_dim_decoder=128,
            num_hidden_layers_node_processor=2, num_hidden_layers_edge_processor=2,
            num_hidden_layers_node_encoder=2, num_hidden_layers_edge_encoder=2,
            num_hidden_layers_decoder=2,
            aggregation="add", do_concat_trick=True, compute_dtype="bfloat16",
            remat=True, unroll=True, remat_group=3,
            remat_group_policy="save_fused")
        params = cfg.init(jax.random.PRNGKey(0))
        optimizer = make_optimizer(1e-3); opt_state = optimizer.init(params)
        @jax.jit
        def train_k(params, opt_state, graph):
            def body(carry, _):
                p, o = carry
                def loss_fn(q):
                    pred = cfg.apply(q, graph)
                    return masked_mse(pred, graph.y, graph.node_mask)
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss
            (_, _), losses = jax.lax.scan(body, (params, opt_state), None, length=ITERS)
            return losses[-1]
        return params, opt_state, train_k

    variants = [
        ("bwd2_fwd4", {"AERO_GNN_BWD_SPLIT": "2", "AERO_GNN_FWD_SPLIT": "4"}),
        ("bwd4_fwd4", {"AERO_GNN_BWD_SPLIT": "4", "AERO_GNN_FWD_SPLIT": "4"}),
        ("bwd2_fwd2", {"AERO_GNN_BWD_SPLIT": "2", "AERO_GNN_FWD_SPLIT": "2"}),
        ("bwd2_fwd8", {"AERO_GNN_BWD_SPLIT": "2", "AERO_GNN_FWD_SPLIT": "8"}),
    ]
    built = {}
    with ops.use_backend("pallas"):
        for name, env in variants:
            os.environ.update(env)
            t0 = time.time()
            p, o, step = build()
            try:
                float(step(p, o, g))
            except Exception as e:
                log(f"[{name}] FAILED: {str(e)[:200]}"); continue
            log(f"[{name}] compiled in {time.time()-t0:.0f}s")
            built[name] = (p, o, step, dict(env))
        times = {n: [] for n in built}
        for rep in range(3):
            for name, (p, o, step, env) in built.items():
                os.environ.update(env)
                t = time_scan_fn(step, (p, o, g), rtt, iters=ITERS, repeats=1)
                times[name].append(t)
                log(f"rep {rep} {name}: {t*1e3:.1f} ms/step")
    log("=== best ===")
    for name, ts in times.items():
        log(f"  {name}: {min(ts)*1e3:.1f} ms/step = {n_edges/min(ts)/1e6:.2f}M edges/s")

main()
