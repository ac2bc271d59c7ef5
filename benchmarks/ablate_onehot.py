"""One-off TPU A/B: one-hot construction + backward-recompute variants of
the fused edge kernels, in ONE process (chip-state drift makes
cross-process timings incomparable — see CLAUDE.md).

Variants (AERO_GNN_ONEHOT x AERO_GNN_SAVE_ACTS):
  mask/0     round-1 kernels: in-kernel [ET, NB] mask multiply + mask
             stream, backward recomputes the forward chain per tile
  premask/0  pad mask folded into the receiver stream outside the kernel
             (one-hot = select + cast only, no mask DMA)
  premask/1  + forward streams post-ReLU activations / pre-LN output / LN
             stats to HBM so the backward starts at the LayerNorm VJP

Usage: python benchmarks/ablate_onehot.py (TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, time_scan_fn, log  # noqa: E402


def main():
    import jax
    import optax

    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse
    from aero_gnn_tpu import ops

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms")
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512
    graph = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
    float(graph.edge_mask[0])
    ITERS = int(os.environ.get("BENCH_ITERS", 16))

    def build():
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
            compute_dtype="bfloat16")
        params = cfg.init(jax.random.PRNGKey(0))
        optimizer = make_optimizer(1e-3)
        opt_state = optimizer.init(params)

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

            (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=ITERS)
            return losses[-1]

        return params, opt_state, train_k

    # AERO_GNN_ONEHOT_SWEEP="premask:0,precomp:0" overrides the variant
    # list (mode:save_acts pairs)
    sweep = os.environ.get("AERO_GNN_ONEHOT_SWEEP")
    if sweep:
        variants = []
        for v in sweep.split(","):
            parts = v.split(":", 1)
            if len(parts) != 2:
                raise SystemExit(
                    f"AERO_GNN_ONEHOT_SWEEP entry {v!r} must be "
                    f"'mode:save_acts' (e.g. 'premask:0')")
            variants.append(tuple(parts))
    else:
        variants = [("mask", "0"), ("premask", "0"), ("premask", "1")]
    order = variants + variants[::-1]  # interleave to cancel drift
    results = {}
    with ops.use_backend("pallas"):
        for onehot, save in order:
            os.environ["AERO_GNN_ONEHOT"] = onehot
            os.environ["AERO_GNN_SAVE_ACTS"] = save
            p, o, step = build()
            t = time_scan_fn(step, (p, o, graph), rtt, iters=ITERS)
            loss = float(step(p, o, graph))
            results.setdefault((onehot, save), []).append(t)
            log(f"ONEHOT={onehot} SAVE_ACTS={save}: {t*1e3:.2f} ms/step "
                f"({n_edges/t:,.0f} edges/s)  loss={loss:.6f}")
    for key, ts in sorted(results.items()):
        best = min(ts)
        log(f"best ONEHOT={key[0]} SAVE_ACTS={key[1]}: {best*1e3:.2f} "
            f"ms/step ({n_edges/best:,.0f} edges/s)")


if __name__ == "__main__":
    main()
