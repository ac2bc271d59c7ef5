"""A/B the banded sender-backward gather (PermGatherPlan) on the real TPU.

Interleaved in ONE process (chip-state drift makes cross-process timings
incomparable). The plan only engages above AERO_GNN_PG_MIN_EDGES, so the
default subject is the 262k-node mesh where the plain [E, h] permutation
gather measured 11.2 ms/layer vs its 1.9 ms linear expectation.

Usage: BENCH_NODES=262144 python benchmarks/ablate_permgather.py
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
    n_nodes = int(os.environ.get("BENCH_NODES", 262144))
    iters = int(os.environ.get("BENCH_ITERS", 8))
    mesh = get_mesh(n_nodes)
    n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512

    os.environ["AERO_GNN_PG"] = "0"
    variants = [("plain", padded.build_graph_batch(
        **mesh, num_nodes_pad=np_pad, align_edges=True))]
    os.environ["AERO_GNN_PG"] = "1"
    sweep = os.environ.get("AERO_GNN_PG_SWEEP", "65536:131072")
    for cw in sweep.split(","):
        c, w = cw.split(":")
        os.environ["AERO_GNN_PG_CHUNK"] = c
        os.environ["AERO_GNN_PG_WIN"] = w
        g = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
        assert g.sender_plan is not None, cw
        pl = g.sender_plan.bwd
        if pl is not None:
            log(f"bwd plan {cw}: K={pl.idx.shape[0]} C={pl.idx.shape[1]} "
                f"W={pl.window} outliers={int(pl.out_mask.sum())}"
                f"/{pl.out_src.shape[0]}")
        fp = g.sender_plan.fwd
        if fp is not None:
            log(f"fwd plan: K={fp.lo.shape[0]} W={fp.window} "
                f"patch_slots={fp.out_src.shape[1]}/chunk")
        variants.append((f"plan{cw}", g))

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
                                          length=iters)
            return losses[-1]

        results = {name: [] for name, _ in variants}
        for rep in range(3):
            for name, g in variants:
                t = time_scan_fn(train_k, (params, opt_state, g), rtt,
                                 iters=iters, repeats=1)
                results[name].append(t)
                log(f"rep{rep} {name}: {t*1e3:.2f} ms/step")
        for name, ts in results.items():
            best = min(ts)
            print(f"{name}: best {best*1e3:.2f} ms/step "
                  f"-> {n_edges/best/1e6:.2f}M edges/s", flush=True)


if __name__ == "__main__":
    main()
