"""TPU ablation for the 524k-node regime (VERDICT r3 weak #2 / next #4).

524,288 nodes / 2.1M edges is the weakest measured point that still fits
one chip: 1,168 ms/step = 1.67M edges/s vs 3.42M at 262k — the grouped
remat (K=5) double-forward plus HBM-pressure scheduling was taken as given
with no ablation recorded. This sweeps, interleaved in ONE process
(chip-state drift makes cross-process timings incomparable — CLAUDE.md):

  * remat_group K in {3, 5} (both divide 15; boundary-stack memory is
    (G+K) pairs either way but transient scheduling differs)
  * banded sender-gather plans on/off (they won at 524k round-3 but cost
    ~1.0 GB of headroom the scheduler could be spending)
  * host-offloaded group boundaries (MGNConfig.remat_offload — frees
    ~(G-1) device-resident [E,h]+[N,h] pairs for scheduling slack at the
    price of PCIe traffic)

Usage: BENCH_NODES=524288 python benchmarks/ablate_524k.py
(TPU; ~25-40 min: 6 configs x (compile + 3 interleaved reps)).
Set ABLATE_CONFIGS to a comma list to subset, e.g. "K5,K5+off".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, time_scan_fn, log  # noqa: E402


def main():
    import jax
    import optax

    from aero_gnn_tpu import ops
    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms")
    n_nodes = int(os.environ.get("BENCH_NODES", 524288))
    mesh = get_mesh(n_nodes)
    n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512
    ITERS = int(os.environ.get("BENCH_ITERS", 8))

    graphs = {}

    def graph_for(pg: bool):
        if pg not in graphs:
            os.environ["AERO_GNN_PG"] = "1" if pg else "0"
            os.environ["AERO_GNN_PGF"] = "1" if pg else "0"
            g = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                        align_edges=True)
            float(g.edge_mask[0])  # H2D
            log(f"graph(pg={pg}): plans="
                f"{'yes' if g.sender_plan is not None else 'no'}")
            graphs[pg] = g
        return graphs[pg]

    def build(remat_group, remat_offload, unroll=False, gpolicy="full"):
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
            compute_dtype="bfloat16", remat=True, unroll=unroll,
            remat_group=remat_group, remat_offload=remat_offload,
            remat_group_policy=gpolicy)
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

    # name -> (remat_group, offload, pg, unroll)
    all_cfgs = {
        "K5": (5, False, True, False),
        "K5+nopg": (5, False, False, False),
        "K3": (3, False, True, False),
        "K3+nopg": (3, False, False, False),
        "K5+off": (5, True, True, False),
        "K5+off+nopg": (5, True, False, False),
        "K5+unroll": (5, False, True, True),
        "K5+unroll+nopg": (5, False, False, True),
        "K3+unroll": (3, False, True, True),
        "K3+unroll+sf": (3, False, True, True, "save_fused"),
        "K5+unroll+sf": (5, False, True, True, "save_fused"),
        "K3+unroll+sf+nopg": (3, False, False, True, "save_fused"),
        "K3+sf": (3, False, True, False, "save_fused"),
        "K3+sf+nopg": (3, False, False, False, "save_fused"),
    }
    sel = os.environ.get("ABLATE_CONFIGS")
    names = [s.strip() for s in sel.split(",")] if sel \
        else list(all_cfgs)

    built = {}
    with ops.use_backend("pallas"):
        for name in names:
            k, off, pg, unroll, *rest = all_cfgs[name]
            g = graph_for(pg)
            t0 = time.time()
            p, o, step = build(k, off, unroll,
                               rest[0] if rest else "full")
            # compile + warm now so the timed reps interleave cleanly
            try:
                float(step(p, o, g))
            except Exception as e:  # noqa: BLE001
                log(f"[{name}] FAILED compile/run: {str(e)[:300]}")
                continue
            log(f"[{name}] compiled+warm in {time.time()-t0:.0f}s")
            built[name] = (p, o, step, g)

        reps = int(os.environ.get("ABLATE_REPS", 3))
        times = {n: [] for n in built}
        for rep in range(reps):
            for name, (p, o, step, g) in built.items():
                t = time_scan_fn(step, (p, o, g), rtt, iters=ITERS,
                                 repeats=1)
                times[name].append(t)
                log(f"rep {rep} {name}: {t*1e3:.1f} ms/step")

    log("=== results (best of reps) ===")
    out = {}
    for name, ts in times.items():
        best = min(ts)
        out[name] = best
        log(f"  {name}: {best*1e3:.1f} ms/step = "
            f"{n_edges/best/1e6:.2f}M edges/s  (all: "
            + ", ".join(f"{t*1e3:.0f}" for t in ts) + ")")
    import json
    print(json.dumps({"nodes": n_nodes, "edges": n_edges,
                      "ms_per_step": {k: round(v * 1e3, 1)
                                      for k, v in out.items()}}))


if __name__ == "__main__":
    main()
