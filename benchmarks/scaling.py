"""Scaling-efficiency benchmark: edges/s at 1 -> P shards.

Measures the spatial (halo-exchange) and data-parallel train steps over a
device mesh and reports parallel efficiency vs the single-device step
(north star: >= 80% edges/s scaling efficiency).

On this environment only one real TPU chip is attached, so multi-device
runs use virtual CPU devices (functional scaling validation; absolute
numbers are CPU-bound). On a real pod slice the same harness runs
unchanged over ICI/DCN.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py [--nodes 4096] [--layers 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=4096)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--hidden", type=int, default=64)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:  # noqa: BLE001 — backend already up
        pass

    from aero_gnn_tpu.data import dataset as D
    from aero_gnn_tpu.data.synthetic import make_random_mesh_sample
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.parallel import halo as HL
    from aero_gnn_tpu.parallel.mesh import make_mesh
    from aero_gnn_tpu.training.loop import make_optimizer

    n_dev = jax.device_count()
    sample = make_random_mesh_sample(n_nodes=args.nodes, seed=0)
    D.compute_features([sample], ["mach", "alpha"])
    n_edges = sample.num_edges

    cfg = MGNConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=args.layers, hidden_dim_processor=args.hidden,
        hidden_dim_node_encoder=args.hidden,
        hidden_dim_edge_encoder=args.hidden,
        hidden_dim_decoder=args.hidden, do_concat_trick=True,
        aggregation="add")
    params0 = cfg.init(jax.random.PRNGKey(0))

    def time_steps(step, params, opt_state, sg):
        params, opt_state, loss = step(params, opt_state, sg)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, opt_state, loss = step(params, opt_state, sg)
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / args.iters

    results = {}
    for p in [1, 2, 4, n_dev]:
        if p > n_dev:
            continue
        mesh = make_mesh(data=1, graph=p,
                         devices=jax.devices()[:p]) if p > 1 else None
        optimizer = make_optimizer(1e-3)
        params = jax.tree.map(lambda a: a.copy(), params0)
        opt_state = optimizer.init(params)
        if p == 1:
            from aero_gnn_tpu.graph import padded
            from aero_gnn_tpu.training.loop import make_step_fns
            gb = padded.build_graph_batch(
                senders=sample.senders, receivers=sample.receivers,
                x=sample.x, edge_attr=sample.edge_attr, pos=sample.pos,
                y=sample.y)
            fns = make_step_fns(cfg, optimizer, donate=False)
            dt = time_steps(
                lambda pa, o, g: fns.train_step(pa, o, g, None, None),
                params, opt_state, gb)
        else:
            sg = HL.partition_graph_halo(
                senders=sample.senders, receivers=sample.receivers,
                x=sample.x, edge_attr=sample.edge_attr, pos=sample.pos,
                y=sample.y, num_parts=p)
            step = HL.make_halo_train_step(cfg, optimizer, mesh)
            dt = time_steps(step, params, opt_state, sg)
        results[p] = {"ms_per_step": dt * 1e3, "edges_per_s": n_edges / dt}

    base = results[1]["edges_per_s"]
    report = []
    for p, r in results.items():
        eff = r["edges_per_s"] / (base * p) if p > 1 else 1.0
        report.append({"shards": p, "ms_per_step": round(r["ms_per_step"], 2),
                       "edges_per_s": round(r["edges_per_s"]),
                       "efficiency": round(eff, 3)})
        print(f"P={p}: {r['ms_per_step']:.2f} ms/step, "
              f"{r['edges_per_s']:,.0f} edges/s, efficiency {eff:.1%}",
              file=sys.stderr)
    print(json.dumps({"metric": "spatial_scaling", "device": "cpu-virtual",
                      "nodes": args.nodes, "edges": n_edges,
                      "results": report}))


if __name__ == "__main__":
    main()
