"""1M-node single-chip fit exploration via AOT compile + memory analysis.

VERDICT r3 missing #2: the 1,048,576-node flagship config ran at round 2
(3,684 ms/step) but compile-OOMs at round-3 HEAD (17.39G vs 15.75G with the
banded sender plans engaged, 16.37G with them off — ~0.6G of
buffer-assignment drift on top of ~1.0G of plan buffers).

This harness iterates WITHOUT the (frequently wedged) TPU tunnel: it
AOT-compiles the exact train-step program against an abstract v5e topology
(the production compiler + buffer assignment, no device code) and reads
``compiled.memory_analysis()`` per variant — temp + argument bytes vs the
15.75 GB HBM budget. Variants sweep the levers VERDICT names: banded plans
on/off (the new AERO_GNN_PG_MAX_EDGES ceiling), remat-group K, donation,
and XLA's memory-fitting effort knobs (jax_memory_fitting_level/effort).

Usage: python benchmarks/fit_1m.py [nodes] (default 1048576).
FIT_VARIANTS selects configs as +-joined tokens: K<g> (remat_group),
unroll (Python-unrolled groups), sf (save_fused inner policy), off
(remat_offload), L<level>/E<effort> (XLA memory-fitting knobs) — e.g.
FIT_VARIANTS="K3+unroll+sf,K5+off". FIT_FULL_ERR=1 dumps whole compile
errors. Writes stderr table; exits 0 if any variant fits.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# compile-only libtpu use: don't fight other processes (probes, benches)
# for the single-process lockfile
os.environ.setdefault("ALLOW_MULTIPLE_LIBTPU_LOAD", "true")

HBM_BYTES = 15.75 * 2**30


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576

    import jax

    # run host-side on CPU: the axon TPU tunnel wedges and is not needed —
    # the compile targets the abstract topology below
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(
        os.environ.get("FIT_TOPO", "v5e:2x4"), platform="tpu")
    dev = np.array(topo.devices).ravel()[0]
    log(f"abstract target: {dev.device_kind}")
    # single-chip program: a 1-device mesh over the abstract topology; the
    # sharding on every arg is what routes lowering to the TPU compiler
    mesh1 = Mesh(np.array(topo.devices).ravel()[:1], ("d",))
    repl = NamedSharding(mesh1, P())

    import optax

    from aero_gnn_tpu import ops
    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import get_mesh

    mesh = get_mesh(n_nodes)
    n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512

    def build_graph():
        t0 = time.time()
        g = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
        log(f"graph built in {time.time()-t0:.0f}s: pad "
            f"{g.num_nodes_pad}/{g.num_edges_pad}, "
            f"sender_plan={'yes' if g.sender_plan is not None else 'no'}")
        return g

    def make_cfg(remat_group, remat_offload=False, unroll=False,
                 gpolicy="full"):
        return MGNConfig(
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

    def sds(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype,
                                           sharding=repl),
            tree)

    iters = int(os.environ.get("FIT_ITERS", 16))

    def try_variant(name, graph, *, remat_group=5, donate=False,
                    mem_level=None, mem_effort=None, remat_offload=False,
                    unroll=False, gpolicy="full"):
        cfg = make_cfg(remat_group, remat_offload, unroll, gpolicy)
        params = cfg.init(jax.random.PRNGKey(0))
        optimizer = make_optimizer(1e-3)
        opt_state = optimizer.init(params)

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

        step = jax.jit(train_k, donate_argnums=(0, 1) if donate else ())
        overrides = {}
        if mem_level is not None:
            overrides["jax_memory_fitting_level"] = mem_level
        if mem_effort is not None:
            overrides["jax_memory_fitting_effort"] = mem_effort
        t0 = time.time()
        try:
            old = {k: getattr(jax.config, k) for k in overrides}
            for k, v in overrides.items():
                jax.config.update(k, v)
            try:
                with ops.use_backend("pallas"):
                    lowered = step.lower(
                        sds(params), sds(opt_state), sds(graph))
                compiled = lowered.compile()
            finally:
                for k, v in old.items():
                    jax.config.update(k, v)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            limit = 40000 if os.environ.get("FIT_FULL_ERR") else 400
            log(f"[{name}] FAILED in {time.time()-t0:.0f}s: "
                f"{msg[:limit]}")
            return {"name": name, "fits": False, "error": msg[:2000]}
        ma = compiled.memory_analysis()
        temp = ma.temp_size_in_bytes
        arg = ma.argument_size_in_bytes
        out_b = ma.output_size_in_bytes
        alias = ma.alias_size_in_bytes
        peak = temp + arg + out_b - alias
        fits = peak <= HBM_BYTES
        log(f"[{name}] compiled in {time.time()-t0:.0f}s: "
            f"temp {temp/2**30:.2f}G arg {arg/2**30:.2f}G "
            f"out {out_b/2**30:.2f}G alias {alias/2**30:.2f}G "
            f"-> peak {peak/2**30:.2f}G vs {HBM_BYTES/2**30:.2f}G "
            f"{'FITS' if fits else 'OVER'}")
        return {"name": name, "fits": fits, "temp": temp, "arg": arg,
                "out": out_b, "alias": alias, "peak": peak}

    # plans auto: with the new AERO_GNN_PG_MAX_EDGES ceiling the 1M graph
    # gets NO plans (4.2M edge rows > 3M ceiling) — verify that, then sweep
    graph = build_graph()
    if graph.sender_plan is not None:
        log("WARNING: sender plans engaged at 1M despite ceiling!")

    results = []
    spec = os.environ.get("FIT_VARIANTS", "")
    if spec:
        for v in spec.split(","):
            kw = {}
            name = v
            for part in v.split("+"):
                if part.startswith("K"):
                    kw["remat_group"] = int(part[1:])
                elif part == "donate":
                    kw["donate"] = True
                elif part == "off":
                    kw["remat_offload"] = True
                elif part == "unroll":
                    kw["unroll"] = True
                elif part == "sf":
                    kw["gpolicy"] = "save_fused"
                elif part.startswith("sf"):
                    kw["gpolicy"] = "save_fused:" + part[2:]
                elif part.startswith("L"):
                    kw["mem_level"] = part[1:]
                elif part.startswith("E"):
                    kw["mem_effort"] = float(part[1:])
            results.append(try_variant(name, graph, **kw))
    else:
        results.append(try_variant("K5", graph, remat_group=5))
        results.append(try_variant("K5+donate", graph, remat_group=5,
                                   donate=True))
        results.append(try_variant("K5+donate+O3", graph, remat_group=5,
                                   donate=True, mem_level="O3"))
        results.append(try_variant("K5+donate+O3+e1", graph, remat_group=5,
                                   donate=True, mem_level="O3",
                                   mem_effort=1.0))
        results.append(try_variant("K3+donate+O3", graph, remat_group=3,
                                   donate=True, mem_level="O3"))

    log("=== summary ===")
    for r in results:
        log(f"  {r['name']}: "
            + (f"peak {r['peak']/2**30:.2f}G "
               f"{'FITS' if r['fits'] else 'over'}"
               if "peak" in r else "compile failed"))
    ok = any(r["fits"] for r in results)
    print({"nodes": n_nodes, "edges": n_edges,
           "any_fits": ok,
           "best": min((r for r in results if "peak" in r),
                       key=lambda r: r["peak"], default=None)})
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
