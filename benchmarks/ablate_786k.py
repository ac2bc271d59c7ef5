"""TPU ablation for the 786k slow-gather regime (VERDICT r4 item 1).

Round 4 mapped the 786k knee: the banded sender-gather plans that carry
262k-524k did not FIT beside grouped remat (17.72G AOT peak — the
lax.scan chunk loops' AllocateBuffer arenas), so the [E,h] permutation
gather ran in XLA's slow regime: 2364 ms/step = 1.24M edges/s. Round 5
unrolled the chunk loops (ops/scatter._pg_chunks_unrolled): plans now
fit (14.02G AOT) and the first TPU run measured 1578.6 ms = 1.86M
edges/s. This sweep tunes the plan geometry toward the >=2.0M target,
interleaved in ONE process (CLAUDE.md drift method).

Variants (all K=3 + unrolled groups + save_fused inner — the 524k-proven
remat config; plans forced where named):

  * pg_both      chunk 64k, windows 96k/96k (the first-run config)
  * pg_bwd       backward plan only (is the fwd plan paying off here?)
  * pg_w128      both plans, windows 131072 (fewer outliers)
  * pg_w64       both plans, windows 65536 (smaller slices)

Usage: python benchmarks/ablate_786k.py   (TPU, ~30-40 min)
ABLATE_CONFIGS subsets, ABLATE_REPS (default 3).
"""

import json
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
    n_nodes = int(os.environ.get("BENCH_NODES", 786432))
    mesh = get_mesh(n_nodes)
    n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512
    ITERS = int(os.environ.get("BENCH_ITERS", 8))

    # name -> env overrides at graph-build time
    geo = {
        "pg_both": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1"},
        "pg_bwd": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "0"},
        "pg_w128": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1",
                    "AERO_GNN_PG_WIN": "131072",
                    "AERO_GNN_PGF_WIN": "131072"},
        "pg_w64": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1",
                   "AERO_GNN_PG_WIN": "65536",
                   "AERO_GNN_PGF_WIN": "65536"},
        "pg_w48": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1",
                   "AERO_GNN_PG_WIN": "49152",
                   "AERO_GNN_PGF_WIN": "49152"},
        "pg_w32": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1",
                   "AERO_GNN_PG_WIN": "32768",
                   "AERO_GNN_PGF_WIN": "32768"},
        "pg_c32w64": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1",
                      "AERO_GNN_PG_CHUNK": "32768",
                      "AERO_GNN_PG_WIN": "65536",
                      "AERO_GNN_PGF_WIN": "65536"},
        # scan-based chunk loops (the pre-r5 form; fits where plan temps
        # allow — 524k yes, 786k no). "_trace" env applies at program
        # TRACE time, not graph build.
        "pg_both_scan": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1",
                         "_trace": {"AERO_GNN_PG_UNROLL": "0"}},
        "pg_w64_scan": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1",
                        "AERO_GNN_PG_WIN": "65536",
                        "AERO_GNN_PGF_WIN": "65536",
                        "_trace": {"AERO_GNN_PG_UNROLL": "0"}},
        # K retune at the round-5 defaults (VERDICT r4 item 5c): grouped
        # remat K=5 vs the K=3 anchor, both at the w64 auto geometry
        "auto_k3": {},
        "auto_k5": {"_cfg": {"remat_group": 5}},
        "auto_k5_full": {"_cfg": {"remat_group": 5,
                                  "remat_group_policy": "full"}},
        # 262k window-threshold validation (remat-off production config)
        "w96_nr": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1",
                   "AERO_GNN_PG_WIN": "98304", "AERO_GNN_PGF_WIN": "98304",
                   "_cfg": {"remat": False, "remat_group": 0}},
        "w64_nr": {"AERO_GNN_PG": "1", "AERO_GNN_PGF": "1",
                   "AERO_GNN_PG_WIN": "65536", "AERO_GNN_PGF_WIN": "65536",
                   "_cfg": {"remat": False, "remat_group": 0}},
    }
    sel = os.environ.get("ABLATE_CONFIGS")
    names = [s.strip() for s in sel.split(",")] if sel else list(geo)

    def build_graph(env):
        env = {k: v for k, v in env.items()
               if k not in ("_trace", "_cfg")}
        keys = ["AERO_GNN_PG", "AERO_GNN_PGF", "AERO_GNN_PG_WIN",
                "AERO_GNN_PGF_WIN", "AERO_GNN_PG_CHUNK",
                "AERO_GNN_PGF_CHUNK"]
        old = {k: os.environ.get(k) for k in keys}
        os.environ.update(env)
        try:
            g = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                         align_edges=True)
        finally:
            for k in keys:
                if old[k] is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old[k]
        float(g.edge_mask[0])  # H2D
        sp = g.sender_plan
        log(f"graph({env}): bwd={'y' if sp and sp.bwd is not None else 'n'}"
            f" fwd={'y' if sp and sp.fwd is not None else 'n'}")
        return g

    def make_cfg(**over):
        kw = dict(
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
            compute_dtype="bfloat16", remat=True, unroll=True,
            remat_group=3, remat_group_policy="save_fused")
        kw.update(over)
        return MGNConfig(**kw)

    cfg = make_cfg()
    optimizer = make_optimizer(1e-3)

    def make_step(cfg=cfg):
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

        return train_k

    params = cfg.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)

    built = {}
    with ops.use_backend("pallas"):
        for name in names:
            g = build_graph(geo[name])
            over = geo[name].get("_cfg", {})
            step = make_step(make_cfg(**over)) if over else make_step()
            t0 = time.time()
            trace_env = geo[name].get("_trace", {})
            old_t = {k: os.environ.get(k) for k in trace_env}
            os.environ.update(trace_env)
            try:
                float(step(params, opt_state, g))
            except Exception as e:  # noqa: BLE001
                log(f"[{name}] FAILED compile/run: {str(e)[:300]}")
                continue
            finally:
                for k, v in old_t.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            log(f"[{name}] compiled+warm in {time.time()-t0:.0f}s")
            built[name] = (step, g)

        reps = int(os.environ.get("ABLATE_REPS", 3))
        times = {n: [] for n in built}
        for rep in range(reps):
            for name, (step, g) in built.items():
                t = time_scan_fn(step, (params, opt_state, g), rtt,
                                 iters=ITERS, repeats=1)
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
    print(json.dumps({"nodes": n_nodes, "edges": n_edges,
                      "ms_per_step": {k: round(v * 1e3, 1)
                                      for k, v in out.items()}}))


if __name__ == "__main__":
    main()
