"""A/B the WeightedEdgeConv transfer cost on the real TPU (VERDICT r2 #4).

BASELINE round 2 measured the bistride BSMS at 72.4 ms/step with the
parity "mean" transfer but 89.5 ms (+24%) with WeightedEdgeConv. Suspects:
  * wec_down's default fine->coarse pool is an UNSORTED
    jax.ops.segment_sum — XLA lowers unsorted scatter-add to a serial TPU
    path (~70x a sorted reduction, see ops/scatter.py);
  * the f32 conv/length weights promote the whole [E, h] edge stream to
    f32 (2x the bf16 bytes) through the conv multiply and the
    length-weighted coarse edge mean.

Interleaved in ONE process (chip-state drift — CLAUDE.md). Variants:
  mean               — reference-parity transfer (baseline)
  weighted           — current default WEC path
  weighted+sorted    — AERO_GNN_SORTED_POOL=1 (sorted pool perms)
  weighted+bf16w     — AERO_GNN_WEC_DTYPE=compute (cast conv weights to
                       the compute dtype before the edge-stream multiply)
  weighted+both      — sorted pool + compute-dtype weights

Usage: python benchmarks/ablate_wec.py (TPU). BENCH_NODES/BENCH_ITERS
override.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, time_scan_fn, log  # noqa: E402
from benchmarks.bench_bsms import build_levels, H_DIM  # noqa: E402


def main():
    import dataclasses as dc

    import jax
    import optax

    from aero_gnn_tpu import ops
    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.bsms import BSMSConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms")
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512
    graph, amap = padded.build_graph_batch(
        **mesh, num_nodes_pad=np_pad, align_edges=True,
        return_align_map=True)
    log(f"mesh {n_nodes} nodes / {n_edges} edges "
        f"(aligned {graph.num_nodes_pad}/{graph.num_edges_pad})")
    ITERS = int(os.environ.get("BENCH_ITERS", 16))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    base_cfg = BSMSConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=15, hidden_dim_processor=H_DIM,
        hidden_dim_node_encoder=H_DIM, hidden_dim_edge_encoder=H_DIM,
        hidden_dim_decoder=H_DIM,
        num_hidden_layers_node_processor=2,
        num_hidden_layers_edge_processor=2,
        num_hidden_layers_node_encoder=2,
        num_hidden_layers_edge_encoder=2,
        num_hidden_layers_decoder=2,
        aggregation="add", do_concat_trick=True, compute_dtype=dtype,
        num_scales=3, layers_per_scale=2, hierarchy_mode="bistride",
        remat=False, unroll=True)
    params = base_cfg.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)

    def make_step(cfg, levels):
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

    variants = [
        ("mean", "mean", {}),
        ("weighted", "weighted", {}),
        ("weighted+sorted", "weighted", {"AERO_GNN_SORTED_POOL": "1"}),
        ("weighted+bf16w", "weighted", {"AERO_GNN_WEC_DTYPE": "compute"}),
        ("weighted+both", "weighted", {"AERO_GNN_SORTED_POOL": "1",
                                       "AERO_GNN_WEC_DTYPE": "compute"}),
    ]
    if os.environ.get("ABLATE_WEC_FUSED"):
        # round-4 fused-weight A/B: the conv weight folded into the
        # aggregation kernel's one-hot (ops.aggregate_edges_weighted) vs
        # the separate [E,h] f32 multiply
        variants = [
            ("mean", "mean", {"AERO_GNN_WEC_FUSED": "0"}),
            ("weighted-unfused", "weighted", {"AERO_GNN_WEC_FUSED": "0"}),
            ("weighted-fused", "weighted", {"AERO_GNN_WEC_FUSED": "1"}),
        ]
    envs = ("AERO_GNN_SORTED_POOL", "AERO_GNN_WEC_DTYPE",
            "AERO_GNN_WEC_FUSED")
    with ops.use_backend("pallas"):
        levels = build_levels(mesh, graph, amap, aligned=True)
        steps = []
        for name, transfer, env in variants:
            for k in envs:
                os.environ.pop(k, None)
            os.environ.update(env)
            cfg = dc.replace(base_cfg, transfer=transfer)
            step = make_step(cfg, levels)
            # jit traces LAZILY: the env-dependent paths (_wec_weight,
            # _sorted_pool_enabled) are read at TRACE time, so force the
            # trace/compile NOW while this variant's env is set
            float(step(params, opt_state, graph))
            steps.append((name, step))
        for k in envs:
            os.environ.pop(k, None)
        # interleave: warm all, then time round-robin (time_scan_fn does
        # repeats internally; chip drift between variants is the concern,
        # so keep the whole sweep in one process back-to-back)
        for name, step in steps:
            t = time_scan_fn(step, (params, opt_state, graph), rtt,
                             iters=ITERS)
            log(f"{name:18s}: {t*1e3:7.2f} ms/step "
                f"-> {n_edges/t:,.0f} fine-edges/s")


if __name__ == "__main__":
    main()
