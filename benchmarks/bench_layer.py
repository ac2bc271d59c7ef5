"""One-off TPU ablation: per-layer cost decomposition of the fused MGN
processor layer (fwd+bwd through 15 chained layers, one jit), isolating:

  * full         — fused edge kernel + sender gather + fused node kernel
  * nosg         — sender projection+gather replaced by reusing e (measures
                   the XLA random-row gather pair: fwd gather + bwd
                   perm-gather+segment-sum)
  * nonode       — node update replaced by x + agg (measures the fused
                   node-block kernel)
  * gather_only  — just s_proj+gather_senders fwd+bwd (nothing else)

Usage: python benchmarks/bench_layer.py (TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, time_scan_fn, log  # noqa: E402

L = 15
H = 128


def main():
    import jax
    import jax.numpy as jnp

    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu import ops
    from aero_gnn_tpu.ops.pallas_fused import fused_edge_layer
    from aero_gnn_tpu.ops.pallas_node import fused_node_layer

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms")
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    np_pad = -(-(n_nodes + 1) // 512) * 512
    g = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                 align_edges=True)
    N, E = g.num_nodes_pad, g.num_edges_pad
    log(f"padded N={N} E={E}")
    ITERS = int(os.environ.get("BENCH_ITERS", 16))
    dt = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    x0 = jax.random.normal(ks[0], (N, H), dt)
    e0 = jax.random.normal(ks[1], (E, H), dt)
    W = {
        "w_e": jax.random.normal(ks[2], (H, H), dt) * 0.05,
        "w_s": jax.random.normal(ks[3], (H, H), dt) * 0.05,
        "w_d": jax.random.normal(ks[4], (H, H), dt) * 0.05,
        "b": jnp.zeros((H,), dt),
        "ws": jax.random.normal(ks[5], (2, H, H), dt) * 0.05,
        "bs": jnp.zeros((2, H), dt),
        "w_out": jax.random.normal(ks[6], (H, H), dt) * 0.05,
        "b_out": jnp.zeros((H,), dt),
        "scale": jnp.ones((H,), dt), "bias": jnp.zeros((H,), dt),
        # node block
        "nw1x": jax.random.normal(ks[7], (H, H), dt) * 0.05,
        "nw1a": jax.random.normal(ks[8], (H, H), dt) * 0.05,
        "nb1": jnp.zeros((H,), dt),
        "nws": jax.random.normal(ks[9], (2, H, H), dt) * 0.05,
        "nbs": jnp.zeros((2, H), dt),
        "nwo": jax.random.normal(ks[10], (H, H), dt) * 0.05,
        "nbo": jnp.zeros((H,), dt),
        "nscale": jnp.ones((H,), dt), "nbias": jnp.zeros((H,), dt),
    }

    def edge_part(p, x, e, sg):
        return fused_edge_layer(
            e, sg, x @ p["w_d"] + p["b"], g.edge_mask, g.receivers,
            p["w_e"], p["ws"], p["bs"], p["w_out"], p["b_out"],
            p["scale"], p["bias"], N, "relu")

    def node_part(p, x, agg):
        return fused_node_layer(
            x, agg.astype(x.dtype), p["nw1x"], p["nw1a"], p["nb1"],
            p["nws"], p["nbs"], p["nwo"], p["nbo"], p["nscale"], p["nbias"])

    def sg_of(p, x):
        return ops.gather_senders(x @ p["w_s"], g.senders, g.sender_perm,
                                  g.senders_sorted, aligned=True)

    def layer_full(p, x, e):
        e2, agg = edge_part(p, x, e, sg_of(p, x))
        return node_part(p, x, agg), e2

    def layer_nosg(p, x, e):
        e2, agg = edge_part(p, x, e, e)
        return node_part(p, x, agg), e2

    def layer_nonode(p, x, e):
        e2, agg = edge_part(p, x, e, sg_of(p, x))
        return x + agg.astype(x.dtype), e2

    def layer_gather_only(p, x, e):
        sg = sg_of(p, x)
        # cheap consumption keeping shapes: fold sg into both states
        return x + (x @ p["nw1x"]).astype(x.dtype), e + sg

    variants = {"full": layer_full, "nosg": layer_nosg,
                "nonode": layer_nonode, "gather_only": layer_gather_only}

    with ops.use_backend("pallas"):
        for name, layer in variants.items():
            def make():
                layer_f = layer

                @jax.jit
                def run(p, x, e):
                    def loss_fn(q):
                        def body(carry, _):
                            xx, ee = carry
                            return layer_f(q, xx, ee), None
                        (xx, ee), _ = jax.lax.scan(body, (x, e), None,
                                                   length=L)
                        return (jnp.sum(xx.astype(jnp.float32))
                                + jnp.sum(ee.astype(jnp.float32))) * 1e-6

                    val, grads = jax.value_and_grad(loss_fn)(p)
                    gsum = sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                               for l in jax.tree_util.tree_leaves(grads))
                    return val + gsum
                return run

            fn = make()
            t = time_scan_fn(fn, (W, x0, e0), rtt, iters=L)
            log(f"{name:14s} {t*1e3:7.3f} ms/layer (fwd+bwd)")


if __name__ == "__main__":
    main()
