"""One-off TPU ablation: where does the flagship train step's time go?

Times isolated 15-layer sub-computations (gathers+projections, fused edge
kernel, node MLP) fwd and fwd+bwd, using the bench harness's chained-scan
timing. Usage: python benchmarks/ablate_components.py (TPU).
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

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms")
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512
    graph = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
    N, E = graph.num_nodes_pad, graph.num_edges_pad
    log(f"padded N={N} E={E} (real edges {n_edges})")
    ITERS = int(os.environ.get("BENCH_ITERS", 16))
    dt = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    x0 = jax.random.normal(ks[0], (N, H), dt)
    e0 = jax.random.normal(ks[1], (E, H), dt)
    # stacked per-layer weights
    Ws = jax.random.normal(ks[2], (L, H, H), dt) * 0.05
    Wd = jax.random.normal(ks[3], (L, H, H), dt) * 0.05
    We = jax.random.normal(ks[4], (L, H, H), dt) * 0.05
    Wh = jax.random.normal(ks[5], (L, 2, H, H), dt) * 0.05
    bh = jnp.zeros((L, 2, H), dt)
    Wo = jax.random.normal(ks[6], (L, H, H), dt) * 0.05
    bo = jnp.zeros((L, H), dt)
    Wn1 = jax.random.normal(ks[7], (L, 2 * H, H), dt) * 0.05
    Wn2 = jax.random.normal(ks[8], (L, H, H), dt) * 0.05
    Wn3 = jax.random.normal(ks[9], (L, H, H), dt) * 0.05
    scale = jnp.ones((L, H), dt)
    bias = jnp.zeros((L, H), dt)
    sg0 = jax.random.normal(ks[10], (E, H), dt)
    agg0 = jax.random.normal(ks[11], (N, H), dt)

    sender_perm = graph.sender_perm
    senders_sorted = graph.senders_sorted
    senders, receivers = graph.senders, graph.receivers
    emask = graph.edge_mask

    def timed(name, make_fn, args):
        def outer(*a):
            def body(carry, ws):
                return make_fn(carry, ws, *a[1:]), None

            carry, _ = jax.lax.scan(body, a[0], ws_stack)
            leaves = jax.tree_util.tree_leaves(carry)
            return sum(jnp.sum(l.astype(jnp.float32)) * 1e-20 for l in leaves)

        # fwd
        f = jax.jit(lambda *a: _chain(outer, a, ITERS))
        t_f = time_scan_fn(f, args, rtt, iters=ITERS)
        # fwd+bwd (grad wrt first arg)
        g = jax.jit(lambda *a: _chain(
            lambda *b: jax.grad(outer)(*b), a, ITERS, is_grad=True))
        t_g = time_scan_fn(g, args, rtt, iters=ITERS)
        log(f"{name:34s} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_g*1e3:7.2f} ms")

    def _chain(fn, args, iters, is_grad=False):
        def body(carry, _):
            out = fn(carry, *args[1:])
            if is_grad:
                leaves = jax.tree_util.tree_leaves(out)
                bump = sum(jnp.sum(l.astype(jnp.float32)) * 1e-20
                           for l in leaves)
                new = jax.tree_util.tree_map(
                    lambda l: l + jnp.asarray(bump, l.dtype), carry)
                return new, None
            return jax.tree_util.tree_map(
                lambda l: l + jnp.asarray(out, l.dtype), carry), None

        carry, _ = jax.lax.scan(body, args[0], None, length=iters)
        leaves = jax.tree_util.tree_leaves(carry)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-20

    global ws_stack

    with ops.use_backend("pallas"):
        # A: projections + gathers only
        ws_stack = (Ws, Wd)
        def gath(carry, ws):
            x, e = carry
            w_s, w_d = ws
            # the real model's per-layer XLA ops: two projections + the
            # sender gather (the receiver gather lives inside the kernel,
            # so d_proj only feeds a [N, h] elementwise consumer here)
            sg = ops.gather_senders(x @ w_s, senders, sender_perm,
                                    senders_sorted, aligned=True)
            d_proj = x @ w_d
            return (x + d_proj * jnp.asarray(1e-6, dt), e + sg)
        timed("proj+sender-gather x15", gath, ((x0, e0),))

        # B: fused edge layer only (fixed sg/dg)
        ws_stack = (We, Wh, bh, Wo, bo, scale, bias)
        def fused(carry, ws):
            x, e = carry
            w_e, wh, bhh, w_o, b_o, sc, bi = ws
            e2, agg = fused_edge_layer(
                e, sg0, sg0, emask, receivers, w_e, wh, bhh, w_o, b_o,
                sc, bi, N, "relu")
            return (x + agg.astype(dt) * jnp.asarray(1e-6, dt), e2)
        timed("fused edge kernel x15", fused, ((x0, e0),))

        # C: node MLP only
        ws_stack = (Wn1, Wn2, Wn3, scale, bias)
        def node(carry, ws):
            x, e = carry
            w1, w2, w3, sc, bi = ws
            z = jnp.concatenate([x, agg0], axis=-1)
            z = jnp.maximum(z @ w1, 0)
            z = jnp.maximum(z @ w2, 0)
            z = z @ w3
            z32 = z.astype(jnp.float32)
            mu = jnp.mean(z32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(z32 - mu), axis=-1, keepdims=True)
            z = ((z32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dt)
            z = z * sc + bi
            return (x + z, e)
        timed("node MLP x15", node, ((x0, e0),))

        # D: everything per-layer (sanity vs full fwd)
        ws_stack = (Ws, Wd, We, Wh, bh, Wo, bo, Wn1, Wn2, Wn3, scale, bias)
        def full(carry, ws):
            x, e = carry
            w_s, w_d, w_e, wh, bhh, w_o, b_o, w1, w2, w3, sc, bi = ws
            sg = ops.gather_senders(x @ w_s, senders, sender_perm,
                                    senders_sorted, aligned=True)
            d_proj = x @ w_d  # receiver gather happens inside the kernel
            e2, agg = fused_edge_layer(
                e, sg, d_proj, emask, receivers, w_e, wh, bhh, w_o, b_o,
                sc, bi, N, "relu")
            z = jnp.concatenate([x, agg.astype(dt)], axis=-1)
            z = jnp.maximum(z @ w1, 0)
            z = jnp.maximum(z @ w2, 0)
            z = z @ w3
            z32 = z.astype(jnp.float32)
            mu = jnp.mean(z32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(z32 - mu), axis=-1, keepdims=True)
            zn = ((z32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dt)
            return (x + zn * sc + bi, e2)
        timed("full layer x15", full, ((x0, e0),))


if __name__ == "__main__":
    main()
