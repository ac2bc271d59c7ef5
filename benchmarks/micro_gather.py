"""Micro-ablation: cost of [E, h] sender-gather formulations on TPU.

The sender gather (x_proj[senders], receiver-edge order = random access) is
the one remaining XLA op on the flagship's per-layer critical path; this
times the candidate formulations to pick the fastest. Usage:
python benchmarks/micro_gather.py (TPU).
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

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms")
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    np_pad = -(-(n_nodes + 1) // 512) * 512
    graph = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
    N, E = graph.num_nodes_pad, graph.num_edges_pad
    log(f"padded N={N} E={E}")
    ITERS = int(os.environ.get("BENCH_ITERS", 16))
    dt = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (N, H), dt)
    e0 = jax.random.normal(key, (E, H), dt)
    Ws = jax.random.normal(key, (L, H, H), dt) * 0.05

    senders = graph.senders
    senders_sorted = graph.senders_sorted
    sender_perm = graph.sender_perm
    # inverse permutation: receiver-order row i lives at sorted row inv[i]
    import numpy as np
    perm_np = np.asarray(sender_perm)
    inv_np = np.empty_like(perm_np)
    inv_np[perm_np] = np.arange(len(perm_np))
    inv_perm = jnp.asarray(inv_np)

    def timed(name, layer_fn):
        def outer(x, e):
            def body(carry, w):
                x, e = carry
                sg = layer_fn(x @ w)
                return (x, e * jnp.asarray(0.5, dt) + sg), None

            (x, e), _ = jax.lax.scan(body, (x, e), Ws)
            return jnp.sum(e.astype(jnp.float32)) * 1e-20

        def chain(x, e):
            def body(acc, _):
                out = outer(x + acc.astype(dt), e)
                return acc + out, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=ITERS)
            return acc

        f = jax.jit(chain)
        t = time_scan_fn(f, (x0, e0), rtt, iters=ITERS)
        log(f"{name:44s} {t*1e3:7.2f} ms /15-layer pass")
        return t

    # A: plain random gather (current formulation)
    timed("A plain x[senders] (random)",
          lambda xp: xp.at[senders].get(mode="promise_in_bounds"))

    # B: sorted gather + inverse permutation back to receiver order
    def sorted_then_unpermute(xp):
        sg_sorted = xp.at[senders_sorted].get(
            mode="promise_in_bounds", indices_are_sorted=True)
        return sg_sorted.at[inv_perm].get(mode="promise_in_bounds")
    timed("B x[senders_sorted] + inv-perm", sorted_then_unpermute)

    # C: Pallas one-hot gather on the sender-sorted stream + inv-perm
    from aero_gnn_tpu.ops import pallas_segment as PS
    if E % PS.ET == 0 and N % PS.NB == 0:
        def pallas_then_unpermute(xp):
            sg_sorted = PS.gather_receivers_pallas(xp, senders_sorted)
            return sg_sorted.at[inv_perm].get(mode="promise_in_bounds")
        timed("C pallas onehot(sender-sorted) + inv-perm",
              pallas_then_unpermute)

    # D: matmul only (overhead floor)
    timed("D x @ W only (no gather)",
          lambda xp: jnp.zeros((E, H), dt) + xp[0])

    # E: take_along_axis formulation
    timed("E jnp.take(x, senders)",
          lambda xp: jnp.take(xp, senders, axis=0))


if __name__ == "__main__":
    main()
