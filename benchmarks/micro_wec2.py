"""Directive r4-8 probe: can batching WEC down+up conv PAIRS into one
kernel invocation (shared one-hot, two weight vectors) save anything?

Context first: the flagship's WEC premium is +8.1% (~5 ms at 65k), bound-
accounted to 8 conv applications each riding measured-floor gather +
aggregation ops. The hypothesized saving of a PAIRED kernel is the shared
receiver DMA + the shared one-hot COMPARE (the select+cast and the matmul
must double). Structurally, the model cannot feed such a kernel: the two
L0 conv applications (down at the U-Net's entry, up at its exit) are
separated by the bottleneck stack in the forward, and their adjoints are
equally separated in the backward — the pair members NEVER co-execute,
and holding the first stream live across the bottleneck would cost an
extra [N, h] HBM residency for the whole mid-network.

This micro-benchmark measures the ceiling of the idea anyway: one dual
kernel (ops.pallas_segment.segment_agg_weighted2_pallas) vs two
sequential single-stream invocations on identical 65k-mesh streams.
If even the co-resident ideal saves ~nothing, the restructuring question
is closed from both ends.

Usage: python benchmarks/micro_wec2.py   (TPU, ~3 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import get_mesh, measure_rtt, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.ops.pallas_segment import (
        segment_agg_weighted2_pallas, segment_agg_weighted_pallas)

    rtt = measure_rtt()
    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    np_pad = -(-(n_nodes + 1) // 512) * 512
    g = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                 align_edges=True)
    E, N = g.num_edges_pad, g.num_nodes_pad
    h = 128
    rng = np.random.default_rng(0)
    em = np.asarray(g.edge_mask)
    m1 = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    m2 = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.standard_normal(E) * em).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal(E) * em).astype(np.float32))
    recv = g.receivers
    K = 30

    @jax.jit
    def run_two(m1, m2):
        c = jnp.float32(0.0)
        for _ in range(K):
            a = segment_agg_weighted_pallas(m1 + c * 1e-30, w1, recv, N)
            b = segment_agg_weighted_pallas(m2 + c * 1e-30, w2, recv, N)
            c = c + (a[0, 0] + b[0, 0]).astype(jnp.float32)
        return c

    @jax.jit
    def run_dual(m1, m2):
        c = jnp.float32(0.0)
        for _ in range(K):
            a, b = segment_agg_weighted2_pallas(
                m1 + c * 1e-30, w1, m2 + c * 1e-30, w2, recv, N)
            c = c + (a[0, 0] + b[0, 0]).astype(jnp.float32)
        return c

    # correctness on-chip first
    a1 = segment_agg_weighted_pallas(m1, w1, recv, N)
    a2, b2 = segment_agg_weighted2_pallas(m1, w1, m2, w2, recv, N)
    err = float(jnp.max(jnp.abs(a1.astype(jnp.float32)
                                - a2.astype(jnp.float32))))
    log(f"dual-vs-single max abs diff: {err:.2e}")

    def t(f):
        float(f(m1, m2))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(m1, m2))
            best = min(best, time.perf_counter() - t0 - rtt)
        return best / K

    res = {}
    for rep in range(3):
        for name, f in (("two_single", run_two), ("dual", run_dual)):
            dt = t(f)
            res.setdefault(name, []).append(dt)
            log(f"rep {rep} {name}: {dt*1e3:.3f} ms per pair")
    out = {k: min(v) for k, v in res.items()}
    log(f"best: two_single {out['two_single']*1e3:.3f} ms, "
        f"dual {out['dual']*1e3:.3f} ms "
        f"({(1 - out['dual']/out['two_single'])*100:.1f}% saved)")
    print(json.dumps({"metric": "wec_pair_batching_ms",
                      "two_single": round(out["two_single"] * 1e3, 4),
                      "dual": round(out["dual"] * 1e3, 4),
                      "saved_pct": round(
                          (1 - out["dual"] / out["two_single"]) * 100, 1)}))


if __name__ == "__main__":
    main()
