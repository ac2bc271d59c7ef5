"""Micro-benchmark: [E, h] row-permutation gather vs table size (TPU).

Motivation: the sorted-transpose sender backward permutes the edge
cotangent (ct.at[sender_perm]) before its sorted segment sum. Profiles
show XLA's row gather runs at ~540M rows/s while the source table is
<= ~67 MB but collapses ~6x once the table is ~271 MB (the 262k-node
bench) — the per-layer backward scatter goes 1.9 -> 11.2 ms and eats the
large-mesh step. This sweep measures gather rate vs table size and A/Bs
candidate fixes in ONE process (chip-state drift makes cross-process
timings incomparable):

  * split-k: gather the same rows in k column slices (table per pass
    shrinks k-fold; same total bytes)
  * windowed: scan over output chunks, dynamic-slice a source window,
    gather locally (exploits the banded structure of a mesh sperm)

Usage: python benchmarks/micro_permgather.py [--rows 1056768] [--h 128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_rtt, log  # noqa: E402


def timeit(fn, args, rtt, iters):
    float(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms")
    h = args.h

    def make_gather(k):
        @jax.jit
        def run(table, idx):
            def body(acc, _):
                i = idx + jnp.int32(acc * 1e-30)  # data dep: no hoisting
                if k == 1:
                    out = table.at[i].get(mode="promise_in_bounds",
                                          unique_indices=True)
                else:
                    w = table.shape[1] // k
                    outs = [
                        jax.lax.slice_in_dim(table, j * w, (j + 1) * w, axis=1)
                        .at[i].get(mode="promise_in_bounds",
                                   unique_indices=True)
                        for j in range(k)
                    ]
                    out = jnp.concatenate(outs, axis=1)
                return acc + out[0, 0].astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=args.iters)
            return acc
        return run

    def make_windowed(n_chunks, win):
        @jax.jit
        def run(table, idx_local, los):
            # idx_local: [n_chunks, chunk] indices into each chunk's window
            def body(acc, ins):
                il, lo = ins
                w = jax.lax.dynamic_slice(
                    table, (lo + jnp.int32(acc * 1e-30), 0),
                    (win, table.shape[1]))
                out = w.at[il].get(mode="promise_in_bounds")
                return acc + out[0, 0].astype(jnp.float32), None

            def outer(acc, _):
                acc, _ = jax.lax.scan(body, acc, (idx_local, los))
                return acc, None

            acc, _ = jax.lax.scan(outer, jnp.float32(0.0), None,
                                  length=args.iters)
            return acc
        return run

    print(f"{'rows':>10} {'tableMB':>8} {'variant':>12} {'ms':>8} "
          f"{'Mrows/s':>9} {'GB/s':>7}")

    def report(rows, mb, name, t):
        print(f"{rows:>10} {mb:>8.0f} {name:>12} {t*1e3:>8.3f} "
              f"{rows/t/1e6:>9.0f} {2*rows*h*2/t/1e9:>7.0f}", flush=True)

    rng = np.random.default_rng(0)
    # --- size sweep, pure random permutation (worst case) ---
    for rows in (262144, 524288, 1048576, 2097152, 4194304):
        table = jnp.asarray(rng.standard_normal((rows, h)), jnp.bfloat16)
        idx = jnp.asarray(rng.permutation(rows).astype(np.int32))
        mb = rows * h * 2 / 1e6
        t = timeit(make_gather(1), (table, idx), rtt, args.iters)
        report(rows, mb, "plain", t)
        del table, idx

    # --- fix candidates at the two problem sizes ---
    for rows in (1048576, 4194304):
        mb = rows * h * 2 / 1e6
        table = jnp.asarray(rng.standard_normal((rows, h)), jnp.bfloat16)

        # banded permutation ~ a mesh sperm: local shuffle within +-band
        band = 65536
        base = np.arange(rows, dtype=np.int64)
        noise = rng.integers(-band, band, rows)
        perm_banded = np.argsort(base + noise, kind="stable").astype(np.int32)
        idxb = jnp.asarray(perm_banded)
        t = timeit(make_gather(1), (table, idxb), rtt, args.iters)
        report(rows, mb, "plain-band", t)

        idx = jnp.asarray(rng.permutation(rows).astype(np.int32))
        for k in (2, 4, 8):
            t = timeit(make_gather(k), (table, idx), rtt, args.iters)
            report(rows, mb, f"split{k}", t)

        # windowed over the banded perm
        chunk = 131072
        win = chunk + 2 * band
        n_chunks = rows // chunk
        il = np.empty((n_chunks, chunk), np.int32)
        los = np.empty((n_chunks,), np.int32)
        ok = True
        for c in range(n_chunks):
            src = perm_banded[c * chunk:(c + 1) * chunk]
            lo = max(0, min(int(src.min()), rows - win))
            if int(src.max()) >= lo + win:
                ok = False
                break
            los[c] = lo
            il[c] = src - lo
        if ok:
            t = timeit(make_windowed(n_chunks, win),
                       (table, jnp.asarray(il), jnp.asarray(los)),
                       rtt, args.iters)
            report(rows, mb, f"window{win//1024}k", t)
        else:
            log("windowed skipped: band overflow")
        del table

    # --- the REAL 262k-mesh sperm, if cached ---
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    try:
        from bench import get_mesh
        from aero_gnn_tpu.graph import padded
        mesh = get_mesh(262144)
        np_pad = -(-(262144 + 1) // 512) * 512
        g = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
        sperm = np.asarray(g.sender_perm)
        rows = sperm.shape[0]
        mb = rows * h * 2 / 1e6
        table = jnp.asarray(rng.standard_normal((rows, h)), jnp.bfloat16)
        idx = jnp.asarray(sperm.astype(np.int32))
        t = timeit(make_gather(1), (table, idx), rtt, args.iters)
        report(rows, mb, "real-sperm", t)
        for k in (2, 4):
            t = timeit(make_gather(k), (table, idx), rtt, args.iters)
            report(rows, mb, f"real-split{k}", t)
        spread = np.percentile(np.abs(sperm.astype(np.int64)
                                      - np.arange(rows)), [50, 90, 99, 100])
        log(f"real sperm |src-dst| percentiles 50/90/99/100: {spread}")
    except Exception as e:  # cache miss etc.
        log(f"real-sperm section skipped: {e}")


if __name__ == "__main__":
    main()
