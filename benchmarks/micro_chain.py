"""Microbenchmark: can restructuring shorten the MXU dependent-chain stall?

VERDICT r3 weak #6 / next #5: the fused kernels run at 1.27x (fwd) / 1.40x
(bwd) of their serialized VPU+MXU floor; the residual is attributed to MXU
pipeline latency on the ~7/14-deep dependent matmul chains. The one named,
untried lever: restructure the edge-MLP hidden stack as two parallel
half-width chains (equal FLOPs) so the in-order core always has an
issue-ready matmul while the other chain's result is in flight.

This isolates the question in a minimal Pallas kernel — a 3-matmul MLP
chain per [ET, h] tile, bf16 inputs / f32 accum / bf16 casts like the real
kernels — in four shapes:

  seq      z = relu(((x W1) W2) W3)          — the real kernels' shape
  par2     two independent h->h/2->h/2->h chains, summed — equal FLOPs,
           but the h/2 contractions use half the 128-wide MXU
  split2   the row-split interleave (two 512-row groups through the full
           chain) — what AERO_GNN_*_SPLIT already does
  wide2    two full-width chains summed — 2x FLOPs; if latency-bound the
           time ratio vs seq tells how much pipeline slack exists

Usage: python benchmarks/micro_chain.py (TPU, ~3-5 min). Interleaved
in-process A/B, chained-scan timing per bench.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_rtt, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ET, H = 1024, 128
    T = int(os.environ.get("CHAIN_TILES", 256))
    ITERS = int(os.environ.get("CHAIN_ITERS", 32))

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def k_seq(x_ref, w1, w2, w3, o_ref):
        z = jnp.maximum(mm(x_ref[...], w1[...]), 0)
        z = jnp.maximum(mm(z, w2[...]), 0)
        o_ref[...] = mm(z, w3[...])

    def k_par2(x_ref, w1, w2, w3, o_ref):
        h2 = H // 2
        za = jnp.maximum(mm(x_ref[...], w1[:, :h2]), 0)
        zb = jnp.maximum(mm(x_ref[...], w1[:, h2:]), 0)
        za = jnp.maximum(mm(za, w2[:h2, :h2]), 0)
        zb = jnp.maximum(mm(zb, w2[h2:, h2:]), 0)
        o_ref[...] = (mm(za, w3[:h2, :])
                      + mm(zb, w3[h2:, :])).astype(o_ref.dtype)

    def k_split2(x_ref, w1, w2, w3, o_ref):
        r = ET // 2
        xa, xb = x_ref[:r], x_ref[r:]
        za = jnp.maximum(mm(xa, w1[...]), 0)
        zb = jnp.maximum(mm(xb, w1[...]), 0)
        za = jnp.maximum(mm(za, w2[...]), 0)
        zb = jnp.maximum(mm(zb, w2[...]), 0)
        o_ref[:r] = mm(za, w3[...])
        o_ref[r:] = mm(zb, w3[...])

    def k_wide2(x_ref, w1, w2, w3, o_ref):
        za = jnp.maximum(mm(x_ref[...], w1[...]), 0)
        zb = jnp.maximum(mm(x_ref[...], w2[...]), 0)
        za = jnp.maximum(mm(za, w2[...]), 0)
        zb = jnp.maximum(mm(zb, w1[...]), 0)
        o_ref[...] = (mm(za, w3[...])
                      + mm(zb, w3[...])).astype(o_ref.dtype)

    kernels = {"seq": k_seq, "par2": k_par2, "split2": k_split2,
               "wide2": k_wide2}

    def make_fn(kernel):
        wspec = pl.BlockSpec((H, H), lambda t: (0, 0),
                             memory_space=pltpu.VMEM)

        @jax.jit
        def run(x, w1, w2, w3):
            f = pl.pallas_call(
                kernel,
                grid=(T,),
                in_specs=[pl.BlockSpec((ET, H), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM),
                          wspec, wspec, wspec],
                out_specs=pl.BlockSpec((ET, H), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((T * ET, H), jnp.bfloat16),
            )

            def body(acc, _):
                y = f(x + acc * jnp.bfloat16(1e-30), w1, w2, w3)
                return acc + y[0, 0].astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=ITERS)
            return acc

        return run

    rtt = measure_rtt()
    log(f"RTT {rtt*1e3:.1f} ms; {T} tiles x [{ET},{H}] x {ITERS} iters")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T * ET, H)), jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((H, H)) * 0.05, jnp.bfloat16)
          for _ in range(3)]

    import time
    fns = {}
    for name, kern in kernels.items():
        fns[name] = make_fn(kern)
        t0 = time.perf_counter()
        float(fns[name](x, *ws))  # compile+warm
        log(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s")

    reps = int(os.environ.get("CHAIN_REPS", 5))
    times = {n: [] for n in fns}
    for rep in range(reps):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            float(fn(x, *ws))
            t = (time.perf_counter() - t0 - rtt) / ITERS
            times[name].append(t)

    log("=== per-pass times (best of reps; GFLOP equal except wide2=2x) ===")
    flops_seq = T * ET * H * H * 3 * 2
    out = {}
    for name, ts in times.items():
        best = min(ts)
        fl = flops_seq * (2 if name == "wide2" else 1)
        out[name] = best
        log(f"  {name}: {best*1e3:.3f} ms -> {fl/best/1e12:.1f} TFLOP/s"
            f"  (all: " + ", ".join(f"{t*1e3:.3f}" for t in ts) + ")")
    import json
    print(json.dumps({k: round(v * 1e6, 1) for k, v in out.items()}))


if __name__ == "__main__":
    main()
