"""Benchmark: message-passing training throughput (edges/s/chip).

Runs the flagship MeshGraphNet (15 MP layers, hidden 128, concat-trick) on a
mesh-like random graph, full train step (forward + backward + Adam), on
whatever device JAX provides (the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": "edges_per_s_per_chip", "value": ..., "unit": "edges/s",
   "vs_baseline": ...}

``vs_baseline`` compares the optimized path against a reference-style
baseline: the full-concat EdgeBlock formulation on the plain XLA op path
(what a naive port of /root/reference/models/mgnLayer.py:10-49 would compile
to), i.e. >1.0 means faster than a direct translation of the reference on
identical hardware. The baseline ms/step is a STORED same-hardware
measurement by default (367 ms/step at 65k on TPU v5e, measured identically
in rounds 1-3 — re-measure with BENCH_BASELINE=fresh): re-running it costs
~2 min of relay compile + measurement per attempt, which round 3 showed can
push the whole run past the driver's outer timeout on a wedged tunnel.

Extra context (secondary metrics, config, device) goes to stderr.

Wedged-tunnel armor (the TPU here sits behind a relay that intermittently
wedges; see CLAUDE.md):
  1. preflight: a trivial-op chip probe in a subprocess under a short
     timeout; on hang, the probe's exact PID is killed and we wait ~90 s
     for the chip to recover, then re-probe.
  2. attempts run in a child process under a per-attempt timeout sized so
     2-3 attempts + probes fit inside the driver's outer budget (healthy
     65k run ~= 6-8 min incl. relay compiles).
  3. the child's stdout is streamed live, so the JSON line reaches the
     driver the moment the train measurement exists — even if a later
     measurement (inference) hangs, the round still records a number.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# Naive-port baseline ms/step, measured on this hardware (TPU v5 lite) with
# BENCH_BASELINE=fresh: rounds 1/2/3 measured 367.19 ms at 65k nodes; the
# round-5 INTERLEAVED re-measurement (same process as the optimized config,
# the CLAUDE.md drift-control method) got 366.69 ms — drift on this program
# is ~0.1%, the stored denominator is honest. Only sizes actually measured
# are listed; other sizes report vs_baseline=null unless BENCH_BASELINE=fresh.
STORED_BASELINE_S = {65536: 0.36669}


def get_mesh(n_nodes, avg_degree=6, seed=0):
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    # v2: nodes Morton-ordered (synthetic.make_random_mesh_sample
    # spatial_sort) — id locality matching real mesh files
    path = os.path.join(cache, f"mesh_{n_nodes}_{avg_degree}_{seed}_v2.npz")
    if os.path.exists(path):
        z = np.load(path)
        return {k: z[k] for k in z.files}
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from aero_gnn_tpu.data import dataset as D
    from aero_gnn_tpu.data.synthetic import make_random_mesh_sample
    s = make_random_mesh_sample(n_nodes=n_nodes, avg_degree=avg_degree,
                                seed=seed)
    D.compute_features([s], ["mach", "alpha"])
    out = {"senders": s.senders, "receivers": s.receivers, "x": s.x,
           "edge_attr": s.edge_attr, "pos": s.pos, "y": s.y}
    np.savez(path, **out)
    return out


def measure_rtt():
    """Per-sync host<->device round-trip overhead (the axon relay adds
    ~25ms per blocking fetch; must be subtracted from timings)."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda a: a + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def time_scan_fn(fn, args, rtt, *, iters=16, repeats=3):
    """fn(*args) runs ``iters`` chained steps inside one jit call and
    returns a scalar; timing = (call_time - rtt) / iters, best of repeats.

    NOTE: plain block_until_ready does NOT synchronize through the axon
    relay — only a host value fetch does, hence the scalar return.
    """
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / iters


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    import optax

    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.training.loop import make_optimizer, masked_mse
    from aero_gnn_tpu import ops

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # RTT first: the graph transfer below ships hundreds of MB through the
    # relay; measuring before keeps the trivial-op program warm and gives
    # early evidence the chip executes at all
    rtt = measure_rtt()
    log(f"host sync RTT: {rtt*1e3:.1f} ms (subtracted from timings)")

    n_nodes = int(os.environ.get("BENCH_NODES", 65536))
    mesh = get_mesh(n_nodes)
    n_edges = len(mesh["senders"])
    np_pad = -(-(n_nodes + 1) // 512) * 512

    # Baseline policy: "stored" uses the recorded same-hardware naive-port
    # measurement (fast, robust); "fresh" re-measures it in this run,
    # INTERLEAVED with the optimized config in one process (the CLAUDE.md
    # drift-control method); "skip" reports vs_baseline=null.
    # BENCH_SKIP_BASELINE=1 maps to skip/null, preserving the semantics of
    # recorded round-1..3 command lines (ADVICE r4).
    base_mode = os.environ.get("BENCH_BASELINE", "stored")
    if os.environ.get("BENCH_SKIP_BASELINE"):
        base_mode = "skip"

    # the optimized path gets the block-aligned layout the Pallas kernel
    # needs (exact padding, no bucket growth); the baseline, when measured
    # fresh, gets the plain layout (a naive port would not block-align)
    graph = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad,
                                     align_edges=True)
    log(f"mesh: {n_nodes} nodes, {n_edges} edges "
        f"(aligned pad {graph.num_nodes_pad}/{graph.num_edges_pad})")
    t0 = time.perf_counter()
    float(graph.edge_mask[0])  # force H2D
    log(f"graph transfer+sync: {time.perf_counter()-t0:.1f} s")
    ITERS = int(os.environ.get("BENCH_ITERS", 16))

    # Per-layer remat is pure overhead when activations fit HBM (the
    # save_fused policy keeps the fused-VJP residuals anyway): 92.1 vs
    # 97.5 ms/step on the 65k mesh, 551 vs 570 on 262k
    # (benchmarks/ablate_remat.py). Meshes beyond the tested 262k need it
    # to fit 16 GB; BENCH_REMAT=0/1 overrides the threshold.
    remat_env = os.environ.get("BENCH_REMAT", "auto")
    remat = (n_nodes > 262144 if remat_env == "auto"
             else remat_env == "1")
    # grouped (sqrt) remat: at >512k nodes even per-layer remat stores an
    # [E, h] carry per layer (1 GB each at 1M) — checkpoint groups of K
    # layers instead, saving only group boundaries. K=3 beats K=5 at 524k
    # (981.6 vs 1010.9 ms/step unrolled, benchmarks/ablate_524k.py r4)
    remat_group = int(os.environ.get("BENCH_REMAT_GROUP", "3")) \
        if remat and n_nodes > 262144 else 0
    # Unrolled processor: without remat it drops the lax.scan residual
    # stacking copies (92.0 -> 69.8 ms/step at 65k,
    # benchmarks/ablate_structure.py); WITH grouped remat the unrolled
    # groups keep boundaries as separate freeable buffers instead of
    # monolithic [G,E,h]/[K,E,h] scan stacks — 16.37G (compile-OOM) ->
    # 14.22G peak at 1M (benchmarks/fit_1m.py round-4 record).
    unroll_env = os.environ.get("BENCH_UNROLL", "auto")
    unroll = ((not remat) or remat_group > 0) if unroll_env == "auto" \
        else unroll_env == "1"
    # opt-in: stream group-boundary (x, e) to pinned host memory
    # (MGNConfig.remat_offload) — not needed to fit 1M once the grouped
    # remat is unrolled, kept for >1M experiments
    remat_offload = os.environ.get("BENCH_REMAT_OFFLOAD") == "1"
    # inner checkpoint policy for grouped remat: save_fused skips the
    # per-layer THIRD forward (980.8 -> 875.7 ms at 524k,
    # benchmarks/ablate_524k.py) but its K x (sg+d_proj+agg) residuals
    # break the 1M fit (fit_1m K3+unroll+sf: 17.17G). Round 5: the
    # PARTIAL policy save_fused:2 (sf inner on the first 2 of 5 groups)
    # fits 1M at 15.73G (AOT + real-chip verified) and measures 1961 vs
    # 2079 ms — auto uses it above 786k; BENCH_REMAT_GROUP_POLICY=full
    # is the fallback if a future compiler breaks the 0.02G margin
    gp_env = os.environ.get("BENCH_REMAT_GROUP_POLICY", "auto")
    remat_group_policy = \
        ("save_fused" if n_nodes <= 786432 else "save_fused:2") \
        if gp_env == "auto" else gp_env
    log(f"per-layer remat: {remat} ({remat_env}), unroll: {unroll}, "
        f"remat_group: {remat_group} ({remat_group_policy}), "
        f"remat_offload: {remat_offload}")

    def build(do_concat_trick, compute_dtype="float32", remat=remat,
              unroll=unroll, remat_group=remat_group,
              remat_offload=remat_offload,
              remat_group_policy=remat_group_policy):
        cfg = MGNConfig(
            input_node_dim=6, input_edge_dim=3, output_node_dim=4,
            processor_size=15, hidden_dim_processor=128,
            hidden_dim_node_encoder=128, hidden_dim_edge_encoder=128,
            hidden_dim_decoder=128,
            num_hidden_layers_node_processor=2,
            num_hidden_layers_edge_processor=2,
            num_hidden_layers_node_encoder=2,
            num_hidden_layers_edge_encoder=2,
            num_hidden_layers_decoder=2,
            aggregation="add", do_concat_trick=do_concat_trick,
            compute_dtype=compute_dtype, remat=remat, unroll=unroll,
            remat_group=remat_group, remat_offload=remat_offload,
            remat_group_policy=remat_group_policy)
        params = cfg.init(jax.random.PRNGKey(0))
        optimizer = make_optimizer(1e-3)
        opt_state = optimizer.init(params)

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

        @jax.jit
        def fwd_k(params, graph):
            # the carry perturbs the input so XLA cannot hoist the forward
            # out of the loop as loop-invariant (it does, and it makes the
            # timing 16x optimistic)
            def body(acc, _):
                g = graph.replace(x=graph.x + acc * 1e-30)
                pred = cfg.apply(params, g)
                return acc + pred[0, 0], None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return acc

        return params, opt_state, train_k, fwd_k

    # --- optimized path FIRST: the headline number must exist before any
    # optional measurement gets a chance to hang the run ---
    backend = os.environ.get("AERO_GNN_OPS_BACKEND", "pallas")
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    with ops.use_backend(backend):
        p1, o1, step1, fwd1 = build(do_concat_trick=True,
                                    compute_dtype=dtype)
        if base_mode != "fresh":
            t_opt = time_scan_fn(step1, (p1, o1, graph), rtt, iters=ITERS)

    t_base = None
    if base_mode == "stored":
        t_base = STORED_BASELINE_S.get(n_nodes)
        if t_base:
            log(f"baseline (full-concat EdgeBlock, XLA; stored "
                f"same-hardware measurement): {t_base*1e3:.2f} ms/step")
        else:
            log(f"no stored baseline for {n_nodes} nodes; vs_baseline=null")
    elif base_mode == "fresh":
        # Same-process INTERLEAVED A/B (chip-state drift makes sequential
        # cross-measurement ratios unreliable — CLAUDE.md perf method):
        # compile+warm both programs, then alternate timed calls and take
        # each side's best.
        graph_base = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad)
        float(graph_base.edge_mask[0])
        with ops.use_backend("xla"):
            # the naive baseline keeps per-layer remat: its [E,3h] concat
            # activations blow HBM without it
            p0, o0, step0, _ = build(do_concat_trick=False, remat=True,
                                     unroll=False, remat_group=0,
                                     remat_offload=False)
            float(step0(p0, o0, graph_base))  # compile + warm
        with ops.use_backend(backend):
            float(step1(p1, o1, graph))  # compile + warm

        def timed(fn, args):
            t0 = time.perf_counter()
            float(fn(*args))
            return max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS

        best_o = best_b = float("inf")
        for rep in range(3):
            best_o = min(best_o, timed(step1, (p1, o1, graph)))
            best_b = min(best_b, timed(step0, (p0, o0, graph_base)))
            log(f"interleaved rep {rep}: opt best {best_o*1e3:.2f} ms, "
                f"baseline best {best_b*1e3:.2f} ms")
        t_opt, t_base = best_o, best_b
        log(f"baseline (full-concat EdgeBlock, XLA, fresh interleaved): "
            f"{t_base*1e3:.2f} ms/step -> {n_edges/t_base:,.0f} edges/s")
    else:
        log("baseline skipped")
    log(f"optimized (concat-trick, {backend}, {dtype}): "
        f"{t_opt*1e3:.2f} ms/step -> {n_edges/t_opt:,.0f} edges/s (train)")

    # THE deliverable. Printed before the (optional) inference measurement
    # so a late tunnel wedge cannot cost the round its number.
    print(json.dumps({
        "metric": "edges_per_s_per_chip",
        "value": round(n_edges / t_opt, 1),
        "unit": "edges/s",
        "vs_baseline": round(t_base / t_opt, 4) if t_base else None,
        "baseline": base_mode if t_base else None,
    }), flush=True)

    if os.environ.get("BENCH_SKIP_INFERENCE"):
        return
    with ops.use_backend(backend):
        t_fwd = time_scan_fn(fwd1, (p1, graph), rtt, iters=ITERS)
    log(f"inference: {t_fwd*1e3:.2f} ms/pass "
        f"-> {1.0/t_fwd:,.2f} rollout steps/s, {n_edges/t_fwd:,.0f} edges/s")


PROBE_CODE = """
import time, jax, jax.numpy as jnp
t0 = time.perf_counter()
f = jax.jit(lambda a: a + 1.0)
v = float(f(jnp.float32(1.0)))
print(f"chip probe ok: {v} in {time.perf_counter()-t0:.1f}s", flush=True)
"""


def _probe_chip(timeout_s, recover_wait_s, max_probes):
    """Trivial-op chip probe in a subprocess. On hang: kill the probe's
    exact PID (the relay client) and wait for the chip to recover — the
    CLAUDE.md recovery recipe. Returns True once a probe succeeds."""
    for i in range(max_probes):
        try:
            r = subprocess.run([sys.executable, "-u", "-c", PROBE_CODE],
                               timeout=timeout_s, capture_output=True,
                               text=True)
        except subprocess.TimeoutExpired:
            # subprocess.run has already SIGKILLed the exact child PID
            log(f"chip probe {i + 1}/{max_probes} hung after {timeout_s}s; "
                f"killed client, waiting {recover_wait_s}s for recovery")
            time.sleep(recover_wait_s)
            continue
        if r.returncode == 0:
            log(r.stdout.strip() or "chip probe ok")
            return True
        log(f"chip probe {i + 1}/{max_probes} failed rc={r.returncode}: "
            f"{r.stderr.strip()[-300:]}")
        time.sleep(recover_wait_s)
    return False


def _run_attempt(timeout_s):
    """One measurement attempt in a child process, stdout streamed LIVE so
    the JSON line reaches the driver the moment it exists. Returns
    (json_seen, returncode_or_None_if_timed_out)."""
    env = dict(os.environ, BENCH_INNER="1")
    inner = os.environ.get("BENCH_INNER_SCRIPT", os.path.abspath(__file__))
    proc = subprocess.Popen([sys.executable, "-u", inner],
                            env=env, stdout=subprocess.PIPE, stderr=None,
                            text=True, bufsize=1)
    json_seen = False
    deadline = time.monotonic() + timeout_s
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    buf = ""
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            proc.kill()
            proc.wait()
            log(f"attempt timed out after {timeout_s}s"
                + (" (JSON already delivered)" if json_seen else ""))
            return json_seen, None
        if sel.select(timeout=min(remaining, 5.0)):
            chunk = proc.stdout.readline()
            if chunk == "" and proc.poll() is not None:
                break
            buf += chunk
            if chunk.endswith("\n"):
                line = buf.strip()
                buf = ""
                if line.startswith("{") and '"metric"' in line:
                    sys.stdout.write(line + "\n")
                    sys.stdout.flush()
                    json_seen = True
                    # the deliverable is out; give the remaining secondary
                    # measurements (inference) a bounded grace, not the
                    # whole attempt budget
                    grace = int(os.environ.get("BENCH_POST_JSON_GRACE_S",
                                               240))
                    deadline = min(deadline, time.monotonic() + grace)
                elif line:
                    log(f"[inner stdout] {line}")
        elif proc.poll() is not None:
            break
    proc.wait()
    return json_seen, proc.returncode


def _main_with_retries():
    """The TPU tunnel here intermittently wedges (trivial ops hang until
    the client process dies — CLAUDE.md). Round 3 lost its driver-recorded
    number to exactly this: 3 x 1500 s attempts never fit the driver's
    outer budget once the tunnel wedged. This wrapper (a) probes the chip
    cheaply and actively recovers it BEFORE burning an attempt, (b) sizes
    attempts at <=600 s (healthy 65k run ~= 6-8 min), (c) streams the JSON
    out the moment it exists, and (d) respects a total deadline."""
    attempts = int(os.environ.get("BENCH_ATTEMPTS", 3))
    timeout_s = int(os.environ.get("BENCH_TIMEOUT_S", 600))
    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", 100))
    recover_wait = int(os.environ.get("BENCH_RECOVER_WAIT_S", 90))
    total_budget = int(os.environ.get("BENCH_TOTAL_BUDGET_S", 1440))
    t_start = time.monotonic()

    for attempt in range(attempts):
        elapsed = time.monotonic() - t_start
        remaining = total_budget - elapsed
        if remaining < 180:
            log(f"total budget exhausted ({elapsed:.0f}s of "
                f"{total_budget}s); giving up")
            break
        if not _probe_chip(probe_timeout, recover_wait,
                           max_probes=2 if attempt == 0 else 1):
            log(f"attempt {attempt + 1}/{attempts}: chip unresponsive "
                f"after probes; trying the measurement anyway")
        attempt_budget = int(min(timeout_s,
                                 total_budget - (time.monotonic() - t_start)))
        if attempt_budget < 120:
            break
        json_seen, rc = _run_attempt(attempt_budget)
        if json_seen:
            return
        log(f"bench attempt {attempt + 1}/{attempts} "
            f"{'timed out' if rc is None else f'failed rc={rc}'}; retrying")
    raise SystemExit("bench failed: no JSON produced within budget")


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER"):
        main()
    else:
        _main_with_retries()
