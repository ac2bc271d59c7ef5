"""Measured per-layer halo-exchange cost across REAL processes (P=2).

VERDICT r3 weak #4 / next #6: every efficiency figure in the scaling table
is the ICI roofline model; the functional CPU-mesh runs prove liveness,
not comm cost. This harness puts measured timing behind the model's one
analytic-only link: it launches two REAL local processes via
``jax.distributed`` (XLA:CPU Gloo collectives over TCP — an actual
multi-process channel with real serialization/latency), runs the genuine
halo-split train step sharded across them, and separately times a chained
sequence of the layer's exact halo exchange op (`parallel.halo._exchange`:
sender-row gather + all_to_all) to isolate per-layer exchange cost.

Reported per worker: full train step ms, per-layer exchange ms, exchange
bytes, and the implied channel bandwidth/latency — the measured inputs the
ICI model's comm fractions are corroborated against (SCALING_r4 section).

Usage: python benchmarks/scaling_2proc.py [nodes] (default 16384 — the
SCALING strong-scaling mesh). Writes SCALING_2PROC_r4.json.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_WORKER = textwrap.dedent("""
    import json, os, sys, time
    pid = int(sys.argv[1]); port = sys.argv[2]
    n_nodes = int(sys.argv[3]); layers = int(sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %(repo)r)
    from aero_gnn_tpu.parallel import distributed
    distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid,
                           initialization_timeout=120)
    assert jax.process_count() == 2
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from aero_gnn_tpu import ops
    from aero_gnn_tpu.data import dataset as D
    from aero_gnn_tpu.data.synthetic import make_random_mesh_sample
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.parallel import halo as HL
    from aero_gnn_tpu.training.loop import make_optimizer

    mesh = Mesh(np.array(jax.devices()), ("graph",))
    n_dev = len(jax.devices())
    assert n_dev == 2

    # both processes build the identical partition from the same seed;
    # each contributes its own shard of the global arrays
    s = make_random_mesh_sample(n_nodes=n_nodes, seed=0)
    D.compute_features([s], ["mach", "alpha"])
    sg = HL.partition_graph_halo_split(
        senders=s.senders, receivers=s.receivers, x=s.x,
        edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=2)

    shard = NamedSharding(mesh, P("graph"))
    repl = NamedSharding(mesh, P())

    def globalize(tree, sharding):
        def one(a):
            a = np.asarray(a)
            return jax.make_array_from_callback(
                a.shape, sharding, lambda idx: a[idx])
        return jax.tree.map(one, tree)

    sg_g = globalize(sg, shard)
    cfg = MGNConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=layers, hidden_dim_processor=128,
        hidden_dim_node_encoder=128, hidden_dim_edge_encoder=128,
        hidden_dim_decoder=128, aggregation="add", do_concat_trick=True,
        remat=False, unroll=False)
    params = globalize(cfg.init(jax.random.PRNGKey(0)), repl)
    optimizer = make_optimizer(1e-3)
    opt_state = globalize(optimizer.init(
        cfg.init(jax.random.PRNGKey(0))), repl)

    step = HL.make_halo_split_train_step(cfg, optimizer, mesh)
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, sg_g)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt_state, loss = step(params, opt_state, sg_g)
    jax.block_until_ready(loss)
    step_ms = (time.perf_counter() - t0) / reps * 1e3
    lval = float(jax.device_get(loss))

    # --- exchange-only probe: the layer's exact halo op, chained -------
    from jax import shard_map
    H = sg.halo_size
    h = 128
    CH = 15  # chained exchanges per call (serialized by data dependency)

    def per_shard(vals, send_idx):
        vals = vals[0]
        send_idx = send_idx[0]
        def body(v, _):
            t = HL._exchange(v, send_idx, "graph")
            return v + jnp.sum(t) * 1e-12, None
        v, _ = jax.lax.scan(body, vals, None, length=CH)
        return jnp.sum(v)[None]

    ex = jax.jit(shard_map(per_shard, mesh=mesh,
                           in_specs=(P("graph"), P("graph")),
                           out_specs=P("graph"), check_vma=False))
    nl = sg.nodes_per_part
    vals = globalize(np.ones((2, nl, h), np.float32), shard)
    sidx = globalize(np.asarray(sg.send_idx), shard)
    out = ex(vals, sidx); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ex(vals, sidx)
    jax.block_until_ready(out)
    ex_ms = (time.perf_counter() - t0) / reps / CH * 1e3
    # bytes MOVED per exchange per device: send [P,H,h] -> its off-shard
    # half actually crosses the channel
    bytes_cross = H * h * 4  # one [H, h] f32 block to the peer

    # --- flagship bsms_halo train step across the same 2 real processes
    # (VERDICT r4 item 4: the r4 record covered halo-split MGN only) ---
    bs_ms = bs_loss = bs_compile = None
    if os.environ.get("P2_BSMS", "1") == "1":
        from aero_gnn_tpu.models.bsms import BSMSConfig
        from aero_gnn_tpu.parallel import bsms_spatial as BS
        bg = BS.partition_bsms_halo(
            senders=np.asarray(s.senders, np.int64),
            receivers=np.asarray(s.receivers, np.int64), x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=2,
            num_scales=3, mode="bistride")
        spec_tree = BS._bsms_halo_in_spec(bg, "graph")

        def glob_spec(a, sp):
            a = np.asarray(a)
            sh = NamedSharding(mesh, sp)
            return jax.make_array_from_callback(
                a.shape, sh, lambda idx: a[idx])

        bg_g = jax.tree.map(glob_spec, bg, spec_tree)
        bs_cfg = BSMSConfig(
            input_node_dim=6, input_edge_dim=3, output_node_dim=4,
            processor_size=layers, hidden_dim_processor=128,
            hidden_dim_node_encoder=128, hidden_dim_edge_encoder=128,
            hidden_dim_decoder=128, aggregation="add",
            do_concat_trick=True, num_scales=3, hierarchy_mode="bistride",
            transfer="weighted", remat=False, unroll=False)
        bs_params = globalize(bs_cfg.init(jax.random.PRNGKey(1)), repl)
        bs_ost = globalize(optimizer.init(
            bs_cfg.init(jax.random.PRNGKey(1))), repl)
        bs_step = BS.make_bsms_halo_train_step(bs_cfg, optimizer, mesh)
        t0 = time.perf_counter()
        bs_params, bs_ost, bl = bs_step(bs_params, bs_ost, bg_g)
        jax.block_until_ready(bl)
        bs_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            bs_params, bs_ost, bl = bs_step(bs_params, bs_ost, bg_g)
        jax.block_until_ready(bl)
        bs_ms = (time.perf_counter() - t0) / reps * 1e3
        bs_loss = float(jax.device_get(bl))

    print(json.dumps({
        "bsms_train_step_ms": None if bs_ms is None else round(bs_ms, 2),
        "bsms_loss": bs_loss,
        "bsms_compile_s": None if bs_compile is None
        else round(bs_compile, 1),
        "pid": pid, "halo_rows": int(H), "nodes_per_part": int(nl),
        "compile_s": round(compile_s, 1),
        "train_step_ms": round(step_ms, 2),
        "loss": lval,
        "exchange_ms_per_layer": round(ex_ms, 4),
        "exchange_cross_bytes": int(bytes_cross),
        "implied_bw_MBps": round(bytes_cross / (ex_ms * 1e-3) / 1e6, 1),
    }), flush=True)
""") % {"repo": REPO}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    layers = int(os.environ.get("P2_LAYERS", 15))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, "-u", "-c", _WORKER, str(i),
                          str(port), str(n_nodes), str(layers)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
    recs = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            log(f"proc{i} FAILED:\n{out[-3000:]}")
            sys.exit(1)
        for ln in out.splitlines():
            if ln.startswith("{"):
                recs.append(json.loads(ln))
        log(f"proc{i} ok")
    result = {
        "what": ("REAL 2-process jax.distributed run (XLA:CPU Gloo over "
                 "TCP) of the halo-split train step + isolated per-layer "
                 "halo-exchange timing; corroborates the ICI scaling "
                 "model's comm-cost link with measured multi-process "
                 "collective times (hardware is CPU, so absolute ms are "
                 "not TPU predictions — the measured quantity is the "
                 "exchange's real channel cost vs its byte volume)"),
        "nodes": n_nodes, "layers": layers,
        "workers": recs,
    }
    out_path = os.path.join(REPO, os.environ.get("P2_OUT", "SCALING_2PROC_r4.json"))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {out_path}")
    print(json.dumps({"metric": "p2_exchange_ms_per_layer",
                      "value": recs[0]["exchange_ms_per_layer"],
                      "train_step_ms": recs[0]["train_step_ms"],
                      "bsms_train_step_ms":
                          recs[0].get("bsms_train_step_ms")}))


if __name__ == "__main__":
    main()
