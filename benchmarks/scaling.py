"""Scaling-efficiency benchmark + ICI communication model.

North star: >= 80% edges/s parallel efficiency 1 chip -> N chips
(BASELINE.json). Only one real TPU chip is attached here, so this harness
records THREE things per strategy (halo, halo-split, all-gather spatial,
data-parallel, hybrid, BSMS-spatial):

1. measured wall-clock on a virtual CPU device mesh (functional scaling —
   the collectives, shardings and partitioners are exactly what a pod
   slice would run). NOTE this host has 2 cores: wall-clock efficiency at
   P > 2 is host-compute-bound and is NOT evidence about TPU scaling.
2. exact per-device communication volumes, from the partition artifacts
   (halo table sizes, all_gather payloads, gradient all-reduce bytes).
3. a roofline-style ICI model: measured single-chip per-edge-per-layer
   train cost (bench.py) vs comm time at a configurable per-chip ICI
   bandwidth (default 90 GB/s effective one-direction — TPU v5e has
   1600 Gbps aggregate ICI per chip). Serial halo pays
   t_compute + t_comm; the overlapped halo-split path pays
   max(t_compute, t_comm).

Usage:
    python benchmarks/scaling.py [--nodes 16384] [--layers 15]
        [--hidden 128] [--out SCALING_r2.json]
(forces CPU + 8 virtual devices; safe to run anywhere)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=16384,
                        help="global mesh size for strong scaling")
    parser.add_argument("--weak-nodes", type=int, default=4096,
                        help="per-shard mesh size for weak scaling")
    parser.add_argument("--layers", type=int, default=15)
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--measure", action="store_true",
                        help="also measure CPU-mesh wall clock (slow, "
                        "host-bound; comm volumes + model always recorded)")
    parser.add_argument("--ici-gbps", type=float, default=90.0,
                        help="assumed effective per-chip ICI bandwidth "
                        "(GB/s, one direction)")
    parser.add_argument("--chip-edges-per-s", type=float, default=None,
                        help="measured single-chip train edges/s "
                        "(default: round-2 headline 3.98e6)")
    parser.add_argument("--out", default="SCALING_r3.json")
    parser.add_argument("--p-list", default="1,2,4,8",
                        help="comma-separated shard counts (r5: 16/32 "
                        "extend the story past P=8)")
    parser.add_argument("--large-nodes", type=int, default=2097152,
                        help="mesh size for the large-mesh model rows "
                        "(the >=2M multi-chip regime; 0 disables)")
    parser.add_argument("--large-p", default="8,16,32")
    args = parser.parse_args()

    p_list = [int(x) for x in args.p_list.split(",") if x]

    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(p_list + [8]))
    except Exception:  # noqa: BLE001 — backend already up
        pass
    import numpy as np

    from aero_gnn_tpu.data import dataset as D
    from aero_gnn_tpu.data.synthetic import make_random_mesh_sample
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.parallel import halo as HL
    from aero_gnn_tpu.parallel import spatial as SP
    from aero_gnn_tpu.parallel import data_parallel as DP
    from aero_gnn_tpu.parallel import hybrid as HY
    from aero_gnn_tpu.parallel.mesh import make_mesh
    from aero_gnn_tpu.training.loop import make_optimizer
    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.training.loop import make_step_fns

    n_dev = jax.device_count()
    bytes_act = 2  # bf16 activations on TPU
    chip_rate = args.chip_edges_per_s or 3.98e6  # round-2 headline
    ici_bps = args.ici_gbps * 1e9

    sample = make_random_mesh_sample(n_nodes=args.nodes, seed=0)
    D.compute_features([sample], ["mach", "alpha"])
    n_edges = sample.num_edges

    cfg = MGNConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=args.layers, hidden_dim_processor=args.hidden,
        hidden_dim_node_encoder=args.hidden,
        hidden_dim_edge_encoder=args.hidden,
        hidden_dim_decoder=args.hidden, do_concat_trick=True,
        aggregation="add")
    params0 = cfg.init(jax.random.PRNGKey(0))
    param_bytes = sum(a.size * 4 for a in jax.tree.leaves(params0))
    h = args.hidden
    L = args.layers

    def time_steps(step, params, opt_state, sg):
        params, opt_state, loss = step(params, opt_state, sg)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, opt_state, loss = step(params, opt_state, sg)
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / args.iters

    def grad_allreduce_bytes(p: int) -> float:
        """Ring all-reduce: each device ships 2 (P-1)/P x param bytes."""
        return 2 * (p - 1) / p * param_bytes

    def model_eff(p, edges_shard, comm_bytes_layer, overlap: bool,
                  interior_frac: float = 1.0):
        """Predicted TPU efficiency from the comm/compute roofline."""
        t_comp = edges_shard / chip_rate  # full step (all L layers)
        t_comm = L * comm_bytes_layer / ici_bps \
            + grad_allreduce_bytes(p) / ici_bps
        if overlap:
            # comm hides under the interior fraction of each layer
            t_int = t_comp * interior_frac
            t_step = max(t_int, L * comm_bytes_layer / ici_bps) \
                + t_comp * (1 - interior_frac) \
                + grad_allreduce_bytes(p) / ici_bps
        else:
            t_step = t_comp + t_comm
        t_single = n_edges / chip_rate
        return {
            "t_compute_ms": round(t_comp * 1e3, 3),
            "t_comm_ms": round(t_comm * 1e3, 3),
            "predicted_ms": round(t_step * 1e3, 3),
            "predicted_efficiency": round(t_single / (p * t_step), 4),
        }

    out = {
        "device": "cpu-virtual-8 (functional) + ICI model",
        "host_cores": os.cpu_count(),
        "assumptions": {
            "chip_train_edges_per_s": chip_rate,
            "ici_effective_gbps": args.ici_gbps,
            "activation_bytes": bytes_act,
            "param_bytes": param_bytes,
            "layers": L, "hidden": h,
            "note": "wall-clock at P>2 is bound by 2 host cores; "
                    "predicted_efficiency is the ICI roofline model",
        },
        "strong": {"nodes": args.nodes, "edges": int(n_edges),
                   "strategies": {}},
        "weak": {"nodes_per_shard": args.weak_nodes, "strategies": {}},
    }

    # ---------------- strong scaling ----------------
    for p in p_list:
        if p > n_dev:
            continue
        optimizer = make_optimizer(1e-3)

        entries = {}
        if p == 1:
            gb = padded.build_graph_batch(
                senders=sample.senders, receivers=sample.receivers,
                x=sample.x, edge_attr=sample.edge_attr, pos=sample.pos,
                y=sample.y)
            if args.measure:
                fns = make_step_fns(cfg, optimizer, donate=False)
                params = jax.tree.map(lambda a: a.copy(), params0)
                ost = optimizer.init(params)
                dt = time_steps(
                    lambda pa, o, g: fns.train_step(pa, o, g, None, None),
                    params, ost, gb)
            else:
                dt = None
            entries["single"] = {
                "measured_ms": None if dt is None else round(dt * 1e3, 2),
                "comm_bytes_per_layer": 0,
                "model": model_eff(1, n_edges, 0, overlap=False)}
        else:
            mesh = make_mesh(data=1, graph=p, devices=jax.devices()[:p])

            # --- serial halo ---
            sg = HL.partition_graph_halo(
                senders=sample.senders, receivers=sample.receivers,
                x=sample.x, edge_attr=sample.edge_attr, pos=sample.pos,
                y=sample.y, num_parts=p)
            H = sg.halo_size
            halo_bytes = (p - 1) * H * h * bytes_act
            dt = None
            if args.measure:
                params = jax.tree.map(lambda a: a.copy(), params0)
                ost = optimizer.init(params)
                step = HL.make_halo_train_step(cfg, optimizer, mesh)
                dt = time_steps(step, params, ost, sg)
            entries["halo"] = {
                "measured_ms": None if dt is None else round(dt * 1e3, 2),
                "halo_rows_padded": int(H),
                "comm_bytes_per_layer": int(halo_bytes),
                "model": model_eff(p, n_edges / p, halo_bytes,
                                   overlap=False)}

            # --- overlapped halo-split ---
            sgs = HL.partition_graph_halo_split(
                senders=sample.senders, receivers=sample.receivers,
                x=sample.x, edge_attr=sample.edge_attr, pos=sample.pos,
                y=sample.y, num_parts=p)
            Ei = sgs.edge_attr_int.shape[1]
            Eb = sgs.edge_attr_bnd.shape[1]
            interior_frac = Ei / (Ei + Eb)
            Hs = sgs.halo_size
            halo_bytes_s = (p - 1) * Hs * h * bytes_act
            dt = None
            if args.measure:
                params = jax.tree.map(lambda a: a.copy(), params0)
                ost = optimizer.init(params)
                step = HL.make_halo_split_train_step(cfg, optimizer, mesh)
                dt = time_steps(step, params, ost, sgs)
            entries["halo_split"] = {
                "measured_ms": None if dt is None else round(dt * 1e3, 2),
                "interior_edges": int(Ei), "boundary_edges": int(Eb),
                "comm_bytes_per_layer": int(halo_bytes_s),
                "model": model_eff(p, n_edges / p, halo_bytes_s,
                                   overlap=True,
                                   interior_frac=interior_frac)}

            # --- all-gather spatial (baseline) ---
            sgg = SP.partition_graph(
                senders=sample.senders, receivers=sample.receivers,
                x=sample.x, edge_attr=sample.edge_attr, pos=sample.pos,
                y=sample.y, num_parts=p)
            nl = sgg.x.shape[1]
            ag_bytes = (p - 1) * nl * h * bytes_act
            dt = None
            if args.measure:
                params = jax.tree.map(lambda a: a.copy(), params0)
                ost = optimizer.init(params)
                step = SP.make_spatial_train_step(cfg, optimizer, mesh)
                dt = time_steps(step, params, ost, sgg)
            entries["spatial_allgather"] = {
                "measured_ms": None if dt is None else round(dt * 1e3, 2),
                "comm_bytes_per_layer": int(ag_bytes),
                "model": model_eff(p, n_edges / p, ag_bytes,
                                   overlap=False)}

            # --- flagship BSMS: overlapped halo-split fine level +
            # sharded WeightedEdgeConv transfer, coarse levels replicated
            # (BASELINE config[4]) ---
            from aero_gnn_tpu.models.bsms import BSMSConfig
            from aero_gnn_tpu.parallel import bsms_spatial as BS

            lps = 2
            bs_cfg = BSMSConfig(
                input_node_dim=6, input_edge_dim=3, output_node_dim=4,
                processor_size=args.layers, hidden_dim_processor=h,
                hidden_dim_node_encoder=h, hidden_dim_edge_encoder=h,
                hidden_dim_decoder=h, do_concat_trick=True,
                aggregation="add", num_scales=3, layers_per_scale=lps,
                hierarchy_mode="bistride", transfer="weighted")
            bg = BS.partition_bsms_halo(
                senders=np.asarray(sample.senders, np.int64),
                receivers=np.asarray(sample.receivers, np.int64),
                x=sample.x, edge_attr=sample.edge_attr, pos=sample.pos,
                y=sample.y, num_parts=p, num_scales=3, mode="bistride")
            # EVERY level sharded: all compute 1/P. Comm = per-layer
            # boundary all_to_all on each level's stack (overlapped with
            # its interior compute) + per level boundary one psum + one
            # all_gather of the replicated [nc + ec, h] transfer
            # intermediate + the gradient all-reduce.
            layer_counts = [2 * lps, 2 * lps, max(1, L - 4 * lps)]
            e_levels = [lv.e_real for lv in bg.levels]
            w_tot = sum(e * c for e, c in zip(e_levels, layer_counts))
            t_chip = n_edges / chip_rate * w_tot / (n_edges * L)
            t_comp = t_chip / p
            halo_bytes_lv = [(p - 1) * lv.graph.halo_size * h * bytes_act
                             for lv in bg.levels]
            t_comm_halo = sum(c * b for c, b in zip(layer_counts,
                                                    halo_bytes_lv)) / ici_bps
            # sparse owner-routed transfers: EXACT staged-row counts from
            # the plans (down node + down edge [h+1 wide] + up fetch)
            transfer_bytes = sum(
                (lv.plan.node_recv_rows.shape[0]
                 * lv.plan.node_recv_rows.shape[2] * h
                 + lv.plan.edge_recv_rows.shape[0]
                 * lv.plan.edge_recv_rows.shape[2] * (h + 1)
                 + lv.plan.up_send_rows.shape[0]
                 * lv.plan.up_send_rows.shape[2] * h) * bytes_act
                for lv in bg.levels if lv.plan is not None)
            # overlap: the per-layer halo hides under each level's interior
            Ei_b = bg.fine.edge_attr_int.shape[1]
            Eb_b = bg.fine.edge_attr_bnd.shape[1]
            interior_frac = Ei_b / (Ei_b + Eb_b)
            t_int = t_comp * interior_frac
            t_step = (max(t_int, t_comm_halo) + t_comp * (1 - interior_frac)
                      + transfer_bytes / ici_bps
                      + grad_allreduce_bytes(p) / ici_bps)
            dt = None
            if args.measure:
                bs_params = bs_cfg.init(jax.random.PRNGKey(4))
                bs_ost = optimizer.init(bs_params)
                step = BS.make_bsms_halo_train_step(bs_cfg, optimizer, mesh)
                dt = time_steps(step, bs_params, bs_ost, bg)
            entries["bsms_halo"] = {
                "measured_ms": None if dt is None else round(dt * 1e3, 2),
                "transfer": "weighted", "hierarchy_mode": "bistride",
                "scheme": "all-levels-sharded halo-split",
                "halo_rows_padded_per_level":
                    [int(lv.graph.halo_size) for lv in bg.levels],
                "comm_bytes_halo_per_step": int(t_comm_halo * ici_bps),
                "transfer_comm_bytes": int(transfer_bytes),
                "model": {
                    "t_compute_ms": round(t_comp * 1e3, 3),
                    "t_comm_ms": round(
                        (t_comm_halo + transfer_bytes / ici_bps
                         + grad_allreduce_bytes(p) / ici_bps) * 1e3, 3),
                    "predicted_ms": round(t_step * 1e3, 3),
                    "predicted_efficiency": round(
                        t_chip / (p * t_step), 4)}}

            # --- data parallel (p independent replicas of the mesh) ---
            dmesh = make_mesh(data=p, graph=1, devices=jax.devices()[:p])
            dt = None
            if args.measure:
                gb = padded.build_graph_batch(
                    senders=sample.senders, receivers=sample.receivers,
                    x=sample.x, edge_attr=sample.edge_attr, pos=sample.pos,
                    y=sample.y)
                stacked = DP.stack_batches([gb] * p)
                params = jax.tree.map(lambda a: a.copy(), params0)
                ost = optimizer.init(params)
                step = DP.make_dp_train_step(cfg, optimizer, dmesh)
                rng = jax.random.PRNGKey(1)
                t0 = None
                pp, oo, loss = step(params, ost, stacked, None, rng)
                jax.block_until_ready(loss)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    pp, oo, loss = step(pp, oo, stacked, None, rng)
                jax.block_until_ready(loss)
                dt = (time.perf_counter() - t0) / args.iters
            # DP throughput counts p meshes per step
            t_comp = n_edges / chip_rate
            t_step = t_comp + grad_allreduce_bytes(p) / ici_bps
            entries["data_parallel"] = {
                "measured_ms": None if dt is None else round(dt * 1e3, 2),
                "comm_bytes_per_step": int(grad_allreduce_bytes(p)),
                "model": {
                    "t_compute_ms": round(t_comp * 1e3, 3),
                    "t_comm_ms": round(
                        grad_allreduce_bytes(p) / ici_bps * 1e3, 3),
                    "predicted_ms": round(t_step * 1e3, 3),
                    "predicted_efficiency": round(t_comp / t_step, 4)}}

        out["strong"]["strategies"][str(p)] = entries
        log(f"strong P={p}: " + ", ".join(
            f"{k}={v['model'].get('predicted_efficiency', 1.0):.3f}"
            for k, v in entries.items()))

    # ---------------- weak scaling (fixed per-shard size) ----------------
    for p in p_list:
        if p > n_dev:
            continue
        ws = make_random_mesh_sample(n_nodes=args.weak_nodes * p, seed=1)
        D.compute_features([ws], ["mach", "alpha"])
        we = ws.num_edges
        if p == 1:
            out["weak"]["strategies"]["1"] = {
                "edges": int(we),
                "model": {"predicted_efficiency": 1.0}}
            continue
        sgs = HL.partition_graph_halo_split(
            senders=ws.senders, receivers=ws.receivers,
            x=ws.x, edge_attr=ws.edge_attr, pos=ws.pos, y=ws.y,
            num_parts=p)
        Ei = sgs.edge_attr_int.shape[1]
        Eb = sgs.edge_attr_bnd.shape[1]
        Hs = sgs.halo_size
        halo_bytes = (p - 1) * Hs * h * bytes_act
        t_comp = (we / p) / chip_rate
        t_int = t_comp * Ei / (Ei + Eb)
        t_comm = L * halo_bytes / ici_bps
        t_step = max(t_int, t_comm) + t_comp * Eb / (Ei + Eb) \
            + grad_allreduce_bytes(p) / ici_bps
        t_ref = (we / p) / chip_rate  # per-shard work on one chip
        dt = None
        if args.measure:
            optimizer = make_optimizer(1e-3)
            mesh = make_mesh(data=1, graph=p, devices=jax.devices()[:p])
            params = jax.tree.map(lambda a: a.copy(), params0)
            ost = optimizer.init(params)
            step = HL.make_halo_split_train_step(cfg, optimizer, mesh)
            dt = time_steps(step, params, ost, sgs)
        out["weak"]["strategies"][str(p)] = {
            "edges": int(we),
            "measured_ms": None if dt is None else round(dt * 1e3, 2),
            "halo_rows_padded": int(Hs),
            "comm_bytes_per_layer": int(halo_bytes),
            "model": {
                "t_compute_ms": round(t_comp * 1e3, 3),
                "t_comm_ms": round(t_comm * 1e3, 3),
                "predicted_ms": round(t_step * 1e3, 3),
                "predicted_efficiency": round(t_ref / t_step, 4)}}
        log(f"weak P={p}: eff="
            f"{out['weak']['strategies'][str(p)]['model']['predicted_efficiency']:.3f}")

    # ------- large-mesh model rows (the >=2M multi-chip regime) -------
    # Partition artifacts are REAL (host partitioner at the full scale);
    # efficiency is the ICI roofline model — no 2M functional run fits a
    # 2-core host. chip_rate at these per-shard sizes is the measured
    # single-chip rate for the matching mesh band (BASELINE.md table).
    if args.large_nodes:
        from bench import get_mesh
        from aero_gnn_tpu.models.bsms import BSMSConfig  # noqa: F811
        from aero_gnn_tpu.parallel import bsms_spatial as BS  # noqa: F811

        lm = get_mesh(args.large_nodes)
        le = len(lm["senders"])
        out["large"] = {"nodes": args.large_nodes, "edges": int(le),
                        "strategies": {}}
        lps = 2
        layer_counts = [2 * lps, 2 * lps, max(1, L - 4 * lps)]
        # single-chip rate for the per-shard mesh size band: 3.44M edges/s
        # at 262k (BASELINE.md) — conservative for the smaller shards at
        # higher P, which run in the faster small-mesh regime
        banded_rate = {262144: 3.44e6, 131072: 3.7e6, 65536: 3.98e6}
        for p in [int(x) for x in args.large_p.split(",") if x]:
            per_shard = args.large_nodes // p
            rate = banded_rate.get(per_shard, chip_rate)
            sgs = HL.partition_graph_halo_split(
                senders=lm["senders"], receivers=lm["receivers"],
                x=lm["x"], edge_attr=lm["edge_attr"], pos=lm["pos"],
                y=lm["y"], num_parts=p)
            Ei = sgs.edge_attr_int.shape[1]
            Eb = sgs.edge_attr_bnd.shape[1]
            interior_frac = Ei / (Ei + Eb)
            Hs = sgs.halo_size
            halo_bytes = (p - 1) * Hs * h * bytes_act
            t_comp = (le / p) / rate
            t_int = t_comp * interior_frac
            t_comm = L * halo_bytes / ici_bps
            t_step = max(t_int, t_comm) + t_comp * (1 - interior_frac) \
                + grad_allreduce_bytes(p) / ici_bps
            t_single = le / rate
            ent = {"halo_split": {
                "halo_rows_padded": int(Hs),
                "comm_bytes_per_layer": int(halo_bytes),
                "chip_rate_edges_per_s": rate,
                "model": {
                    "t_compute_ms": round(t_comp * 1e3, 3),
                    "t_comm_ms": round(
                        (t_comm + grad_allreduce_bytes(p) / ici_bps)
                        * 1e3, 3),
                    "predicted_ms": round(t_step * 1e3, 3),
                    "predicted_efficiency": round(
                        t_single / (p * t_step), 4)}}}
            del sgs
            bg = BS.partition_bsms_halo(
                senders=np.asarray(lm["senders"], np.int64),
                receivers=np.asarray(lm["receivers"], np.int64),
                x=lm["x"], edge_attr=lm["edge_attr"], pos=lm["pos"],
                y=lm["y"], num_parts=p, num_scales=3, mode="bistride")
            e_levels = [lv.e_real for lv in bg.levels]
            w_tot = sum(e * c for e, c in zip(e_levels, layer_counts))
            t_chip = le / rate * w_tot / (le * L)
            t_comp = t_chip / p
            halo_bytes_lv = [(p - 1) * lv.graph.halo_size * h * bytes_act
                             for lv in bg.levels]
            t_comm_halo = sum(c * b for c, b in zip(
                layer_counts, halo_bytes_lv)) / ici_bps
            transfer_bytes = sum(
                (lv.plan.node_recv_rows.shape[0]
                 * lv.plan.node_recv_rows.shape[2] * h
                 + lv.plan.edge_recv_rows.shape[0]
                 * lv.plan.edge_recv_rows.shape[2] * (h + 1)
                 + lv.plan.up_send_rows.shape[0]
                 * lv.plan.up_send_rows.shape[2] * h) * bytes_act
                for lv in bg.levels if lv.plan is not None)
            Ei_b = bg.fine.edge_attr_int.shape[1]
            Eb_b = bg.fine.edge_attr_bnd.shape[1]
            interior_frac = Ei_b / (Ei_b + Eb_b)
            t_int = t_comp * interior_frac
            t_step = (max(t_int, t_comm_halo)
                      + t_comp * (1 - interior_frac)
                      + transfer_bytes / ici_bps
                      + grad_allreduce_bytes(p) / ici_bps)
            ent["bsms_halo"] = {
                "halo_rows_padded_per_level":
                    [int(lv.graph.halo_size) for lv in bg.levels],
                "transfer_comm_bytes": int(transfer_bytes),
                "chip_rate_edges_per_s": rate,
                "model": {
                    "t_compute_ms": round(t_comp * 1e3, 3),
                    "t_comm_ms": round(
                        (t_comm_halo + transfer_bytes / ici_bps
                         + grad_allreduce_bytes(p) / ici_bps) * 1e3, 3),
                    "predicted_ms": round(t_step * 1e3, 3),
                    "predicted_efficiency": round(
                        t_chip / (p * t_step), 4)}}
            del bg
            out["large"]["strategies"][str(p)] = ent
            log(f"large({args.large_nodes}) P={p}: " + ", ".join(
                f"{k}={v['model']['predicted_efficiency']:.3f}"
                for k, v in ent.items()))

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps({"metric": "scaling_model",
                      "strong_halo_split_eff_p8":
                      out["strong"]["strategies"].get("8", {}).get(
                          "halo_split", {}).get("model", {}).get(
                          "predicted_efficiency"),
                      "weak_eff_p8":
                      out["weak"]["strategies"].get("8", {}).get(
                          "model", {}).get("predicted_efficiency")}))


if __name__ == "__main__":
    main()
