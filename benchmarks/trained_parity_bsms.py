"""Trained-accuracy parity for the flagship BSMS config (VERDICT r4 item 2).

Trains THREE stacks end-to-end on the same synthetic airfoil dataset
(same split seed, train-split-only normalization, Adam 1e-3, batch 1,
identical per-epoch orders) and reports the reference errors.txt
TEST_MEAN metric (mean per-case RRMSE% on denormalized predictions,
/root/reference/inference.py:113-126,424-470):

  * reference BiStridedMeshGraphNet (torch CPU,
    /root/reference/models/bsms_mgn.py — stride-mode coordinate-sort
    pooling, scatter_mean transfer)
  * aero_gnn_tpu BSMS in reference-parity mode (hierarchy_mode="stride",
    transfer="mean" — same math, hierarchy precomputed host-side)
  * aero_gnn_tpu BSMS in FLAGSHIP mode (hierarchy_mode="bistride",
    transfer="weighted" — canonical bistride BFS + WeightedEdgeConv, the
    redesign whose trained behavior VERDICT r4 asked to validate)

Stacks start from independent inits (identical U(-1/sqrt(fan_in), ·)
distributions), so the criterion is converged test error within
seed-to-seed noise, not bitwise equality (output parity with ported
weights is tests/test_reference_parity.py::test_bsms_output_parity...).

Usage: python benchmarks/trained_parity_bsms.py [--epochs 80] [--seeds 5]
Writes PARITY_r5.json at the repo root.
"""

import argparse
import json
import os
import random
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=80)
    parser.add_argument("--cases", type=int, default=32)
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--layers", type=int, default=15)
    parser.add_argument("--num-scales", type=int, default=3)
    parser.add_argument("--layers-per-scale", type=int, default=2)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seeds", type=int, default=5)
    parser.add_argument("--out", default=os.path.join(ROOT, "PARITY_r5.json"))
    parser.add_argument("--resume", action="store_true",
                        help="keep stacks already present in --out that were "
                             "run at the same --seeds count; stacks with "
                             "FEWER recorded seeds are EXTENDED (only the "
                             "missing seed indices train — per-seed runs are "
                             "deterministic, so extension equals a fresh run)")
    parser.add_argument("--stacks", default="",
                        help="comma-separated stack-name filter: run only "
                             "these (others are kept verbatim from --out); "
                             "lets two processes split the torch/JAX work")
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    import reference_shim as shim
    shim.install_shims()
    from models.bsms_mgn import BiStridedMeshGraphNet  # reference, via shim

    from aero_gnn_tpu.data import dataset as D
    from aero_gnn_tpu.data.batching import Loader
    from aero_gnn_tpu.data.synthetic import make_airfoil_dataset
    from aero_gnn_tpu.inference.metrics import compute_rrmse_percent
    from aero_gnn_tpu.models.bsms import BSMSConfig

    def log(m):
        print(m, file=sys.stderr, flush=True)

    # ---- shared data pipeline (identical for all stacks) ----
    samples = make_airfoil_dataset(n_cases=args.cases, seed=0)
    D.compute_features(samples, ["mach", "alpha"])
    y_raw = {id(s): s.y.copy() for s in samples}
    train, val, test = D.split_generic(samples, 0.7, 0.15, 0.15,
                                       random_seed=42)
    stats = D.compute_normalization_stats(train)
    D.normalize_samples(samples, stats)
    log(f"{len(train)} train / {len(val)} val / {len(test)} test")

    arch = dict(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=args.layers,
        hidden_dim_processor=args.hidden,
        num_hidden_layers_node_processor=2,
        num_hidden_layers_edge_processor=2,
        hidden_dim_node_encoder=args.hidden,
        num_hidden_layers_node_encoder=2,
        hidden_dim_edge_encoder=args.hidden,
        num_hidden_layers_edge_encoder=2,
        hidden_dim_decoder=args.hidden,
        num_hidden_layers_decoder=2,
        aggregation="add")
    ms = dict(num_scales=args.num_scales,
              layers_per_scale=args.layers_per_scale, stride=2)

    r = random.Random(7)
    orders = [r.sample(range(len(train)), len(train))
              for _ in range(args.epochs)]

    def mean(a):
        return float(np.mean(a))

    # ---- reference stack (torch CPU) ----
    tt = {id(s): (torch.tensor(s.x), torch.tensor(s.edge_attr),
                  torch.tensor(np.stack([s.senders, s.receivers])),
                  torch.tensor(s.y),
                  torch.zeros(s.num_nodes, dtype=torch.long),
                  torch.tensor(s.pos)) for s in samples}

    def train_ref(seed):
        torch.manual_seed(seed)
        ref = BiStridedMeshGraphNet(**arch, do_concat_trick=True, **ms)
        opt_t = torch.optim.Adam(ref.parameters(), lr=args.lr)
        for ep, order in enumerate(orders):
            tot = 0.0
            for idx in order:
                x, ea, ei, y, b, p = tt[id(train[idx])]
                opt_t.zero_grad()
                loss = torch.nn.functional.mse_loss(
                    ref(x, ea, ei, batch=b, pos=p), y)
                loss.backward()
                opt_t.step()
                tot += loss.item()
            if ep % 10 == 0 or ep == args.epochs - 1:
                log(f"ref[{seed}] epoch {ep}: MSE {tot/len(train):.5f}")
        ref.eval()

        def rrmse(split):
            out = []
            for s in split:
                x, ea, ei, _, b, p = tt[id(s)]
                with torch.no_grad():
                    pred = ref(x, ea, ei, batch=b, pos=p).numpy()
                pred = D.denormalize_predictions(pred, stats)
                out.append(compute_rrmse_percent(pred, y_raw[id(s)]))
            return out

        return rrmse(test), rrmse(val)

    # ---- this framework (JAX CPU, f32, XLA backend for exactness) ----
    def make_ours(mode, transfer):
        cfg = BSMSConfig(**arch, do_concat_trick=True, remat=False,
                         hierarchy_mode=mode, transfer=transfer, **ms)
        loader = Loader(samples, 1, shuffle=False,
                        num_scales=args.num_scales, hierarchy_mode=mode,
                        stride=2, align_edges=False)
        batches = list(loader)  # sample order == samples order
        assert len(batches) == len(samples)
        data = {id(s): batches[i] for i, s in enumerate(samples)}
        optimizer = optax.adam(args.lr)

        @jax.jit
        def step(p, o, g, h):
            def loss_fn(q):
                pred = cfg.apply(q, g, hierarchy=h)
                m = g.node_mask[:, None]
                return jnp.sum(jnp.square(pred - g.y) * m) / (
                    jnp.sum(m) * g.y.shape[1])

            loss, grads = jax.value_and_grad(loss_fn)(p)
            up, o = optimizer.update(grads, o, p)
            return optax.apply_updates(p, up), o, loss

        @jax.jit
        def fwd(p, g, h):
            return cfg.apply(p, g, hierarchy=h)

        def train_one(seed):
            params = cfg.init(jax.random.PRNGKey(seed))
            ost = optimizer.init(params)
            for ep, order in enumerate(orders):
                tot = 0.0
                for idx in order:
                    gb, aux = data[id(train[idx])]
                    params, ost, loss = step(params, ost, gb,
                                             aux["hierarchy"])
                    tot += float(loss)
                if ep % 10 == 0 or ep == args.epochs - 1:
                    log(f"ours[{mode}/{transfer}][{seed}] epoch {ep}: "
                        f"MSE {tot/len(train):.5f}")

            def rrmse(split):
                out = []
                for s in split:
                    gb, aux = data[id(s)]
                    pred = np.asarray(
                        fwd(params, gb, aux["hierarchy"]))[:s.num_nodes]
                    pred = D.denormalize_predictions(pred, stats)
                    out.append(compute_rrmse_percent(pred, y_raw[id(s)]))
                return out

            return rrmse(test), rrmse(val)

        return train_one

    stacks = [
        ("reference_bsms", train_ref),
        ("ours_bsms_parity_stride_mean", make_ours("stride", "mean")),
        ("ours_bsms_flagship_bistride_wec", make_ours("bistride",
                                                      "weighted")),
    ]
    result = {"dataset": {"cases": args.cases, "split_seed": 42,
                          "epochs": args.epochs, "lr": args.lr,
                          "seeds": args.seeds,
                          "arch": {"hidden": args.hidden,
                                   "layers": args.layers,
                                   "num_scales": args.num_scales,
                                   "layers_per_scale":
                                       args.layers_per_scale}}}
    prior = {}
    if args.resume and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        for name, row in prior.items():
            if name == "dataset":
                continue
            # A stack is reusable only if it was run at the same seed count
            # (fewer seeds -> extended below; never shrunk).
            if len(row.get("test_mean_rrmse_pct_per_seed", [])) >= args.seeds:
                result[name] = row
                log(f"resume: keeping completed stack {name}")
    only = [s for s in args.stacks.split(",") if s]
    summary = {}
    for name, fn in stacks:
        if only and name not in only:
            if name in prior:  # carry the other process's row verbatim
                result[name] = prior[name]
            continue
        if name in result:
            summary[name] = round(result[name]["test_mean_rrmse_pct"], 3)
            continue
        old = prior.get(name, {})
        old_t = list(old.get("test_mean_rrmse_pct_per_seed", []))
        old_v = list(old.get("val_mean_rrmse_pct_per_seed", []))
        if old_t and not old_v:
            # legacy row stored only the aggregate val mean (= mean of
            # per-seed means, equal case counts) — spread it evenly so the
            # merged mean is exact
            old_v = [old.get("val_mean_rrmse_pct")] * len(old_t)
        t0 = time.perf_counter()
        runs = [fn(seed) for seed in range(len(old_t), args.seeds)]
        wall = time.perf_counter() - t0
        t_means = old_t + [mean(t) for t, _ in runs]
        v_means = old_v + [mean(v) for _, v in runs]
        result[name] = {
            "test_mean_rrmse_pct": mean(t_means),
            "test_mean_rrmse_pct_per_seed": t_means,
            "val_mean_rrmse_pct": mean(v_means),
            "val_mean_rrmse_pct_per_seed": v_means,
            "per_case_test_seed0": old.get("per_case_test_seed0",
                                           runs[0][0] if runs else None),
            "train_wall_s": round(old.get("train_wall_s", 0.0) + wall, 1)}
        summary[name] = round(mean(t_means), 3)
        log(f"{name}: TEST_MEAN per seed "
            f"{['%.2f' % m for m in t_means]} (wall {wall:.0f}s)")
        with open(args.out, "w") as f:  # checkpoint after every stack
            json.dump(result, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps({"metric": "bsms_trained_test_mean_rrmse_pct",
                      "seeds": args.seeds, **summary}))


if __name__ == "__main__":
    main()
