"""Trained-accuracy parity artifact: reference (torch CPU) vs this framework.

Trains BOTH stacks end-to-end on the SAME synthetic airfoil dataset with the
same split seed, normalization semantics (train-split stats, ddof=1, 1e-8
clamp), model size, optimizer (Adam 1e-3), batch size (1) and per-epoch
shuffling order, then reports the reference's errors.txt TEST_MEAN metric
(mean per-case RRMSE% on denormalized predictions —
/root/reference/inference.py:113-126,424-470) side by side.

The two stacks start from independent inits (torch vs JAX RNGs; the init
DISTRIBUTION is identical — U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both),
so the criterion is converged test error within seed-to-seed noise, NOT
bitwise equality (activation/output parity with ported weights is covered
by tests/test_reference_parity.py). The test split is small (~4 cases), so
use --seeds 3 for a meaningful comparison.

Usage: python benchmarks/trained_parity.py [--epochs 40] [--seeds 3]
Writes PARITY_r2.json at the repo root.
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
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--cases", type=int, default=24)
    parser.add_argument("--hidden", type=int, default=64)
    parser.add_argument("--layers", type=int, default=5)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seeds", type=int, default=1,
                        help="independent init seeds per stack (the test "
                        "split is ~4 cases, single-seed TEST_MEAN is noisy)")
    parser.add_argument("--out", default=os.path.join(ROOT, "PARITY_r2.json"))
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
    from models.mgn import MeshGraphNet as RefMGN  # reference, via shim

    from aero_gnn_tpu.data import dataset as D
    from aero_gnn_tpu.data.synthetic import make_airfoil_dataset
    from aero_gnn_tpu.graph import padded
    from aero_gnn_tpu.inference.metrics import compute_rrmse_percent
    from aero_gnn_tpu.models.mgn import MGNConfig

    def log(m):
        print(m, file=sys.stderr, flush=True)

    # ---- shared data pipeline (identical for both stacks) ----
    samples = make_airfoil_dataset(n_cases=args.cases, seed=0)
    D.compute_features(samples, ["mach", "alpha"])
    y_raw = {id(s): s.y.copy() for s in samples}
    train, val, test = D.split_generic(samples, 0.7, 0.15, 0.15,
                                       random_seed=42)
    stats = D.compute_normalization_stats(train)  # train-split-only stats
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

    # same per-epoch shuffling order for every run of both stacks
    r = random.Random(7)
    orders = [r.sample(range(len(train)), len(train))
              for _ in range(args.epochs)]

    def mean(a):
        return float(np.mean(a))

    # ---- reference stack (torch CPU) ----
    tt = {id(s): (torch.tensor(s.x), torch.tensor(s.edge_attr),
                  torch.tensor(np.stack([s.senders, s.receivers])),
                  torch.tensor(s.y)) for s in samples}

    def train_ref(seed):
        torch.manual_seed(seed)
        ref = RefMGN(**arch, do_concat_trick=True)
        opt_t = torch.optim.Adam(ref.parameters(), lr=args.lr)
        for ep, order in enumerate(orders):
            tot = 0.0
            for idx in order:
                x, ea, ei, y = tt[id(train[idx])]
                opt_t.zero_grad()
                loss = torch.nn.functional.mse_loss(ref(x, ea, ei), y)
                loss.backward()
                opt_t.step()
                tot += loss.item()
            if ep % 10 == 0 or ep == args.epochs - 1:
                log(f"ref[{seed}] epoch {ep}: MSE {tot/len(train):.5f}")
        ref.eval()

        def rrmse(split):
            out = []
            for s in split:
                x, ea, ei, _ = tt[id(s)]
                with torch.no_grad():
                    pred = ref(x, ea, ei).numpy()
                pred = D.denormalize_predictions(pred, stats)
                out.append(compute_rrmse_percent(pred, y_raw[id(s)]))
            return out

        return rrmse(test), rrmse(val)

    # ---- this framework (JAX CPU, f32, XLA backend for exactness) ----
    cfg = MGNConfig(**arch, do_concat_trick=True, remat=False)
    optimizer = optax.adam(args.lr)  # plain Adam: torch.optim.Adam parity
    gbs = {id(s): padded.build_graph_batch(
        senders=s.senders, receivers=s.receivers, x=s.x,
        edge_attr=s.edge_attr, pos=s.pos, y=s.y) for s in samples}

    @jax.jit
    def step(p, o, g):
        def loss_fn(q):
            pred = cfg.apply(q, g)
            m = g.node_mask[:, None]
            return jnp.sum(jnp.square(pred - g.y) * m) / (
                jnp.sum(m) * g.y.shape[1])

        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, up), o, loss

    fwd = jax.jit(cfg.apply)

    def train_ours(seed):
        params = cfg.init(jax.random.PRNGKey(seed))
        ost = optimizer.init(params)
        for ep, order in enumerate(orders):
            tot = 0.0
            for idx in order:
                params, ost, loss = step(params, ost, gbs[id(train[idx])])
                tot += float(loss)
            if ep % 10 == 0 or ep == args.epochs - 1:
                log(f"ours[{seed}] epoch {ep}: MSE {tot/len(train):.5f}")

        def rrmse(split):
            out = []
            for s in split:
                pred = np.asarray(fwd(params, gbs[id(s)]))[:s.num_nodes]
                pred = D.denormalize_predictions(pred, stats)
                out.append(compute_rrmse_percent(pred, y_raw[id(s)]))
            return out

        return rrmse(test), rrmse(val)

    t0 = time.perf_counter()
    ref_runs = [train_ref(seed) for seed in range(args.seeds)]
    t_ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    our_runs = [train_ours(seed) for seed in range(args.seeds)]
    t_ours = time.perf_counter() - t0

    ref_means = [mean(t) for t, _ in ref_runs]
    our_means = [mean(t) for t, _ in our_runs]
    # reference errors.txt format (/root/reference/inference.py:437-470)
    for name, runs in [("reference", ref_runs), ("aero_gnn_tpu", our_runs)]:
        log(f"--- {name} (seed 0) ---")
        for i, rr in enumerate(runs[0][0]):
            log(f"Error in case{i:03d}: {rr:7.4f}%")
    log(f"reference   TEST_MEAN per seed: "
        f"{['%.3f' % m for m in ref_means]}")
    log(f"aero_gnn_tpu TEST_MEAN per seed: "
        f"{['%.3f' % m for m in our_means]}")

    result = {
        "dataset": {"cases": args.cases, "split_seed": 42,
                    "epochs": args.epochs, "lr": args.lr,
                    "seeds": args.seeds,
                    "arch": {"hidden": args.hidden, "layers": args.layers}},
        "reference": {
            "test_mean_rrmse_pct": mean(ref_means),
            "test_mean_rrmse_pct_per_seed": ref_means,
            "val_mean_rrmse_pct": mean([mean(v) for _, v in ref_runs]),
            "per_case_test_seed0": ref_runs[0][0],
            "train_wall_s": round(t_ref, 1)},
        "aero_gnn_tpu": {
            "test_mean_rrmse_pct": mean(our_means),
            "test_mean_rrmse_pct_per_seed": our_means,
            "val_mean_rrmse_pct": mean([mean(v) for _, v in our_runs]),
            "per_case_test_seed0": our_runs[0][0],
            "train_wall_s": round(t_ours, 1)},
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps({"metric": "trained_test_mean_rrmse_pct",
                      "reference": round(mean(ref_means), 4),
                      "aero_gnn_tpu": round(mean(our_means), 4),
                      "seeds": args.seeds}))


if __name__ == "__main__":
    main()
