"""CLI / experiment driver.

Counterpart of /root/reference/train.py:418-443 and inference.py:475-526:

    python -m aero_gnn_tpu.cli train --exp <name> [--config path.yaml]
    python -m aero_gnn_tpu.cli infer [--training_dir <dir>]

Precision handling mirrors train.py:19-40 ("single" | "bf16" | "fp16" |
"double"), mapped onto JAX: bf16 sets compute dtype for matmuls while
keeping fp32 params (the TPU-native mixed-precision recipe); fp16 maps to
bf16 with a printed rationale (no fp16 compute units on TPU); double
enables x64 (CPU debugging only — the MXU has no fp64).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "config",
                              "default.yaml")


def load_samples(exp_params: Dict[str, Any]):
    """Dataset dispatch: synthetic generator or VTU/VTP ingestion."""
    ds = exp_params["dataset"]
    name = ds.get("name")
    if ds.get("synthetic") or name == "synthetic_airfoil":
        from aero_gnn_tpu.data.synthetic import make_airfoil_dataset
        return make_airfoil_dataset(
            n_cases=int(ds.get("n_cases", 24)),
            n_points=int(ds.get("n_points", 256)),
            seed=int(exp_params.get("training", {}).get("random_seed", 42)))
    from aero_gnn_tpu.data import mesh_io
    return mesh_io.load_dataset(ds, exp_params)


def setup_precision(exp_params: Dict[str, Any]) -> None:
    import jax
    precision = str(exp_params.get("training", {})
                    .get("precision", "single")).lower()
    if precision in ("double", "float64"):
        jax.config.update("jax_enable_x64", True)
        print("Using double precision (float64; CPU only)")
    elif precision in ("float", "float32", "single"):
        print("Using single precision (float32)")
    elif precision in ("bf16", "bfloat16"):
        jax.config.update("jax_default_matmul_precision", "bfloat16")
        print("Using bfloat16 matmul precision")
    elif precision in ("fp16", "float16", "half"):
        # Reference train.py:19-40 offers fp16; TPUs have no fp16 compute
        # units (the MXU natively multiplies in bf16), and fp16's 5-bit
        # exponent needs loss scaling for stability. bf16 is the TPU-native
        # half-precision with the same memory/throughput benefit and fp32's
        # dynamic range, so fp16 requests map onto it rather than erroring.
        jax.config.update("jax_default_matmul_precision", "bfloat16")
        print("Requested fp16: TPUs have no fp16 compute path — using "
              "bfloat16 (same speed/memory class, fp32-range, no loss "
              "scaling needed)")
    else:
        raise ValueError(f"Unknown precision type: {precision}. Supported: "
                         "'float32', 'float64', 'bfloat16', 'float16' "
                         "(mapped to bfloat16 on TPU), 'single'")


def infer_dims(samples) -> Dict[str, int]:
    return {
        "input_node_dim": samples[0].x.shape[1],
        "input_edge_dim": samples[0].edge_attr.shape[1],
        "output_node_dim": samples[0].y.shape[1],
    }


def _bsms_opts(model_conf: Dict[str, Any]) -> Dict[str, Any]:
    return dict(num_scales=int(model_conf.get("num_scales", 3)),
                hierarchy_mode=model_conf.get("hierarchy_mode", "stride"),
                stride=int(model_conf.get("stride", 2)))


def train_main(args: argparse.Namespace) -> str:
    import jax
    from aero_gnn_tpu.config.config import resolve_experiment
    from aero_gnn_tpu.data.batching import Loader
    from aero_gnn_tpu.data.dataset import create_datasets
    from aero_gnn_tpu.inference.engine import AeroInference
    from aero_gnn_tpu.models.registry import build_model, canonical_name
    from aero_gnn_tpu.training import artifacts
    from aero_gnn_tpu.training.loop import fit

    exp_params = resolve_experiment(args.config, args.experiment)
    setup_precision(exp_params)

    samples = load_samples(exp_params)
    train_set, val_set, test_set, norm_stats = create_datasets(
        samples, dataset_type=exp_params["dataset"]["name"],
        params=exp_params)
    print(f"Split: {len(train_set)} train / {len(val_set)} val / "
          f"{len(test_set)} test")

    dims = infer_dims(train_set)
    model_conf = exp_params["model"]
    model_cfg = build_model(model_conf, dims)
    kind = canonical_name(model_conf["name"])
    needs_h = kind == "bsms_mgn"

    training_conf = exp_params["training"]
    bs = int(training_conf.get("batch_size", 1))
    seed = int(training_conf.get("random_seed", 42))
    loader_kw = _bsms_opts(model_conf) if needs_h else {}
    train_loader = Loader(train_set, bs, shuffle=True, seed=seed, **loader_kw)
    val_loader = Loader(val_set, max(1, min(bs, len(val_set))), **loader_kw)

    params = model_cfg.init(jax.random.PRNGKey(seed))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(params))
    print(f"Model: {kind}  total parameters: {n_params:,}")

    save_dir = args.output_dir or artifacts.make_run_dir(
        model_conf["name"], exp_params["dataset"]["name"])
    os.makedirs(save_dir, exist_ok=True)
    ckpt_dir = os.path.join(save_dir, "checkpoints")

    result = fit(model_cfg=model_cfg, params=params,
                 train_loader=train_loader, val_loader=val_loader,
                 training_config=training_conf, needs_hierarchy=needs_h,
                 seed=seed, checkpoint_dir=ckpt_dir)

    artifacts.save_run_artifacts(
        save_dir, params=result.params, norm_stats=norm_stats,
        exp_params=exp_params,
        train_losses=result.train_losses, val_losses=result.val_losses,
        summary_extra={"Total Parameters": f"{n_params:,}",
                       "Wall time (s)": f"{result.wall_time_s:.1f}"})
    print(f"All outputs saved to: {save_dir}")

    # run inference on the test set, like train.py:398-415
    if test_set:
        try:
            engine = AeroInference(
                model_cfg, result.params, norm_stats, exp_params,
                needs_hierarchy=needs_h, **(
                    _bsms_opts(model_conf) if needs_h else {}))
            inference_dir = engine.run_inference(test_set, save_dir)
            print(f"Inference results saved to {inference_dir}")
        except Exception as e:  # noqa: BLE001 — keep training artifacts
            print(f"Error during inference: {e}")
            print("Continuing without inference...")
    return save_dir


def infer_main(args: argparse.Namespace) -> str:
    import jax
    from aero_gnn_tpu.data.batching import Loader  # noqa: F401
    from aero_gnn_tpu.data.dataset import create_datasets
    from aero_gnn_tpu.inference.engine import AeroInference
    from aero_gnn_tpu.models.registry import build_model, canonical_name
    from aero_gnn_tpu.training import artifacts, checkpoint as C

    training_dir = args.training_dir
    if training_dir is None:
        print("No training directory specified, looking for latest run...")
        training_dir = artifacts.find_latest_training_run()
        print(f"Found latest training run: {training_dir}")
    for fname in (artifacts.WEIGHTS_FILE, artifacts.NORM_STATS_FILE,
                  artifacts.PARAMS_FILE):
        path = os.path.join(training_dir, fname)
        if not os.path.exists(path):
            raise FileNotFoundError(f"Required file not found: {path}")

    with open(os.path.join(training_dir, artifacts.PARAMS_FILE)) as f:
        exp_params = json.load(f)
    norm_stats = C.load_norm_stats(
        os.path.join(training_dir, artifacts.NORM_STATS_FILE))
    setup_precision(exp_params)

    samples = load_samples(exp_params)
    _, _, test_set, _ = create_datasets(
        samples, dataset_type=exp_params["dataset"]["name"],
        params=exp_params)
    print(f"Test set contains {len(test_set)} samples")

    dims = infer_dims(test_set)
    model_conf = exp_params["model"]
    model_cfg = build_model(model_conf, dims)
    params = C.load_params(
        os.path.join(training_dir, artifacts.WEIGHTS_FILE))
    kind = canonical_name(model_conf["name"])
    needs_h = kind == "bsms_mgn"

    engine = AeroInference(model_cfg, params, norm_stats, exp_params,
                           needs_hierarchy=needs_h,
                           **(_bsms_opts(model_conf) if needs_h else {}))
    return engine.run_inference(test_set, training_dir)


def main(argv: Optional[List[str]] = None) -> None:
    # Multi-chip halo overlap needs async all-to-all, which the TPU
    # compiler disables by default; the multi-chip step factories attach
    # the options per-jit (parallel.xla_flags.async_jit_options) — an
    # XLA_FLAGS env route was removed because clients whose XLA build
    # lacks the TPU debug options FATAL at flag parse (CPU runs).
    parser = argparse.ArgumentParser(
        prog="aero_gnn_tpu",
        description="TPU-native mesh-GNN framework CLI")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a model from an experiment")
    p_train.add_argument("--exp", "--experiment", dest="experiment",
                         type=str, required=True,
                         help="Experiment name defined in the config YAML")
    p_train.add_argument("--config", type=str, default=DEFAULT_CONFIG)
    p_train.add_argument("--output_dir", type=str, default=None)

    p_infer = sub.add_parser("infer", help="run inference from a training dir")
    p_infer.add_argument("--training_dir", type=str, default=None)
    p_infer.add_argument("--config", type=str, default=DEFAULT_CONFIG)

    args = parser.parse_args(argv)
    if args.command == "train":
        train_main(args)
    elif args.command == "infer":
        infer_main(args)


if __name__ == "__main__":
    main()
