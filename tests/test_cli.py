"""CLI end-to-end tests (tiny synthetic experiments)."""

import json
import os

import numpy as np
import pytest
import yaml

from aero_gnn_tpu import cli


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    cfg = yaml.safe_load(open(cli.DEFAULT_CONFIG))
    cfg["experiments"]["tiny"] = {
        "dataset": "synthetic_airfoil", "model": "meshgraphnet",
        "training": "default", "n_cases": 16, "n_points": 48,
        "hidden_dim": 16, "processor_size": 1, "batch_size": 4,
        "epochs": 3, "early_stopping": False, "checkpoint_every": 2,
        "validation_split": 0.25, "test_split": 0.25,
    }
    path = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    yaml.safe_dump(cfg, open(path, "w"))
    return str(path)


def test_cli_train_then_infer_roundtrip(tiny_config, tmp_path):
    out_dir = str(tmp_path / "run")
    cli.main(["train", "--exp", "tiny", "--config", tiny_config,
              "--output_dir", out_dir])
    # artifact contract
    for f in ("model_weights.pkl", "normalization_stats.npz",
              "experiment_params.json", "training_losses.json",
              "training_summary.txt", "metrics.jsonl"):
        assert os.path.exists(os.path.join(out_dir, f)), f
    losses = json.load(open(os.path.join(out_dir, "training_losses.json")))
    assert losses["total_epochs"] == 3
    assert len(losses["train_losses"]) == 3
    # checkpoints written every 2 epochs
    assert os.path.isdir(os.path.join(out_dir, "checkpoints"))
    # inference artifacts from the post-train run
    inf_dirs = [d for d in os.listdir(out_dir)
                if d.startswith("inference_results_")]
    assert inf_dirs
    errors = open(os.path.join(out_dir, inf_dirs[0], "errors.txt")).read()
    assert errors.startswith("TEST_MEAN | rrmse:")

    # infer CLI reproduces from saved artifacts
    cli.main(["infer", "--training_dir", out_dir])
    inf_dirs2 = sorted(d for d in os.listdir(out_dir)
                       if d.startswith("inference_results_"))
    errors2 = open(os.path.join(out_dir, inf_dirs2[-1],
                                "errors.txt")).read()
    assert errors2.splitlines()[0] == errors.splitlines()[0]


def test_cli_unknown_experiment(tiny_config):
    with pytest.raises(ValueError, match="not found in configuration"):
        cli.main(["train", "--exp", "nope", "--config", tiny_config])


def test_setup_precision_matrix(capsys):
    # reference train.py:19-40 precision matrix fully accounted for:
    # fp32/bf16 native, fp16 mapped to bf16 (no fp16 compute on TPU),
    # fp64 via x64 (covered implicitly — not toggled here to avoid
    # leaking x64 into other tests), unknown rejected.
    cli.setup_precision({"training": {"precision": "single"}})
    assert "single precision" in capsys.readouterr().out
    cli.setup_precision({"training": {"precision": "bf16"}})
    assert "bfloat16" in capsys.readouterr().out
    cli.setup_precision({"training": {"precision": "fp16"}})
    out = capsys.readouterr().out
    assert "no fp16 compute path" in out and "bfloat16" in out
    with pytest.raises(ValueError, match="Unknown precision"):
        cli.setup_precision({"training": {"precision": "int8"}})
    import jax
    jax.config.update("jax_default_matmul_precision", None)
