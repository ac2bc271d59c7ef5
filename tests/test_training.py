"""Training / inference integration tests (tiny models, CPU)."""

import json
import os

import jax
import numpy as np
import pytest

from aero_gnn_tpu.data import dataset as D
from aero_gnn_tpu.data.batching import Loader
from aero_gnn_tpu.data.synthetic import make_airfoil_dataset
from aero_gnn_tpu.inference.engine import AeroInference
from aero_gnn_tpu.inference.aero_coeffs import calculate_aero_coefficients_2d
from aero_gnn_tpu.models.registry import build_model
from aero_gnn_tpu.training.loop import fit
from aero_gnn_tpu.training.schedulers import EarlyStopping, ReduceLROnPlateau


@pytest.fixture(scope="module")
def tiny_data():
    samples = make_airfoil_dataset(n_cases=16, n_points=64, seed=3)
    return D.create_datasets(
        samples, dataset_type="airfoil_2d",
        params={"dataset": {"var_keys": ["mach", "alpha"]},
                "training": {"validation_split": 0.25, "test_split": 0.25,
                             "random_seed": 1}})


TINY_MODEL = {"name": "meshgraphnet", "hidden_dim": 16, "processor_size": 2,
              "do_concat_trick": True, "aggregation": "add"}


def test_fit_decreases_loss_and_early_stops(tiny_data, tmp_path):
    train, val, test, stats = tiny_data
    dims = {"input_node_dim": 6, "input_edge_dim": 3, "output_node_dim": 4}
    cfg = build_model(TINY_MODEL, dims)
    params = cfg.init(jax.random.PRNGKey(0))
    result = fit(
        model_cfg=cfg, params=params,
        train_loader=Loader(train, 2, shuffle=True),
        val_loader=Loader(val, 2),
        training_config={"epochs": 15, "learning_rate": 1e-3,
                         "early_stopping": True, "patience": 50},
        log_every=0, log_fn=lambda s: None)
    assert result.epochs_run == 15
    assert result.train_losses[-1] < result.train_losses[0]


def test_checkpoint_resume(tiny_data, tmp_path):
    train, val, _, _ = tiny_data
    dims = {"input_node_dim": 6, "input_edge_dim": 3, "output_node_dim": 4}
    cfg = build_model(TINY_MODEL, dims)
    params = cfg.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ckpt")
    common = dict(model_cfg=cfg,
                  train_loader=Loader(train, 2, shuffle=True),
                  val_loader=Loader(val, 2), log_every=0,
                  log_fn=lambda s: None, checkpoint_dir=ckpt)
    r1 = fit(params=params,
             training_config={"epochs": 4, "learning_rate": 1e-3,
                              "checkpoint_every": 2,
                              "early_stopping": False}, **common)
    assert os.path.isdir(ckpt) and len(os.listdir(ckpt)) == 2
    # resume continues from epoch 4
    r2 = fit(params=params,
             training_config={"epochs": 6, "learning_rate": 1e-3,
                              "checkpoint_every": 2, "resume": True,
                              "early_stopping": False}, **common)
    assert r2.epochs_run == 6  # 4 restored + 2 new
    assert r2.train_losses[:4] == r1.train_losses


def test_plateau_scheduler_torch_semantics():
    sch = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2, min_lr=0.01)
    # improving -> lr unchanged
    for v in (10.0, 9.0, 8.0):
        assert sch.step(v) == 1.0
    # stagnating: bad epochs 1, 2, 3 -> cut on the 3rd (counter > patience)
    assert sch.step(8.0) == 1.0
    assert sch.step(8.0) == 1.0
    assert sch.step(8.0) == 0.5
    # counter resets after the cut
    assert sch.step(8.0) == 0.5


def test_early_stopping_counter():
    es = EarlyStopping(patience=2)
    assert not es.step(5.0)
    assert not es.step(6.0)
    assert not es.step(6.0)
    assert es.step(6.0)  # third non-improvement > patience


def test_inference_engine_errors_txt(tiny_data, tmp_path):
    train, val, test, stats = tiny_data
    dims = {"input_node_dim": 6, "input_edge_dim": 3, "output_node_dim": 4}
    cfg = build_model(TINY_MODEL, dims)
    params = cfg.init(jax.random.PRNGKey(1))
    exp_params = {"dataset": {"name": "synthetic_airfoil",
                              "output_features": ["P", "tau_x", "tau_y", "T"]}}
    engine = AeroInference(cfg, params, stats, exp_params)
    out_dir = engine.run_inference(test, str(tmp_path), log_fn=lambda s: None)
    errors_path = os.path.join(out_dir, "errors.txt")
    assert os.path.exists(errors_path)
    lines = open(errors_path).read().splitlines()
    assert lines[0].startswith("TEST_MEAN | rrmse:")
    assert "nmae:" in lines[0] and "mse:" in lines[0]
    case_lines = [l for l in lines[2:] if l.startswith("case_")]
    assert len(case_lines) == len(test)
    assert "CA:" in case_lines[0] and "Cm:" in case_lines[0]


def test_inference_batched_matches_single(tiny_data, tmp_path):
    """inference_batch_size=2 packs cases into one device pass; per-case
    RRMSE lines must match the batch_size=1 path exactly."""
    train, val, test, stats = tiny_data
    dims = {"input_node_dim": 6, "input_edge_dim": 3, "output_node_dim": 4}
    cfg = build_model(TINY_MODEL, dims)
    params = cfg.init(jax.random.PRNGKey(1))
    base_exp = {"dataset": {"name": "synthetic_airfoil",
                            "output_features": ["P", "tau_x", "tau_y", "T"]},
                "make_plots": False}
    logs = {}
    for bs in (1, 2):
        exp = dict(base_exp, inference_batch_size=bs)
        engine = AeroInference(cfg, params, stats, exp)
        lines = []
        engine.run_inference(test, str(tmp_path / f"bs{bs}"),
                             log_fn=lines.append)
        logs[bs] = [l for l in lines if l.startswith("Error in case")]
    assert logs[1] and logs[1] == logs[2]


def test_aero_coefficients_uniform_pressure_closed_loop():
    """Uniform pressure on a closed contour integrates to ~zero net force
    (analytic sanity for the coefficient math)."""
    n = 400
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pos = np.stack([np.cos(th), np.sin(th)], 1)
    normals = pos.copy()  # outward unit normals of the unit circle
    idx = np.arange(n)
    senders = np.concatenate([idx, (idx + 1) % n])
    receivers = np.concatenate([(idx + 1) % n, idx])
    coeffs = calculate_aero_coefficients_2d(
        pos=pos, normals=normals, senders=senders, receivers=receivers,
        pressure=np.full(n, 101325.0), shear_stress=np.zeros((n, 2)),
        reference_area=1e-2, dynamic_pressure=1e5)
    assert abs(coeffs["CA"]) < 1e-6
    assert abs(coeffs["CN"]) < 1e-6
    assert abs(coeffs["Cm"]) < 1e-6


def test_bsms_end_to_end_training(tiny_data):
    train, val, _, _ = tiny_data
    dims = {"input_node_dim": 6, "input_edge_dim": 3, "output_node_dim": 4}
    cfg = build_model({"name": "bsms_mgn", "hidden_dim": 16,
                       "processor_size": 4, "num_scales": 2,
                       "layers_per_scale": 1, "do_concat_trick": True}, dims)
    params = cfg.init(jax.random.PRNGKey(0))
    result = fit(
        model_cfg=cfg, params=params,
        train_loader=Loader(train, 2, shuffle=True, num_scales=2),
        val_loader=Loader(val, 2, num_scales=2),
        training_config={"epochs": 5, "learning_rate": 1e-3,
                         "early_stopping": False},
        needs_hierarchy=True, log_every=0, log_fn=lambda s: None)
    assert result.train_losses[-1] < result.train_losses[0]


def test_batch_rollout_matches_individual(tiny_data):
    from aero_gnn_tpu.inference.rollout import make_batch_rollout, stack_graphs
    train, val, test, stats = tiny_data
    dims = {"input_node_dim": 6, "input_edge_dim": 3, "output_node_dim": 4}
    cfg = build_model(TINY_MODEL, dims)
    params = cfg.init(jax.random.PRNGKey(9))
    loader = Loader(test, batch_size=1)
    graphs = [gb for gb, _ in loader]
    stacked = stack_graphs(graphs)
    rollout = make_batch_rollout(cfg)
    preds = np.asarray(rollout(params, stacked))
    assert preds.shape[0] == len(graphs)
    for k, gb in enumerate(graphs):
        single = np.asarray(cfg.apply(params, gb))
        np.testing.assert_allclose(preds[k], single, rtol=1e-5, atol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from aero_gnn_tpu.training import checkpoint as C
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    opt = {"mu": jnp.full((4, 4), 0.5)}
    m = C.make_orbax_manager(str(tmp_path / "ckpt"), async_save=False)
    C.save_orbax(m, params, opt, 3, {"train_losses": [1.0, 0.5]})
    m.wait_until_finished()
    p2, o2, step, hist = C.restore_orbax(m, params, opt)
    np.testing.assert_allclose(np.asarray(p2["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(o2["mu"]), 0.5)
    assert step == 3 and hist["train_losses"] == [1.0, 0.5]


def test_ahmed_body_inference_with_coefficients(tmp_path):
    """Full ahmed_body path: VTP files + info metadata -> dataset ->
    inference with 3D CA/CN/CY coefficients in errors.txt."""
    import pathlib
    import sys as _sys
    _sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_vtk import make_tri_sphereish_mesh
    from aero_gnn_tpu.data.vtk_writer import write_vtp
    from aero_gnn_tpu.data import mesh_io

    data_dir = tmp_path / "ahmed"
    for split in ("train", "validation", "test"):
        (data_dir / split).mkdir(parents=True)
        (data_dir / f"{split}_info").mkdir()
        n = 2 if split == "train" else 1
        for k in range(n):
            case = f"case_{split}_{k}"
            write_vtp(str(data_dir / split / f"{case}.vtp"),
                      make_tri_sphereish_mesh())
            (data_dir / f"{split}_info" / f"{case}_info.txt").write_text(
                "Length : 1044.0\nWidth : 389.0\nHeight : 288.0\n"
                "Velocity : 40.0\n")

    samples = mesh_io.load_ahmed_body(str(data_dir), {"training": {}})
    assert len(samples) == 4
    assert samples[0].meta["Velocity"] == 40.0

    exp_params = {"dataset": {"name": "ahmed_body",
                              "data_dir": str(data_dir),
                              "var_keys": ["Velocity"],
                              "output_features": ["P", "tau_x", "tau_y",
                                                  "tau_z"]}}
    train, val, test, stats = D.create_datasets(
        samples, dataset_type="ahmed_body", params=exp_params)
    assert len(train) == 2 and len(test) == 1

    dims = {"input_node_dim": samples[0].x.shape[1],
            "input_edge_dim": 4, "output_node_dim": 4}
    cfg = build_model({"name": "meshgraphnet", "hidden_dim": 16,
                       "processor_size": 1, "do_concat_trick": True,
                       "aggregation": "add"}, dims)
    params = cfg.init(jax.random.PRNGKey(0))
    engine = AeroInference(cfg, params, stats, exp_params)
    out_dir = engine.run_inference(test, str(tmp_path / "out"),
                                   log_fn=lambda s: None)
    errors = open(os.path.join(out_dir, "errors.txt")).read()
    assert "CA:" in errors and "CY:" in errors  # 3D coefficient path ran
    # VTU prediction export for the 3D case
    vtu_dir = os.path.join(out_dir, "vtu_exports")
    assert any(f.endswith(".vtu") for f in os.listdir(vtu_dir))
