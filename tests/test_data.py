"""Data pipeline tests: features, normalization, splits, batching, config."""

import numpy as np
import pytest

from aero_gnn_tpu.config.config import get_experiment_config
from aero_gnn_tpu.data import dataset as D
from aero_gnn_tpu.data.batching import Loader, compute_pad_spec
from aero_gnn_tpu.data.synthetic import make_airfoil_dataset, make_airfoil_sample


@pytest.fixture
def samples():
    return make_airfoil_dataset(n_cases=12, n_points=64, seed=0)


def test_feature_construction_layout(samples):
    D.compute_features(samples, ["mach", "alpha"])
    s = samples[0]
    # x = [pos(2), normals(2), mach, alpha]
    assert s.x.shape == (s.num_nodes, 6)
    np.testing.assert_allclose(s.x[:, :2], s.pos)
    np.testing.assert_allclose(s.x[:, 2:4], s.normals)
    np.testing.assert_allclose(s.x[:, 4], s.meta["mach"], rtol=1e-6)
    np.testing.assert_allclose(s.x[:, 5], s.meta["alpha"], rtol=1e-6)
    # edge_attr = [dpos(2), length]
    assert s.edge_attr.shape == (s.num_edges, 3)
    vec = s.pos[s.receivers] - s.pos[s.senders]
    np.testing.assert_allclose(s.edge_attr[:, :2], vec, rtol=1e-5)
    np.testing.assert_allclose(
        s.edge_attr[:, 2], np.linalg.norm(vec, axis=1), rtol=1e-5)


def test_normalization_train_stats_only(samples):
    train, val, test, stats = D.create_datasets(
        samples, dataset_type="airfoil_2d",
        params={"dataset": {"var_keys": ["mach", "alpha"]},
                "training": {"validation_split": 0.2, "test_split": 0.2,
                             "random_seed": 1}})
    # train features are ~standardized (computed from train only)
    x = np.concatenate([s.x for s in train])
    assert np.abs(x.mean(0)).max() < 1e-3
    assert np.abs(x.std(0, ddof=1) - 1).max() < 1e-3
    # no airfoil appears in two splits (group split)
    names = [set(s.meta["airfoil"] for s in part)
             for part in (train, val, test)]
    assert not (names[0] & names[1]) and not (names[0] & names[2]) \
        and not (names[1] & names[2])
    # denormalize round-trips
    y = test[0].y
    back = D.denormalize_predictions(y, stats)
    again = (back - stats["target_mean"]) / stats["target_std"]
    np.testing.assert_allclose(again, y, rtol=1e-4, atol=1e-5)


def test_split_generic_ratios(samples):
    train, val, test = D.split_generic(samples, 0.5, 0.25, 0.25, 7)
    assert len(train) == 6 and len(val) == 3 and len(test) == 3
    with pytest.raises(ValueError):
        D.split_generic(samples, 0.5, 0.2, 0.2)


def test_loader_fixed_shapes_and_coverage(samples):
    D.compute_features(samples, ["mach", "alpha"])
    loader = Loader(samples, batch_size=4, shuffle=True, seed=0)
    shapes = set()
    n_graphs_seen = 0
    for gb, aux in loader:
        shapes.add((gb.num_nodes_pad, gb.num_edges_pad, gb.num_graphs_pad))
        n_graphs_seen += int(np.asarray(gb.graph_mask).sum())
    assert len(shapes) == 1  # one compiled shape for the whole epoch
    assert n_graphs_seen == 12
    # epoch 2 shuffles differently but keeps the shape
    for gb, aux in loader:
        shapes.add((gb.num_nodes_pad, gb.num_edges_pad, gb.num_graphs_pad))
    assert len(shapes) == 1


def test_loader_hierarchy_collation(samples):
    D.compute_features(samples, ["mach", "alpha"])
    loader = Loader(samples[:4], batch_size=2, num_scales=3, stride=2)
    for gb, aux in loader:
        levels = aux["hierarchy"]
        assert len(levels) == 2
        lvl0 = levels[0]
        n_fine_real = int(gb.n_node)
        f2c = np.asarray(lvl0.fine_to_coarse)
        # every real fine node maps to a real coarse node
        nc = int(lvl0.n_node)
        assert (f2c[:n_fine_real] < nc).all()
        # coarse node count == sum of per-graph ceil(n/stride)
        per_graph = [s.num_nodes for s in aux["samples"]]
        expect = sum(-(-n // 2) for n in per_graph)
        assert nc == expect


def test_config_merge_semantics():
    configs = {
        "dataset": {"d1": {"a": 1, "mach": [0.3, 2]}},
        "model": {"m1": {"hidden_dim": 128, "dropout": 0.0}},
        "training": {"t1": {"batch_size": 32, "epochs": 10}},
    }
    exp = {"dataset": "d1", "model": "m1", "training": "t1",
           "hidden_dim": 32, "mach": [0.86], "epochs": 99, "mystery": 5}
    merged = get_experiment_config(exp, configs)
    assert merged["model"]["hidden_dim"] == 32
    assert merged["dataset"]["mach"] == [0.86]
    assert merged["training"]["epochs"] == 99
    assert merged["dataset"]["a"] == 1
    assert merged["extras"] == {"mystery": 5}
    assert merged["model"]["name"] == "m1"


def test_synthetic_sample_is_valid_graph():
    s = make_airfoil_sample(n_points=64)
    assert s.pos.shape[0] == s.normals.shape[0] == s.y.shape[0]
    # undirected: every directed edge has its reverse
    pairs = set(zip(s.senders.tolist(), s.receivers.tolist()))
    assert all((r, t) in pairs for (t, r) in pairs)
    # normals ~ unit length
    np.testing.assert_allclose(np.linalg.norm(s.normals, axis=1), 1.0,
                               atol=1e-5)
