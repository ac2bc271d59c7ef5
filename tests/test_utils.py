"""Smoke tests for utils: diagnostics, profiling, logging."""

import json
import os

import numpy as np
import pytest

from aero_gnn_tpu.utils import diagnostics as DG
from aero_gnn_tpu.utils.logging import MetricLogger
from aero_gnn_tpu.utils.profiling import Throughput, device_memory_stats


def _ring(n=20):
    i = np.arange(n)
    return (np.concatenate([i, (i + 1) % n]),
            np.concatenate([(i + 1) % n, i]))


def test_graph_statistics():
    s, r = _ring(20)
    stats = DG.graph_statistics(s, r, 20)
    assert stats["num_nodes"] == 20 and stats["num_edges"] == 40
    assert stats["undirected"] is True
    assert stats["avg_degree"] == 2.0
    assert stats["max_degree"] == 2 and stats["min_degree"] == 2


def test_plot_graph_sparsity_writes_files(tmp_path):
    s, r = _ring(30)
    base = str(tmp_path / "graph")
    DG.plot_graph_sparsity(s, r, 30, save_path=base)
    assert os.path.exists(base + "_adjacency.png")
    assert os.path.exists(base + "_degree_dist.png")
    assert os.path.exists(base + "_statistics.txt")
    stats_txt = open(base + "_statistics.txt").read()
    assert "num_nodes: 30" in stats_txt


def test_throughput_meter():
    m = Throughput(edges_per_step=1000, nodes_per_step=100)
    import time
    for _ in range(5):
        m.tick()
        time.sleep(0.001)
    s = m.summary()
    assert s["steps_per_s"] > 0
    assert s["edges_per_s"] == pytest.approx(1000 * s["steps_per_s"], rel=1e-6)
    assert m.total_steps == 5


def test_device_memory_stats_no_crash():
    # may be None on CPU — just must not raise
    device_memory_stats()


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricLogger(path) as log:
        log.log(0, loss=1.5, lr=1e-3)
        log.log(1, loss=0.5, lr=1e-3, note="ok")
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == 1.5
    assert lines[1]["note"] == "ok"
    assert "time" in lines[0]
