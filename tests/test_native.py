"""Native graphcore (C++) vs numpy fallback equivalence."""

import numpy as np
import pytest

from aero_gnn_tpu.graph import native
from aero_gnn_tpu.graph.padded import (
    ALIGN_EDGE_TILE,
    ALIGN_NODE_BLOCK,
    build_graph_batch,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_native_sort_matches_lexsort(rng):
    n, e = 500, 4000
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    perm_native = native.sort_edges_by_receiver(s, r, n)
    perm_np = np.lexsort((s, r))
    np.testing.assert_array_equal(perm_native, perm_np)


def test_native_argsort_matches_numpy(rng):
    keys = rng.integers(0, 77, 1000).astype(np.int32)
    np.testing.assert_array_equal(
        native.argsort_i32(keys, 77), np.argsort(keys, kind="stable"))


def test_native_csr_offsets(rng):
    ids = np.sort(rng.integers(0, 20, 300)).astype(np.int32)
    offs = native.csr_offsets(ids, 20)
    expect = np.searchsorted(ids, np.arange(21))
    np.testing.assert_array_equal(offs, expect)


def test_native_alignment_equals_numpy_path(rng, monkeypatch):
    """build_graph_batch with the native aligner must produce the same
    layout as the pure-numpy fallback."""
    n, e = 700, 5200
    g = dict(senders=rng.integers(0, n, e), receivers=rng.integers(0, n, e),
             x=rng.standard_normal((n, 4)).astype(np.float32),
             edge_attr=rng.standard_normal((e, 3)).astype(np.float32),
             pos=rng.standard_normal((n, 2)).astype(np.float32))
    gb_native = build_graph_batch(**g, align_edges=True)

    monkeypatch.setattr(native, "available", lambda: False)
    gb_numpy = build_graph_batch(**g, align_edges=True)

    for field in ("senders", "receivers", "edge_mask", "tile_block",
                  "tile_first"):
        np.testing.assert_array_equal(
            np.asarray(getattr(gb_native, field)),
            np.asarray(getattr(gb_numpy, field)), err_msg=field)
    np.testing.assert_allclose(np.asarray(gb_native.edge_attr),
                               np.asarray(gb_numpy.edge_attr))
