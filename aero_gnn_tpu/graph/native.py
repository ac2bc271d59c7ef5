"""ctypes bindings for the native graph-preprocessing core (C++).

Loads ``native/build/libgraphcore.so`` (building it with g++ on first use
if the toolchain is available) and exposes drop-in replacements for the
host-side hot paths; every entry point has a numpy fallback so the
framework runs without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libgraphcore.so")
_BUILD_SH = os.path.join(_REPO_ROOT, "native", "build.sh")

_lib = None
_tried = False


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(_BUILD_SH):
        try:
            subprocess.run(["sh", _BUILD_SH], check=True,
                           capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gc_sort_edges_by_receiver.restype = None
        lib.gc_argsort_i32.restype = None
        lib.gc_csr_offsets.restype = None
        lib.gc_align_blocks.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return load() is not None


def sort_edges_by_receiver(senders: np.ndarray, receivers: np.ndarray,
                           num_nodes: int) -> np.ndarray:
    """Counting-sort permutation (receiver-major, stable); numpy fallback."""
    lib = load()
    s = np.ascontiguousarray(senders, dtype=np.int32)
    r = np.ascontiguousarray(receivers, dtype=np.int32)
    if lib is None:
        return np.lexsort((s, r)).astype(np.int32)
    perm = np.empty(len(s), dtype=np.int32)
    lib.gc_sort_edges_by_receiver(
        _i32p(s), _i32p(r), ctypes.c_int64(len(s)),
        ctypes.c_int32(int(num_nodes)), _i32p(perm))
    return perm


def argsort_i32(keys: np.ndarray, num_keys: int) -> np.ndarray:
    """Stable counting argsort for bounded int32 keys; numpy fallback."""
    lib = load()
    k = np.ascontiguousarray(keys, dtype=np.int32)
    if lib is None:
        return np.argsort(k, kind="stable").astype(np.int32)
    perm = np.empty(len(k), dtype=np.int32)
    lib.gc_argsort_i32(_i32p(k), ctypes.c_int64(len(k)),
                       ctypes.c_int32(int(num_keys)), _i32p(perm))
    return perm


def csr_offsets(sorted_ids: np.ndarray, num_segments: int) -> np.ndarray:
    lib = load()
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int32)
    if lib is None:
        return np.searchsorted(
            ids, np.arange(num_segments + 1)).astype(np.int64)
    out = np.empty(num_segments + 1, dtype=np.int64)
    lib.gc_csr_offsets(_i32p(ids), ctypes.c_int64(len(ids)),
                       ctypes.c_int32(int(num_segments)), _i64p(out))
    return out


def align_blocks(receivers_sorted: np.ndarray, num_nodes_pad: int,
                 node_block: int, edge_tile: int
                 ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Block-aligned layout (row index per output slot; -1 = pad slot) plus
    tile_block / tile_first arrays. None when the native lib is missing
    (caller falls back to the numpy implementation in graph.padded)."""
    lib = load()
    if lib is None:
        return None
    r = np.ascontiguousarray(receivers_sorted, dtype=np.int32)
    null_i32 = ctypes.POINTER(ctypes.c_int32)()
    total = lib.gc_align_blocks(
        _i32p(r), ctypes.c_int64(len(r)), ctypes.c_int32(int(num_nodes_pad)),
        ctypes.c_int32(node_block), ctypes.c_int32(edge_tile),
        null_i32, null_i32, null_i32, ctypes.POINTER(ctypes.c_int64)())
    rows = np.empty(total, dtype=np.int32)
    n_tiles_max = total // edge_tile
    tile_block = np.empty(n_tiles_max, dtype=np.int32)
    tile_first = np.empty(n_tiles_max, dtype=np.int32)
    n_tiles = ctypes.c_int64(0)
    lib.gc_align_blocks(
        _i32p(r), ctypes.c_int64(len(r)), ctypes.c_int32(int(num_nodes_pad)),
        ctypes.c_int32(node_block), ctypes.c_int32(edge_tile),
        _i32p(rows), _i32p(tile_block), _i32p(tile_first),
        ctypes.byref(n_tiles))
    k = int(n_tiles.value)
    return rows, tile_block[:k], tile_first[:k]
