"""Device mesh construction.

The framework's scaling axes (SURVEY §2c):
  * ``data``  — many small meshes, batch-parallel (pjit/shard_map + grad psum)
  * ``graph`` — one large mesh, edge/node partitioned with halo exchange
                (the graph analogue of tensor/sequence parallelism)

One global mesh carries both axes; collectives ride ICI within a slice. The
reference has no distributed code at all (single ``cuda:0`` device,
/root/reference/config.yaml:125).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(*, data: int = -1, graph: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, graph) mesh. ``data=-1`` uses all remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if graph < 1 or n % graph:
        raise ValueError(f"graph axis {graph} must divide device count {n}")
    if data == -1:
        data = n // graph
    if data * graph != n:
        raise ValueError(
            f"mesh {data}x{graph} != {n} devices")
    arr = np.asarray(devs).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))


def make_mesh_dcn(*, data: int = -1, graph: int = 1,
                  devices: Optional[Sequence] = None) -> Mesh:
    """DCN-aware (data, graph) mesh for multi-slice TPU pods (SURVEY §2c,
    "DCN-aware partitioning").

    TPU slices are internally connected by ICI (~100s of GB/s per link) and
    to each other by DCN (data-center network, ~10-100x slower). The graph
    axis carries per-LAYER collectives (halo all_to_all / all_gather —
    15+ per step), the data axis carries ONE gradient psum per step — so
    the graph axis must stay inside a slice and only the data axis may
    cross DCN. This helper orders devices so every mesh row (fixed data
    index) lies within a single slice:

      * multi-slice: devices grouped by ``slice_index``; ``graph`` must
        divide the per-slice device count (a graph group never straddles
        DCN); consecutive rows fill one slice before moving to the next.
      * single slice / CPU: id-ordered reshape (same as make_mesh).

    Layout-only — collectives need no changes; XLA routes them over the
    links the mesh geometry implies.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if graph < 1 or n % graph:
        raise ValueError(f"graph axis {graph} must divide device count {n}")
    if data == -1:
        data = n // graph
    if data * graph != n:
        raise ValueError(f"mesh {data}x{graph} != {n} devices")

    slice_ids = sorted({_slice_of(d) for d in devs})
    if len(slice_ids) > 1:
        per = n // len(slice_ids)
        groups = []
        for sid in slice_ids:
            g = sorted((d for d in devs if _slice_of(d) == sid),
                       key=lambda d: d.id)
            if len(g) != per:
                raise ValueError(
                    f"uneven slices: slice {sid} has {len(g)} devices, "
                    f"expected {per}")
            groups.append(g)
        if per % graph:
            raise ValueError(
                f"graph axis {graph} does not divide the per-slice device "
                f"count {per}; a graph group must not straddle DCN")
        flat = [d for g in groups for d in g]  # slice-major, id-ordered
        arr = np.asarray(flat).reshape(data, graph)
    else:
        arr = np.asarray(sorted(devs, key=lambda d: d.id)).reshape(
            data, graph)
    return Mesh(arr, axis_names=("data", "graph"))


def _slice_of(dev) -> int:
    """Device's slice index; 0 when the backend doesn't expose one (CPU,
    single-slice TPU)."""
    s = getattr(dev, "slice_index", None)
    return 0 if s is None else int(s)


def local_device_count() -> int:
    return jax.local_device_count()
