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


def local_device_count() -> int:
    return jax.local_device_count()
