"""Multi-host (pod-slice) runtime initialization.

The reference has no distributed code (SURVEY §2c). TPU-native multi-host
training uses the standard JAX recipe: one process per host, each seeing
its local chips; ``jax.distributed.initialize`` wires the cluster, and the
same shard_map programs from parallel/{data_parallel,spatial,hybrid}.py run
unchanged over the global mesh — XLA routes collectives over ICI within a
slice and DCN across slices.

On Cloud TPU, initialize() autodetects coordinator/rank from the
environment; elsewhere pass them explicitly. Checkpointing under multi-host
uses the same training/checkpoint.py API on process 0 (fully-replicated
params), with restart-on-failure resume via ``resume: true``.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed bring-up (no-op when single-process)."""
    if num_processes == 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError):
        # already initialized, or single-host without cluster env
        pass


def is_primary() -> bool:
    return jax.process_index() == 0


def global_device_count() -> int:
    return jax.device_count()
