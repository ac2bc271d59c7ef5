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
               process_id: Optional[int] = None,
               initialization_timeout: Optional[int] = None) -> None:
    """Idempotent jax.distributed bring-up (no-op when single-process).

    When the caller passes an EXPLICIT cluster spec (coordinator address or
    process count), a bring-up failure raises — silently degrading to
    single-process training with a wrong coordinator address would psum
    over one host and produce wrong results without a word. Only the
    auto-detect path (no arguments, e.g. single-host dev runs without
    cluster env) is allowed to fall through, plus re-initialization.
    """
    if num_processes == 1:
        return
    explicit = coordinator_address is not None or (
        num_processes is not None and num_processes > 1)
    kwargs = {}
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = initialization_timeout
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id, **kwargs)
    except RuntimeError as err:
        if "already initialized" in str(err).lower():
            return
        if explicit:
            raise
    except ValueError:
        if explicit:
            raise
        # single-host without cluster env: auto-detect found nothing


def is_primary() -> bool:
    return jax.process_index() == 0


def global_device_count() -> int:
    return jax.device_count()
