"""Async-collective compile options for multi-chip runs.

The TPU compiler ships with async all-to-all DISABLED: the overlapped
halo-split design (parallel.halo, SURVEY.md long-context analogue) relies
on the boundary exchange being in flight while the interior fused kernels
run, but a default compile emits BLOCKING all-to-alls — measured on the
production compiler via AOT compilation against a v5e:2x4 topology
(benchmarks/overlap_evidence.py; the scheduled module shows plain
`all-to-all` ops, no async annotation). Enabling the latency-hiding
scheduler plus async all-to-all turns them into
async_collective_name="all-to-all-start" ops whose first consumer (the
wait) is scheduled after the interior Mosaic kernels — see
OVERLAP_r3.json / MULTICHIP_AOT_r4.json for recorded schedules.

Delivery mechanism: PER-JIT ``compiler_options`` (jax.jit accepts them
directly), attached by every multi-chip step factory via
:func:`async_jit_options` when the target mesh is TPU. The earlier
XLA_FLAGS env route is gone — these are TPU debug options, and any
client whose XLA build lacks them (CPU jaxlib, and even the axon relay
client here) FATALS at parse_flags_from_env with "Unknown flags", so a
fresh-process CPU run of the CLI crashed outright (round-4 find).
For AOT compiles pass :data:`ASYNC_COLLECTIVE_OPTIONS` to
``lowered.compile(compiler_options=...)``.
"""

from __future__ import annotations

import os

ASYNC_COLLECTIVE_OPTIONS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_enable_async_all_to_all": "true",
}


def async_jit_options(mesh):
    """``compiler_options`` for a multi-chip step jit: the async-collective
    TPU options when ``mesh``'s devices are TPUs, else None (the options
    are TPU debug options — a CPU compile rejects them). Disable with
    AERO_GNN_ASYNC_COLLECTIVES=0."""
    if os.environ.get("AERO_GNN_ASYNC_COLLECTIVES", "1") != "1":
        return None
    try:
        dev = next(iter(mesh.devices.flat))
    except (AttributeError, StopIteration, TypeError):
        return None
    if getattr(dev, "platform", "") == "tpu":
        return dict(ASYNC_COLLECTIVE_OPTIONS)
    return None
