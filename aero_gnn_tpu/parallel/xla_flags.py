"""XLA flag management for multi-chip runs.

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
OVERLAP_r3.json for the recorded schedule evidence.

Call :func:`ensure_async_collectives` BEFORE the first JAX backend
initialization (the CLI does this at startup); for AOT compiles pass
:data:`ASYNC_COLLECTIVE_OPTIONS` as ``compiler_options``.
"""

from __future__ import annotations

import os

ASYNC_COLLECTIVE_OPTIONS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_enable_async_all_to_all": "true",
}


def ensure_async_collectives(env=None) -> str:
    """Append the async-collective flags to XLA_FLAGS (idempotent).

    Returns the resulting XLA_FLAGS value. Flags already mentioned in the
    variable (either polarity) are left untouched so callers can override.
    No-op after backend init — set it early (CLI entry, job launcher).
    """
    if env is None:
        env = os.environ
    cur = env.get("XLA_FLAGS", "")
    parts = [cur] if cur else []
    for k, v in ASYNC_COLLECTIVE_OPTIONS.items():
        if k not in cur:
            parts.append(f"--{k}={v}")
    out = " ".join(parts)
    env["XLA_FLAGS"] = out
    return out
