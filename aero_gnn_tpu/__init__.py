"""aero_gnn_tpu — a TPU-native mesh-GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
`cudagu/aero-gnn` repo (steady-state aerodynamic surface-field prediction on
unstructured meshes with MeshGraphNet-family models).

Design pillars (TPU-first, not a port):
  * static shapes everywhere: padded/bucketed graphs, precomputed hierarchies
  * destination-sorted edge layout (padded CSR) so aggregation is a segment
    reduction that maps onto MXU one-hot matmuls inside Pallas kernels
  * pure-functional models over parameter pytrees, jit/pjit compiled
  * scaling via `jax.sharding.Mesh` + shard_map (data parallel over graph
    buckets; spatial edge partitioning with halo exchange for large meshes)

Package layout:
  graph/     padded static-shape graph containers + host-side layout builders
  ops/       gather / segment-reduce primitives (XLA baseline + Pallas kernels)
  nn/        MLP and Edge/Node message-passing blocks (pure functions)
  models/    the model zoo (MGN, FourierMGN, PoolMGN, BSMS-MGN, MLPNet, MGNv2)
  data/      mesh ingestion (VTU/VTP reader), datasets, normalization, batching
  parallel/  device-mesh utilities, data-parallel + spatial-partition transforms
  training/  jitted train/eval steps, schedulers, checkpointing, artifacts
  inference/ prediction engine, error metrics, aero coefficients, exports
  config/    YAML experiment/config system
  utils/     profiling, logging
"""

__version__ = "0.1.0"
