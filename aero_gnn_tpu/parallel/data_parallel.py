"""Data-parallel training over a ``data`` mesh axis.

Each device holds a full replica of the parameters and one padded
``GraphBatch`` shard (same static shapes on every device); gradients are
psum-averaged across the axis inside the jitted step. Works for every model
in the zoo because the per-device computation is just the single-device
train step.

Host side, ``stack_batches`` collates D per-device GraphBatches into one
leading-axis-stacked pytree, which shard_map splits across the axis.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from aero_gnn_tpu.graph.padded import GraphBatch
from aero_gnn_tpu.training.loop import masked_mse


def stack_batches(batches) -> Any:
    """[D] pytrees (same shapes) -> one pytree with leading device axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def make_dp_train_step(model_cfg, optimizer, mesh: Mesh,
                       *, needs_hierarchy: bool = False) -> Callable:
    """Returns jitted (params, opt_state, stacked_graph, stacked_hier, rng)
    -> (params, opt_state, mean_loss). Params/opt_state replicated;
    graph sharded along 'data'."""

    def _apply(params, graph, hierarchy, rng):
        if needs_hierarchy:
            return model_cfg.apply(params, graph, hierarchy=hierarchy,
                                   rng=rng)
        return model_cfg.apply(params, graph, rng=rng)

    def per_device(params, opt_state, graph, hierarchy, rng):
        # strip the per-device leading axis added by shard_map's blocks
        graph = jax.tree.map(lambda x: x[0], graph)
        if hierarchy is not None:
            hierarchy = jax.tree.map(lambda x: x[0], hierarchy)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(p):
            pred = _apply(p, graph, hierarchy, rng)
            return masked_mse(pred, graph.y, graph.node_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, stacked_graph, stacked_hier, rng):
        return sharded(params, opt_state, stacked_graph, stacked_hier, rng)

    return step


def make_dp_eval_step(model_cfg, mesh: Mesh,
                      *, needs_hierarchy: bool = False) -> Callable:
    def _apply(params, graph, hierarchy):
        if needs_hierarchy:
            return model_cfg.apply(params, graph, hierarchy=hierarchy)
        return model_cfg.apply(params, graph)

    def per_device(params, graph, hierarchy):
        graph = jax.tree.map(lambda x: x[0], graph)
        if hierarchy is not None:
            hierarchy = jax.tree.map(lambda x: x[0], hierarchy)
        loss = masked_mse(_apply(params, graph, hierarchy),
                          graph.y, graph.node_mask)
        return jax.lax.pmean(loss, "data")

    sharded = shard_map(per_device, mesh=mesh,
                        in_specs=(P(), P("data"), P("data")),
                        out_specs=P(), check_vma=False)
    return jax.jit(sharded)
