"""Rollout / serving harness: high-throughput repeated inference.

The reference performs one-shot steady-state prediction per geometry
(/root/reference/inference.py:248-256); "rollout" throughput here means
jit-compiled repeated inference over stacked cases (BASELINE.md note). Two
entry points:

  * ``make_batch_rollout``  — scan a jitted forward over K stacked padded
    graphs (one device round-trip for the whole set; the serving hot path)
  * ``autoregressive_rollout`` — optional harness that feeds predictions
    back into chosen node-feature columns for T steps (for models trained
    on incremental targets; not used by the steady-state datasets)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from aero_gnn_tpu.graph.padded import GraphBatch


def stack_graphs(graphs: Sequence[GraphBatch]) -> GraphBatch:
    """[K] same-shape GraphBatches -> leading-axis-stacked pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)


def make_batch_rollout(model_cfg, *, needs_hierarchy: bool = False
                       ) -> Callable:
    """Returns jitted (params, stacked_graphs[, stacked_hierarchy]) ->
    predictions [K, N_pad, Dy]."""

    def rollout(params, stacked: GraphBatch, stacked_hierarchy=None):
        def body(_, inp):
            if needs_hierarchy:
                graph, hier = inp
                pred = model_cfg.apply(params, graph, hierarchy=hier)
            else:
                pred = model_cfg.apply(params, inp)
            return None, pred

        xs = ((stacked, stacked_hierarchy) if needs_hierarchy else stacked)
        _, preds = jax.lax.scan(body, None, xs)
        return preds

    return jax.jit(rollout)


def autoregressive_rollout(model_cfg, params, graph: GraphBatch, *,
                           steps: int,
                           feedback_columns: Optional[Sequence[int]] = None
                           ) -> jax.Array:
    """Feed predictions back into node features for ``steps`` iterations.

    ``feedback_columns``: which x columns receive the prediction (defaults
    to the LAST Dy columns). Returns the trajectory [steps, N_pad, Dy].
    """
    dy = graph.y.shape[1]
    cols = (jnp.arange(graph.x.shape[1] - dy, graph.x.shape[1])
            if feedback_columns is None
            else jnp.asarray(feedback_columns))

    @jax.jit
    def run(params, graph):
        def body(g, _):
            pred = model_cfg.apply(params, g)
            new_x = g.x.at[:, cols].set(pred)
            return g.replace(x=new_x), pred

        _, traj = jax.lax.scan(body, graph, None, length=steps)
        return traj

    return run(params, graph)
