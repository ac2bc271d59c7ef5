"""Parity tests: MLP and message-passing blocks vs the numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aero_gnn_tpu.nn import mlp as M
from aero_gnn_tpu.nn import blocks as B

import np_oracle as O


@pytest.fixture
def rng():
    return np.random.default_rng(1)


def to_np(t):
    return jax.tree.map(np.asarray, t)


def test_mlp_matches_oracle(rng):
    key = jax.random.PRNGKey(0)
    params = M.mlp_init(key, 7, 32, 5, num_hidden_layers=2,
                        use_layer_norm=True)
    x = rng.standard_normal((11, 7)).astype(np.float32)
    out = M.mlp_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), O.mlp(to_np(params), x),
                               rtol=1e-5, atol=1e-5)


def test_mlp_degenerate_single_linear(rng):
    # num_hidden_layers=0 -> one Linear(in,out) (+LN), mlp.py:29-32 semantics.
    key = jax.random.PRNGKey(1)
    params = M.mlp_init(key, 4, 99, 3, num_hidden_layers=0,
                        use_layer_norm=True)
    assert len(params["linears"]) == 1
    assert params["linears"][0]["w"].shape == (4, 3)
    x = rng.standard_normal((5, 4)).astype(np.float32)
    out = M.mlp_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), O.mlp(to_np(params), x),
                               rtol=1e-5, atol=1e-5)


def _cfg(**kw):
    defaults = dict(node_dim=16, edge_dim=16, hidden_dim=16,
                    num_hidden_layers_node=1, num_hidden_layers_edge=1)
    defaults.update(kw)
    return B.MGNLayerConfig(**defaults)


def _graph_arrays(rng, n=20, e=77, d=16):
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    ea = rng.standard_normal((e, d)).astype(np.float32)
    return senders, receivers, x, ea


def test_edge_block_matches_oracle(rng):
    cfg = _cfg()
    params = B.edge_block_init(jax.random.PRNGKey(2), cfg)
    s, r, x, ea = _graph_arrays(rng)
    out = B.edge_block_apply(params, cfg, jnp.asarray(ea), jnp.asarray(x),
                             jnp.asarray(s), jnp.asarray(r))
    expect = O.edge_block(to_np(params), ea, x, s, r)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_edge_block_sum_matches_oracle(rng):
    cfg = _cfg(do_concat_trick=True)
    params = B.edge_block_sum_init(jax.random.PRNGKey(3), cfg)
    s, r, x, ea = _graph_arrays(rng)
    out = B.edge_block_sum_apply(params, cfg, jnp.asarray(ea), jnp.asarray(x),
                                 jnp.asarray(s), jnp.asarray(r))
    expect = O.edge_block_sum(to_np(params), ea, x, s, r)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_edge_block_sum_equals_edge_block_at_init(rng):
    """The concat trick is algebraically the same first layer: with the same
    split weights and identical post-stacks, outputs must match
    (mgnLayer.py:51-105 decomposition)."""
    cfg_full = _cfg()
    cfg_sum = _cfg(do_concat_trick=True)
    sum_params = B.edge_block_sum_init(jax.random.PRNGKey(4), cfg_sum)
    # Reassemble the full EdgeBlock params from the split ones.
    w_full = jnp.concatenate(
        [sum_params["w_e"], sum_params["w_s"], sum_params["w_d"]], axis=0)
    full_params = {
        "linears": [{"w": w_full, "b": sum_params["b"]}]
        + [dict(l) for l in sum_params["stack"]],
        "ln": sum_params["ln"],
    }
    s, r, x, ea = _graph_arrays(rng)
    out_sum = B.edge_block_sum_apply(sum_params, cfg_sum, jnp.asarray(ea),
                                     jnp.asarray(x), jnp.asarray(s),
                                     jnp.asarray(r))
    out_full = B.edge_block_apply(full_params, cfg_full, jnp.asarray(ea),
                                  jnp.asarray(x), jnp.asarray(s),
                                  jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(out_sum), np.asarray(out_full),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("aggregation", ["add", "mean"])
def test_node_block_matches_oracle(rng, aggregation):
    cfg = _cfg(aggregation=aggregation)
    params = B.node_block_init(jax.random.PRNGKey(5), cfg)
    s, r, x, ea = _graph_arrays(rng)
    out = B.node_block_apply(params, cfg, jnp.asarray(x), jnp.asarray(ea),
                             jnp.asarray(r), None)
    expect = O.node_block(to_np(params), x, ea, r, aggregation)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("concat_trick", [False, True])
def test_mgn_layer_matches_oracle(rng, concat_trick):
    cfg = _cfg(do_concat_trick=concat_trick)
    params = B.mgn_layer_init(jax.random.PRNGKey(6), cfg)
    s, r, x, ea = _graph_arrays(rng)
    xo, eo = B.mgn_layer_apply(params, cfg, jnp.asarray(x), jnp.asarray(ea),
                               jnp.asarray(s), jnp.asarray(r))
    xe, ee = O.mgn_layer(to_np(params), x, ea, s, r,
                         aggregation="add", concat_trick=concat_trick)
    np.testing.assert_allclose(np.asarray(xo), xe, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(eo), ee, rtol=1e-4, atol=1e-4)
