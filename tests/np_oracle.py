"""Independent numpy oracle implementations for parity testing.

These re-state the *mathematical semantics* of the reference blocks
(/root/reference/models/mgnLayer.py, mlp.py) in plain numpy, written
independently of both the reference code and the JAX implementation, so a
bug in either side shows up as a mismatch.
"""

import numpy as np

LN_EPS = 1e-5


def relu(x):
    return np.maximum(x, 0.0)


def layer_norm(x, scale, bias):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + LN_EPS) * scale + bias


def mlp(params, x):
    """Mirror of reference MLP forward: act on all but last, LN at end."""
    lins = params["linears"]
    for lin in lins[:-1]:
        x = relu(x @ np.asarray(lin["w"]) + np.asarray(lin["b"]))
    x = x @ np.asarray(lins[-1]["w"]) + np.asarray(lins[-1]["b"])
    if params["ln"] is not None:
        x = layer_norm(x, np.asarray(params["ln"]["scale"]),
                       np.asarray(params["ln"]["bias"]))
    return x


def scatter_add(values, index, dim_size):
    out = np.zeros((dim_size,) + values.shape[1:], dtype=values.dtype)
    np.add.at(out, index, values)
    return out


def scatter_mean(values, index, dim_size):
    s = scatter_add(values, index, dim_size)
    cnt = np.zeros(dim_size, dtype=values.dtype)
    np.add.at(cnt, index, 1.0)
    cnt = np.maximum(cnt, 1.0)
    return s / cnt[:, None]


def edge_block(params, edge_attr, node_attr, senders, receivers):
    inp = np.concatenate(
        [edge_attr, node_attr[senders], node_attr[receivers]], axis=-1)
    return mlp(params, inp)


def edge_block_sum(params, edge_attr, node_attr, senders, receivers):
    h0 = (edge_attr @ np.asarray(params["w_e"])
          + (node_attr @ np.asarray(params["w_s"]))[senders]
          + (node_attr @ np.asarray(params["w_d"]) + np.asarray(params["b"]))[receivers])
    z = relu(h0)
    for lin in params["stack"][:-1]:
        z = relu(z @ np.asarray(lin["w"]) + np.asarray(lin["b"]))
    lin = params["stack"][-1]
    z = z @ np.asarray(lin["w"]) + np.asarray(lin["b"])
    if params["ln"] is not None:
        z = layer_norm(z, np.asarray(params["ln"]["scale"]),
                       np.asarray(params["ln"]["bias"]))
    return z


def node_block(params, node_attr, edge_attr, receivers, aggregation="add"):
    if aggregation == "add":
        agg = scatter_add(edge_attr, receivers, node_attr.shape[0])
    elif aggregation == "mean":
        agg = scatter_mean(edge_attr, receivers, node_attr.shape[0])
    else:
        raise ValueError(aggregation)
    return mlp(params, np.concatenate([node_attr, agg], axis=-1))


def mgn_layer(params, node_attr, edge_attr, senders, receivers,
              aggregation="add", concat_trick=False):
    if concat_trick:
        de = edge_block_sum(params["edge"], edge_attr, node_attr,
                            senders, receivers)
    else:
        de = edge_block(params["edge"], edge_attr, node_attr,
                        senders, receivers)
    edge_attr = edge_attr + de
    dn = node_block(params["node"], node_attr, edge_attr, receivers,
                    aggregation)
    return node_attr + dn, edge_attr


def random_graph(rng, n, e, dn, de, dy=4):
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    return {
        "senders": senders,
        "receivers": receivers,
        "x": rng.standard_normal((n, dn)).astype(np.float32),
        "edge_attr": rng.standard_normal((e, de)).astype(np.float32),
        "pos": rng.standard_normal((n, 2)).astype(np.float32),
        "y": rng.standard_normal((n, dy)).astype(np.float32),
    }
