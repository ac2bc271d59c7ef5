"""Pure-function MLP matching the reference MLP conventions.

Reference semantics (/root/reference/models/mlp.py:8-51):
  * layer stack = Linear(in, h) + Linear(h, h) * num_hidden_layers
    + Linear(h, out); if num_hidden_layers == 0 it degenerates to a single
    Linear(in, out).
  * activation (+ optional dropout) after every layer except the last.
  * optional LayerNorm applied AFTER the final linear (MGN convention).

Parameters are plain pytrees: {"linears": [{"w": [in,out], "b": [out]} ...],
"ln": {"scale", "bias"} | None}. Weight layout is [in, out] (JAX convention;
``x @ w + b``). Init mirrors torch.nn.Linear defaults
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so that
trained-from-scratch behavior is statistically comparable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch.nn.LayerNorm default


def linear_init(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm_apply(params, x: jax.Array) -> jax.Array:
    """LayerNorm with statistics in float32 (bf16-safe)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    out = xn * params["scale"].astype(jnp.float32) \
        + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def activation_fn(name: str):
    table = {
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "tanh": jnp.tanh,
        "elu": jax.nn.elu,
        "leaky_relu": jax.nn.leaky_relu,
        "sigmoid": jax.nn.sigmoid,
    }
    if name not in table:
        raise ValueError(f"Unsupported activation: {name}")
    return table[name]


def mlp_dims(
    input_dim: int, hidden_dim: int, output_dim: int, num_hidden_layers: int
) -> Sequence[tuple]:
    """(fan_in, fan_out) per linear, following the reference stacking rule."""
    if num_hidden_layers == 0:
        return [(input_dim, output_dim)]
    dims = [(input_dim, hidden_dim)]
    dims += [(hidden_dim, hidden_dim)] * num_hidden_layers
    dims += [(hidden_dim, output_dim)]
    return dims


def mlp_init(
    key: jax.Array,
    input_dim: int,
    hidden_dim: int,
    output_dim: int,
    num_hidden_layers: int = 1,
    use_layer_norm: bool = True,
    dtype=jnp.float32,
):
    dims = mlp_dims(input_dim, hidden_dim, output_dim, num_hidden_layers)
    keys = jax.random.split(key, len(dims))
    linears = [linear_init(k, fi, fo, dtype) for k, (fi, fo) in zip(keys, dims)]
    ln = layer_norm_init(output_dim, dtype) if use_layer_norm else None
    return {"linears": linears, "ln": ln}


def mlp_apply(
    params,
    x: jax.Array,
    *,
    activation: str = "relu",
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Forward pass. Dropout is active only when ``rng`` is provided."""
    act = activation_fn(activation)
    linears = params["linears"]
    for i, lin in enumerate(linears[:-1]):
        x = x @ lin["w"] + lin["b"]
        x = act(x)
        if dropout > 0.0 and rng is not None:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    lin = linears[-1]
    x = x @ lin["w"] + lin["b"]
    if params["ln"] is not None:
        x = layer_norm_apply(params["ln"], x)
    return x
