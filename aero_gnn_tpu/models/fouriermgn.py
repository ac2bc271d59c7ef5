"""Fourier-feature MeshGraphNet.

Re-design of /root/reference/models/fouriermgn.py:10-183. The embedding is
``[cos, sin](2^i * pi * u)`` for i in [freq_start, freq_start + freq_length)
over the FIRST ``fourier_features_dim`` columns of the (already-normalized)
node features — note the reference feeds node_attr, not raw positions
(fouriermgn.py:167) — concatenated onto the node input before encoding.

Feature layout matches the reference reshape exactly:
per node, per spatial dim: [cos(f_0 u) .. cos(f_{L-1} u), sin(f_0 u) ..
sin(f_{L-1} u)], dims concatenated in order (the [N, d, 2L] -> [N, 2Ld]
row-major flatten of fouriermgn.py:148-149).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from aero_gnn_tpu.graph.padded import GraphBatch
from aero_gnn_tpu.models.mgn import MGNConfig


def fourier_embedding(features: jax.Array, *, dims: int, freq_start: int,
                      freq_length: int) -> jax.Array:
    """[N, >=dims] -> [N, 2 * freq_length * dims] Fourier features."""
    u = features[:, :dims]  # [N, d]
    i = jnp.arange(freq_start, freq_start + freq_length, dtype=features.dtype)
    freqs = (2.0 ** i) * jnp.pi  # [L]
    phase = u[:, :, None] * freqs[None, None, :]  # [N, d, L]
    emb = jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)  # [N,d,2L]
    return emb.reshape(features.shape[0], -1)


@dataclasses.dataclass(frozen=True)
class FourierMGNConfig(MGNConfig):
    fourier_features_dim: int = 2
    fourier_freq_start: int = -3
    fourier_freq_length: int = 7

    @property
    def _expanded_node_dim(self) -> int:
        return (self.input_node_dim
                + 2 * self.fourier_freq_length * self.fourier_features_dim)

    def init(self, key: jax.Array, dtype=jnp.float32):
        # Same parameter structure as MGN but with the expanded encoder input.
        base = dataclasses.replace(
            _as_mgn(self), input_node_dim=self._expanded_node_dim)
        return MGNConfig.init(base, key, dtype)

    def apply(self, params, graph: GraphBatch, *,
              rng: Optional[jax.Array] = None) -> jax.Array:
        emb = fourier_embedding(
            graph.x, dims=self.fourier_features_dim,
            freq_start=self.fourier_freq_start,
            freq_length=self.fourier_freq_length)
        expanded = graph.replace(x=jnp.concatenate([graph.x, emb], axis=-1))
        base = dataclasses.replace(
            _as_mgn(self), input_node_dim=self._expanded_node_dim)
        return MGNConfig.apply(base, params, expanded, rng=rng)


def _as_mgn(cfg: "FourierMGNConfig") -> MGNConfig:
    fields = {f.name: getattr(cfg, f.name)
              for f in dataclasses.fields(MGNConfig)}
    return MGNConfig(**fields)
