"""MeshGraphNet: encode -> process (L residual MP layers) -> decode.

Re-design of /root/reference/models/mgn.py:9-138 as a pure function over a
parameter pytree. Node/edge encoders are LN-terminated MLPs, the decoder has
no LN, and the processor is ``processor_size`` stacked residual MGN layers.

TPU notes: the processor runs under ``lax.scan`` over stacked layer params —
one compiled layer body regardless of depth, which keeps compile time flat
and lets XLA pipeline HBM traffic across layers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from aero_gnn_tpu.graph.padded import GraphBatch
from aero_gnn_tpu.nn import mlp as M
from aero_gnn_tpu.nn import blocks as B


@dataclasses.dataclass(frozen=True)
class MGNConfig:
    input_node_dim: int
    input_edge_dim: int
    output_node_dim: int
    processor_size: int = 15
    activation: str = "relu"
    num_hidden_layers_node_processor: int = 1
    num_hidden_layers_edge_processor: int = 1
    hidden_dim_processor: int = 128
    num_hidden_layers_node_encoder: int = 1
    hidden_dim_node_encoder: int = 128
    num_hidden_layers_edge_encoder: int = 1
    hidden_dim_edge_encoder: int = 128
    aggregation: str = "add"
    hidden_dim_decoder: int = 128
    num_hidden_layers_decoder: int = 1
    dropout: float = 0.0
    do_concat_trick: bool = False
    # Rematerialize each MP layer in the backward pass: activations are
    # [E, h]-sized and 15 layers of them blow HBM on big meshes; remat
    # trades ~1/3 extra FLOPs for O(1)-in-depth activation memory.
    remat: bool = True
    # "save_fused" keeps the fused-kernel boundary tensors (sg/d_proj/agg)
    # so the backward pass never re-runs the fused forward kernel or the
    # sender gather (~1 [E,h] + 2 [N,h] extra per layer); "full" is classic
    # minimal-memory remat for meshes near the HBM limit.
    remat_policy: str = "save_fused"
    # Grouped (sqrt-style) remat: checkpoint GROUPS of remat_group layers,
    # saving only group-boundary (x, e) — O(L/K) boundaries instead of
    # O(L) per-layer residuals. This is what fits >512k-node meshes in
    # 16 GB HBM: even "full" per-layer remat stores every layer's [E, h]
    # carry. 0 = off (per-layer remat_policy applies).
    remat_group: int = 0
    # Offload the group-boundary (x, e) stacks to pinned host memory
    # (only with remat_group > 1). At 1M nodes the two-level remat's
    # boundary stacks are ~10 GB of the 16.4 GB peak ([G,E,h]+[K,E,h]
    # bf16 + node stacks — XLA buffer report, benchmarks/fit_1m.py);
    # streaming the OUTER stacks over PCIe trades ~8 GB of host traffic
    # per step for the difference between fitting and compile-OOM on a
    # 16 GB chip.
    remat_offload: bool = False
    # Checkpoint policy for the INNER (per-layer) checkpoints inside
    # grouped remat: "full" (recompute each layer's forward again in its
    # backward — minimum memory, THREE forward executions per step) or
    # "save_fused" (keep the fused-kernel boundary tensors sg/d_proj/agg
    # during the group replay, so each layer's backward skips its second
    # recompute — one fewer forward pass at ~K x 1.5 [E,h]-equivalents of
    # extra peak). Measured A/B in benchmarks/ablate_524k.py; bench.py
    # picks per mesh size (the extra K x ~2.6 GB at 1M may break the fit).
    remat_group_policy: str = "full"
    # Compute dtype for the processor ("float32" | "bfloat16"). The MP stack
    # is HBM-bandwidth-bound ([E,h] activations dominate traffic), so bf16
    # activations+weights nearly double throughput; params stay fp32 (master
    # copy), LayerNorm statistics stay fp32, loss/decoder output are fp32.
    compute_dtype: str = "float32"
    # Unroll the processor loop instead of lax.scan. scan keeps compile time
    # flat but stacks every layer's backward residuals into [L, E, h]
    # buffers (dynamic_update_slice each iteration) and slices them back out
    # in the transpose — a profiled ~35 ms/step of pure data movement at 15
    # layers x 65k nodes (benchmarks/profile_step.py). Unrolling emits each
    # layer separately: residuals stay as distinct buffers, no copies, at
    # ~L x the processor's compile time.
    unroll: bool = False
    # One decoder MLP per output field instead of a single joint decoder —
    # the "separated decoder" experiment visible in the reference
    # (/root/reference/models/mgn.py:77-99, commented out; the deleted
    # seperatedDecoder module). Outputs are concatenated field-wise.
    separate_decoders: bool = False

    @property
    def layer_cfg(self) -> B.MGNLayerConfig:
        return B.MGNLayerConfig(
            node_dim=self.hidden_dim_processor,
            edge_dim=self.hidden_dim_processor,
            hidden_dim=self.hidden_dim_processor,
            num_hidden_layers_node=self.num_hidden_layers_node_processor,
            num_hidden_layers_edge=self.num_hidden_layers_edge_processor,
            activation=self.activation,
            use_layer_norm=True,
            aggregation=self.aggregation,
            do_concat_trick=self.do_concat_trick,
        )

    # -- init -------------------------------------------------------------
    def init(self, key: jax.Array, dtype=jnp.float32):
        kn, ke, kp, kd = jax.random.split(key, 4)
        node_enc = M.mlp_init(
            kn, self.input_node_dim, self.hidden_dim_node_encoder,
            self.hidden_dim_processor,
            num_hidden_layers=self.num_hidden_layers_node_encoder,
            use_layer_norm=True, dtype=dtype,
        )
        edge_enc = M.mlp_init(
            ke, self.input_edge_dim, self.hidden_dim_edge_encoder,
            self.hidden_dim_processor,
            num_hidden_layers=self.num_hidden_layers_edge_encoder,
            use_layer_norm=True, dtype=dtype,
        )
        layer_keys = jax.random.split(kp, self.processor_size)
        layers = [B.mgn_layer_init(k, self.layer_cfg, dtype) for k in layer_keys]
        # Stack per-layer pytrees along a leading axis for lax.scan.
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        if self.separate_decoders:
            dec_keys = jax.random.split(kd, self.output_node_dim)
            decoder = [
                M.mlp_init(k, self.hidden_dim_processor,
                           self.hidden_dim_decoder, 1,
                           num_hidden_layers=self.num_hidden_layers_decoder,
                           use_layer_norm=False, dtype=dtype)
                for k in dec_keys
            ]
        else:
            decoder = M.mlp_init(
                kd, self.hidden_dim_processor, self.hidden_dim_decoder,
                self.output_node_dim,
                num_hidden_layers=self.num_hidden_layers_decoder,
                use_layer_norm=False, dtype=dtype,
            )
        return {"node_encoder": node_enc, "edge_encoder": edge_enc,
                "layers": stacked, "decoder": decoder}

    # -- apply ------------------------------------------------------------
    def apply(self, params, graph: GraphBatch, *,
              rng: Optional[jax.Array] = None) -> jax.Array:
        params = cast_params(params, self.compute_dtype)

        def node_enc(p, a):
            return M.mlp_apply(p, a, activation=self.activation,
                               dropout=self.dropout, rng=_sub(rng, 0))

        def edge_enc(p, a):
            return M.mlp_apply(p, a, activation=self.activation,
                               dropout=self.dropout, rng=_sub(rng, 1))

        if self.remat and self.remat_group > 1:
            # near the HBM limit the ENCODER MLPs' [E, h] intermediates
            # (saved for their backward) are GBs too — recompute them
            node_enc = jax.checkpoint(node_enc)
            edge_enc = jax.checkpoint(edge_enc)
        x = node_enc(params["node_encoder"],
                     _cast(graph.x, self.compute_dtype))
        e = edge_enc(params["edge_encoder"],
                     _cast(graph.edge_attr, self.compute_dtype))
        x, e = run_processor(
            params["layers"], self.layer_cfg, x, e,
            graph.senders, graph.receivers,
            _cast(graph.edge_mask, self.compute_dtype),
            sender_perm=graph.sender_perm,
            senders_sorted=graph.senders_sorted,
            sender_plan=graph.sender_plan,
            remat=self.remat,
            remat_policy=self.remat_policy,
            aligned=graph.edges_aligned,
            unroll=self.unroll,
            remat_group=self.remat_group,
            remat_offload=self.remat_offload,
            remat_group_policy=self.remat_group_policy,
        )
        if self.separate_decoders:
            out = jnp.concatenate(
                [M.mlp_apply(d, x, activation=self.activation)
                 for d in params["decoder"]], axis=-1)
        else:
            out = M.mlp_apply(params["decoder"], x,
                              activation=self.activation)
        return out.astype(jnp.float32)


def run_processor(stacked_layers, layer_cfg: B.MGNLayerConfig,
                  x: jax.Array, e: jax.Array,
                  senders: jax.Array, receivers: jax.Array,
                  edge_mask: jax.Array, *, sender_perm=None,
                  senders_sorted=None, sender_plan=None, remat: bool = True,
                  remat_policy: str = "save_fused", aligned: bool = False,
                  unroll: bool = False, remat_group: int = 0,
                  remat_offload: bool = False,
                  remat_group_policy: str = "full"):
    """Scan the residual MP layer over stacked per-layer params.

    ``remat_policy`` (only with ``remat=True``):
      * ``"save_fused"`` — save the tensors that cross the fused-edge-kernel
        boundary (sg / d_proj / agg, tagged in blocks._mgn_layer_fused).
        The fused backward kernel only consumes the layer's *inputs* (the
        scan carry, which is saved anyway) plus sg/d_proj, and the node
        backward needs agg — so the remat recompute drops the whole fused
        forward kernel and the sender gather, at ~sg-sized extra memory per
        layer. On the unfused paths no tensor carries these names, so the
        policy degrades to full remat.
      * ``"full"`` — classic full-layer remat (recompute everything);
        minimum memory, for meshes near the HBM limit.
    """

    def body(carry, layer_params):
        x, e = carry
        x, e = B.mgn_layer_apply(
            layer_params, layer_cfg, x, e, senders, receivers, edge_mask,
            sender_perm, senders_sorted, aligned, sender_plan=sender_plan)
        return (x, e), None

    if remat and remat_offload and remat_group <= 1:
        raise ValueError("remat_offload requires remat_group > 1 (the "
                         "offload streams GROUP boundaries to host)")

    if remat and remat_group > 1 and remat_offload:
        num_layers = jax.tree.leaves(stacked_layers)[0].shape[0]
        if num_layers % remat_group:
            raise ValueError(
                f"remat_group={remat_group} must divide the layer count "
                f"{num_layers}")
        groups = num_layers // remat_group
        grouped = jax.tree.map(
            lambda a: a.reshape((groups, remat_group) + a.shape[1:]),
            stacked_layers)
        if remat_group_policy == "save_fused":
            inner = jax.checkpoint(
                body, policy=jax.checkpoint_policies.save_only_these_names(
                    "mgn_sg", "mgn_dproj", "mgn_agg"))
        else:
            inner = jax.checkpoint(body)

        if remat_offload:
            # Stream the OUTER group-boundary (x, e) pairs to pinned host
            # memory: a checkpoint's saved residual is its argument, so a
            # group that TAKES a host-resident carry keeps its boundary on
            # host until that group's backward. At 1M nodes the device-
            # resident boundary stacks are ~10 GB of the grouped remat's
            # 16.4 GB peak (benchmarks/fit_1m.py buffer report); this
            # trades them for ~2x G x (E+N) x h x 2B of PCIe traffic.
            #
            # Structure notes (each alternative has a round-4 fit_1m
            # record): the outer loop is UNROLLED (host-space scan carry
            # stacks trip an XLA host-offloader async-copy bug), the inner
            # loop is unrolled too (same bug class), and optimization
            # barriers fence the transfers so no fusable compute lands in
            # the host-side thunk emitter ("Fusion must have backend
            # config" crash). The policy-based route
            # (save_and_offload_only_these_names) silently loses its
            # memory-space annotations inside scan jaxprs at lowering on
            # jax 0.9 — device_put with jax.memory.Space is the form that
            # survives.
            def to_host(t):
                return jax.tree.map(
                    lambda a: jax.device_put(a, jax.memory.Space.Host), t)

            def to_dev(t):
                return jax.tree.map(
                    lambda a: jax.device_put(a, jax.memory.Space.Device), t)

            @jax.checkpoint
            def group_from_host(carry_host, group_params):
                carry = jax.lax.optimization_barrier(to_dev(carry_host))
                return scan_layers(inner, carry, group_params,
                                   unroll=True)

            carry = to_host(jax.lax.optimization_barrier((x, e)))
            for g in range(groups):
                gp = jax.tree.map(lambda a, g=g: a[g], grouped)
                out_dev = group_from_host(carry, gp)
                carry = (to_host(jax.lax.optimization_barrier(out_dev))
                         if g < groups - 1 else out_dev)
            return carry

    return checkpointed_layer_stack(
        body, (x, e), stacked_layers, remat=remat,
        remat_policy=remat_policy, unroll=unroll, remat_group=remat_group,
        remat_group_policy=remat_group_policy)


def checkpointed_layer_stack(body, carry, stacked_layers, *,
                             remat: bool = True,
                             remat_policy: str = "save_fused",
                             unroll: bool = False, remat_group: int = 0,
                             remat_group_policy: str = "full"):
    """Run ``body`` (scan semantics) over stacked layer params under the
    configured checkpoint scheme. Factored out of run_processor (round 5)
    so the parallel paths (parallel/halo.py, parallel/bsms_spatial.py)
    share the two-level GROUPED remat — per-shard sizes >= 262k nodes
    (2M-node meshes on 8 chips) exceed HBM under plain per-layer remat
    exactly like the single-chip >262k regime does.

    Two-level remat: the outer checkpoint saves only group-boundary
    carries; the INNER per-layer checkpoint matters too — without it the
    group's backward holds every member layer's fused-VJP residuals
    simultaneously. remat_group_policy="save_fused" keeps the named fused
    residuals (sg/d_proj/agg) during the group replay so each layer's
    backward skips its own (third) forward recompute; peak rises by
    K x (sg + d_proj + agg) per group (see MGNConfig docstring)."""
    if remat and remat_group > 1:
        num_layers = jax.tree.leaves(stacked_layers)[0].shape[0]
        if num_layers % remat_group:
            raise ValueError(
                f"remat_group={remat_group} must divide the layer count "
                f"{num_layers}")
        groups = num_layers // remat_group
        grouped = jax.tree.map(
            lambda a: a.reshape((groups, remat_group) + a.shape[1:]),
            stacked_layers)
        inner_sf = jax.checkpoint(
            body, policy=jax.checkpoint_policies.save_only_these_names(
                "mgn_sg", "mgn_dproj", "mgn_agg"))
        inner_full = jax.checkpoint(body)
        # "save_fused:N" applies the save_fused inner to only the FIRST N
        # groups (layer order) and full remat to the rest — a partial form
        # for meshes where full save_fused misses the fit by less than its
        # whole overhead (1M: 17.17G vs 15.75G budget vs 14.70G full).
        # The sf residuals are transient per group backward, but buffer
        # assignment still prices the largest group's set — fewer sf
        # groups bound that transient. Mixed groups force the unrolled
        # outer loop (two distinct bodies).
        if remat_group_policy.startswith("save_fused:"):
            n_sf = int(remat_group_policy.split(":", 1)[1])

            for g in range(groups):
                gp = jax.tree.map(lambda a, g=g: a[g], grouped)
                inner = inner_sf if g < n_sf else inner_full

                @jax.checkpoint
                def group_body(c, p, inner=inner):
                    return scan_layers(inner, c, p, unroll=unroll), None

                carry, _ = group_body(carry, gp)
            return carry
        inner = inner_sf if remat_group_policy == "save_fused" \
            else inner_full

        @jax.checkpoint
        def group_body(carry, group_params):
            return scan_layers(inner, carry, group_params,
                               unroll=unroll), None

        return scan_layers(group_body, carry, grouped, unroll=unroll)
    if remat:
        if remat_policy == "save_fused":
            policy = jax.checkpoint_policies.save_only_these_names(
                "mgn_sg", "mgn_dproj", "mgn_agg")
            body = jax.checkpoint(body, policy=policy)
        else:
            body = jax.checkpoint(body)
    return scan_layers(body, carry, stacked_layers, unroll=unroll)


def scan_layers(body, carry, stacked_layers, *, unroll: bool = False):
    """lax.scan over stacked per-layer params, or a Python unroll.

    scan stacks every layer's backward residuals into [L, ...] buffers
    (dynamic_update_slice per iteration) and slices them back out in the
    transpose — a profiled ~22 ms/step of pure copies at 15 layers x 65k
    nodes (benchmarks/profile_step.py). Unrolling emits each layer
    separately (residuals stay distinct buffers) at ~L x the compile time.
    ``body`` has scan semantics: (carry, layer_params) -> (carry, _).
    """
    if unroll:
        num_layers = jax.tree.leaves(stacked_layers)[0].shape[0]
        for i in range(num_layers):
            layer_i = jax.tree.map(lambda a, i=i: a[i], stacked_layers)
            carry, _ = body(carry, layer_i)
        return carry
    carry, _ = jax.lax.scan(body, carry, stacked_layers)
    return carry


def _sub(rng: Optional[jax.Array], i: int) -> Optional[jax.Array]:
    if rng is None:
        return None
    return jax.random.fold_in(rng, i)


def _cast(a: jax.Array, dtype: str) -> jax.Array:
    if dtype == "float32" or a is None:
        return a
    return a.astype(jnp.dtype(dtype))


def cast_params(params, dtype: str):
    """Cast fp32 master params to the compute dtype for the forward pass;
    autodiff through the cast yields fp32 gradients for the optimizer."""
    if dtype == "float32":
        return params
    dt = jnp.dtype(dtype)
    return jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
