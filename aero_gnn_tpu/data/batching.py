"""Batching: MeshSample lists -> fixed-shape GraphBatch streams.

The device-batch boundary of the framework (the analogue of the reference's
PyG DataLoader collation, /root/reference/train.py:50-51) with TPU
constraints: every batch from one loader shares a single padded shape, so
the train step compiles exactly once.

For BSMS models, per-sample hierarchies are computed once and cached, then
collated per batch with coarse-id offsets (graph.hierarchy.collate_hierarchies).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from aero_gnn_tpu.data.dataset import MeshSample
from aero_gnn_tpu.graph import hierarchy as H
from aero_gnn_tpu.graph.padded import (
    ALIGN_EDGE_TILE,
    ALIGN_NODE_BLOCK,
    GraphBatch,
    _round_up,
    batch_graphs,
    bucket_size,
)


def sample_to_dict(s: MeshSample) -> Dict[str, np.ndarray]:
    return {
        "senders": s.senders.astype(np.int64),
        "receivers": s.receivers.astype(np.int64),
        "x": s.x,
        "edge_attr": s.edge_attr,
        "pos": s.pos,
        "y": s.y,
    }


@dataclasses.dataclass
class PadSpec:
    num_nodes_pad: int
    num_edges_pad: int
    num_graphs_pad: int
    hierarchy_pad_plan: Optional[List[Tuple[int, int]]] = None
    # fixed aligned coarse-edge counts per level (align_edges loaders), so
    # every batch compiles to one shape
    hierarchy_aligned_edges: Optional[List[int]] = None


def compute_pad_spec(samples: List[MeshSample], batch_size: int,
                     *, hierarchy_levels: Optional[List[List[dict]]] = None,
                     align_edges: bool = False) -> PadSpec:
    """One shared padded shape for every batch of up to ``batch_size``
    samples: bucket the worst-case sum of the largest graphs. With
    ``align_edges`` the edge budget covers the worst-case block-alignment
    overhead (up to one tile per node block) so every batch still compiles
    to one shape."""
    ns = sorted((s.num_nodes for s in samples), reverse=True)
    es = sorted((s.num_edges for s in samples), reverse=True)
    worst_n = sum(ns[:batch_size])
    worst_e = sum(es[:batch_size])
    if align_edges:
        nodes_pad = bucket_size(worst_n + 1, multiple=ALIGN_NODE_BLOCK)
        n_blocks = nodes_pad // ALIGN_NODE_BLOCK
        edges_pad = _round_up(worst_e + n_blocks * ALIGN_EDGE_TILE,
                              ALIGN_EDGE_TILE)
    else:
        nodes_pad = bucket_size(worst_n + 1)
        edges_pad = bucket_size(worst_e)
    spec = PadSpec(
        num_nodes_pad=nodes_pad,
        num_edges_pad=edges_pad,
        num_graphs_pad=batch_size + 1,
    )
    if hierarchy_levels is not None:
        n_lvls = len(hierarchy_levels[0])
        plan = []
        aligned_plan = []
        for s_idx in range(n_lvls):
            cns = sorted((lv[s_idx]["num_nodes"] for lv in hierarchy_levels),
                         reverse=True)
            ces = sorted((lv[s_idx]["num_edges"] for lv in hierarchy_levels),
                         reverse=True)
            nc_pad = bucket_size(sum(cns[:batch_size]) + 1)
            ec_pad = bucket_size(sum(ces[:batch_size]))
            plan.append((nc_pad, ec_pad))
            if align_edges:
                nc2 = max(_round_up(nc_pad, ALIGN_NODE_BLOCK),
                          ALIGN_NODE_BLOCK)
                n_blocks = nc2 // ALIGN_NODE_BLOCK
                worst_ce = sum(ces[:batch_size])
                # naive worst case: one extra tile per coarse node block
                naive = _round_up(
                    worst_ce + n_blocks * ALIGN_EDGE_TILE, ALIGN_EDGE_TILE)
                # align_hierarchy balances per-block degree sums (greedy
                # min-load: max block load <= ceil(E/B) + max item weight),
                # so the budget tightens to B * ceil((avg + dmax)/ET) tiles
                # (+1 slack tile; align_hierarchy raises loudly if ever
                # exceeded, it never silently drops edges)
                dmax = 0
                for lv in hierarchy_levels:
                    l = lv[s_idx]
                    if l["num_nodes"]:
                        deg = (np.bincount(l["receivers"],
                                           minlength=l["num_nodes"])
                               + np.bincount(l["senders"],
                                             minlength=l["num_nodes"]))
                        dmax = max(dmax, int(deg.max()))
                per_block = -(-worst_ce // n_blocks) + dmax
                balanced = (n_blocks * (-(-per_block // ALIGN_EDGE_TILE))
                            + 1) * ALIGN_EDGE_TILE
                aligned_plan.append(min(naive, balanced))
        spec.hierarchy_pad_plan = plan
        spec.hierarchy_aligned_edges = aligned_plan if align_edges else None
    return spec


class Loader:
    """Shuffling mini-batch loader with one compiled shape.

    Yields (GraphBatch, aux) where aux["hierarchy"] is a tuple of
    HierarchyLevel when the loader was built with hierarchies.
    """

    def __init__(self, samples: List[MeshSample], batch_size: int,
                 *, shuffle: bool = False, seed: int = 0,
                 num_scales: Optional[int] = None,
                 hierarchy_mode: str = "stride", stride: int = 2,
                 pad_spec: Optional[PadSpec] = None,
                 align_edges: Optional[bool] = None,
                 drop_remainder: bool = False):
        if not samples:
            raise ValueError("Loader needs at least one sample")
        self.samples = samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self._epoch = 0
        if align_edges is None:
            # Pallas kernels require the block-aligned layout. With a BSMS
            # hierarchy, every level is aligned (hierarchy.align_hierarchy):
            # level-0 fine-edge artifacts follow the GraphBatch alignment
            # and coarse streams get their own block alignment, so the
            # fused kernels run on all scales.
            from aero_gnn_tpu import ops as _ops
            align_edges = _ops.backend() == "pallas"
        self.align_edges = align_edges

        self._hier: Optional[List[List[dict]]] = None
        if num_scales is not None and num_scales > 1:
            self._hier = [
                H.build_hierarchy_real(
                    senders=s.senders, receivers=s.receivers,
                    node_graph=np.zeros(s.num_nodes, np.int64),
                    num_nodes=s.num_nodes, pos=s.pos.astype(np.float64),
                    num_scales=num_scales, mode=hierarchy_mode, stride=stride)
                for s in samples
            ]
        self.pad_spec = pad_spec or compute_pad_spec(
            samples, batch_size, hierarchy_levels=self._hier,
            align_edges=self.align_edges)

    def __len__(self) -> int:
        n = len(self.samples)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[GraphBatch, dict]]:
        order = np.arange(len(self.samples))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        n_batches = len(self)
        for b in range(n_batches):
            idx = order[b * bs:(b + 1) * bs]
            batch_samples = [self.samples[i] for i in idx]
            gb, amap = batch_graphs(
                [sample_to_dict(s) for s in batch_samples],
                num_nodes_pad=self.pad_spec.num_nodes_pad,
                num_edges_pad=self.pad_spec.num_edges_pad,
                num_graphs_pad=self.pad_spec.num_graphs_pad,
                align_edges=self.align_edges,
                return_align_map=True,
            )
            aux: dict = {"samples": batch_samples}
            if self._hier is not None:
                levels = H.collate_hierarchies(
                    [self._hier[i] for i in idx],
                    num_fine_nodes_pad=self.pad_spec.num_nodes_pad,
                    num_fine_edges_pad=self.pad_spec.num_edges_pad,
                    pad_plan=self.pad_spec.hierarchy_pad_plan,
                )
                if amap is not None:
                    # align EVERY level: level-0 fine rows follow the
                    # GraphBatch alignment, coarse streams get their own
                    # block alignment so Pallas runs on all scales.
                    # The PadSpec "balanced" coarse-edge budget is exact only
                    # when the greedy min-load bound holds (symmetric coarse
                    # graphs, no block-capacity saturation); if a batch ever
                    # exceeds it, retry without fixed targets (one extra
                    # compile shape instead of a crash).
                    try:
                        levels = H.align_hierarchy(
                            levels, amap,
                            edge_pad_targets=self.pad_spec
                            .hierarchy_aligned_edges)
                    except ValueError:
                        import warnings
                        warnings.warn(
                            "hierarchy aligned-edge budget exceeded; "
                            "realigning this batch with per-batch sizes "
                            "(may trigger one recompilation)")
                        levels = H.align_hierarchy(levels, amap)
                aux["hierarchy"] = tuple(levels)
            yield gb, aux
