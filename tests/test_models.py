"""Model-zoo tests: shapes, padding invariance, semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aero_gnn_tpu.graph import padded
from aero_gnn_tpu.graph.hierarchy import build_hierarchy
from aero_gnn_tpu.models.mgn import MGNConfig
from aero_gnn_tpu.models.fouriermgn import FourierMGNConfig, fourier_embedding
from aero_gnn_tpu.models.poolmgn import PoolMGNConfig
from aero_gnn_tpu.models.mlpnet import MLPNetConfig
from aero_gnn_tpu.models.mgn_v2 import MGNv2Config
from aero_gnn_tpu.models.bsms import BSMSConfig
from aero_gnn_tpu.models.registry import build_model

from np_oracle import random_graph


def small_mesh(rng, n=30, dn=6, de=3, dy=4):
    """Connected undirected ring + chords mesh-like graph."""
    s = np.arange(n, dtype=np.int32)
    r = (s + 1) % n
    senders = np.concatenate([s, r]).astype(np.int32)
    receivers = np.concatenate([r, s]).astype(np.int32)
    return {
        "senders": senders,
        "receivers": receivers,
        "x": rng.standard_normal((n, dn)).astype(np.float32),
        "edge_attr": rng.standard_normal((2 * n, de)).astype(np.float32),
        "pos": rng.standard_normal((n, 2)).astype(np.float32),
        "y": rng.standard_normal((n, dy)).astype(np.float32),
    }


@pytest.fixture
def rng():
    return np.random.default_rng(7)


DIMS = dict(input_node_dim=6, input_edge_dim=3, output_node_dim=4)


def tiny_mgn(**kw):
    base = dict(**DIMS, processor_size=2, hidden_dim_processor=16,
                hidden_dim_node_encoder=16, hidden_dim_edge_encoder=16,
                hidden_dim_decoder=16)
    base.update(kw)
    return base


def test_mgn_forward_shape_and_padding_invariance(rng):
    cfg = MGNConfig(**tiny_mgn(do_concat_trick=True))
    params = cfg.init(jax.random.PRNGKey(0))
    g = small_mesh(rng)
    gb1 = padded.build_graph_batch(**g)
    gb2 = padded.build_graph_batch(**g, num_nodes_pad=256, num_edges_pad=512)
    out1 = cfg.apply(params, gb1)
    out2 = cfg.apply(params, gb2)
    assert out1.shape == (gb1.num_nodes_pad, 4)
    # predictions on the real nodes must not depend on the padding amount
    np.testing.assert_allclose(np.asarray(out1)[:30], np.asarray(out2)[:30],
                               rtol=1e-5, atol=1e-5)


def test_mgn_concat_trick_padding_with_full_edgeblock(rng):
    cfg = MGNConfig(**tiny_mgn(do_concat_trick=False))
    params = cfg.init(jax.random.PRNGKey(1))
    g = small_mesh(rng)
    out1 = np.asarray(cfg.apply(params, padded.build_graph_batch(**g)))[:30]
    out2 = np.asarray(cfg.apply(params, padded.build_graph_batch(
        **g, num_nodes_pad=512, num_edges_pad=1024)))[:30]
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


def test_fourier_embedding_matches_numpy(rng):
    x = rng.standard_normal((9, 5)).astype(np.float32)
    out = np.asarray(fourier_embedding(jnp.asarray(x), dims=2,
                                       freq_start=-3, freq_length=7))
    # manual: per node, per dim d: cos(2^i pi u) for i, then sin(...)
    freqs = (2.0 ** np.arange(-3, 4)) * np.pi
    expect = []
    for d in range(2):
        ph = x[:, d:d + 1] * freqs[None, :]
        expect.append(np.concatenate([np.cos(ph), np.sin(ph)], axis=1))
    expect = np.stack(expect, axis=1).reshape(9, -1)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)
    assert out.shape == (9, 2 * 7 * 2)


def test_fouriermgn_forward(rng):
    cfg = FourierMGNConfig(**tiny_mgn(), fourier_features_dim=2,
                           fourier_freq_start=-3, fourier_freq_length=7)
    params = cfg.init(jax.random.PRNGKey(2))
    gb = padded.build_graph_batch(**small_mesh(rng))
    out = cfg.apply(params, gb)
    assert out.shape == (gb.num_nodes_pad, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_poolmgn_batched_equals_individual(rng):
    """Global pooling is per graph, so a batch-of-2 must reproduce the two
    individual predictions (collation correctness)."""
    cfg = PoolMGNConfig(**tiny_mgn(), global_dim=16)
    params = cfg.init(jax.random.PRNGKey(3))
    g1, g2 = small_mesh(rng), small_mesh(rng, n=20)
    both = padded.batch_graphs([g1, g2])
    out_b = np.asarray(cfg.apply(params, both))
    out_1 = np.asarray(cfg.apply(params, padded.build_graph_batch(**g1)))
    out_2 = np.asarray(cfg.apply(params, padded.build_graph_batch(**g2)))
    np.testing.assert_allclose(out_b[:30], out_1[:30], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out_b[30:50], out_2[:20], rtol=1e-4, atol=1e-4)


def test_mgn_v2_forward(rng):
    cfg = MGNv2Config(node_input_size=6, edge_input_size=3,
                      hidden_channels=16, out_channels=4,
                      num_graph_conv_layers=2)
    params = cfg.init(jax.random.PRNGKey(4))
    gb = padded.build_graph_batch(**small_mesh(rng))
    out = cfg.apply(params, gb)
    assert out.shape == (gb.num_nodes_pad, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_mlpnet_forward(rng):
    cfg = MLPNetConfig(input_node_dim=6, output_node_dim=4, hidden_dim=16)
    params = cfg.init(jax.random.PRNGKey(5))
    gb = padded.build_graph_batch(**small_mesh(rng))
    out = cfg.apply(params, gb)
    assert out.shape == (gb.num_nodes_pad, 4)


class TestHierarchy:
    def test_stride_assignment_matches_reference_rule(self, rng):
        # nodes sorted by x coordinate grouped in consecutive pairs
        n = 10
        pos = np.stack([rng.permutation(n).astype(np.float64),
                        np.zeros(n)], axis=1)
        s = np.arange(n - 1)
        senders = np.concatenate([s, s + 1])
        receivers = np.concatenate([s + 1, s])
        levels = build_hierarchy(
            senders=senders, receivers=receivers,
            node_graph=np.zeros(n, np.int64), num_nodes=n, pos=pos,
            num_scales=2, mode="stride", stride=2)
        lvl = levels[0]
        f2c = np.asarray(lvl.fine_to_coarse)[:n]
        order = np.argsort(pos[:, 0])
        # rank//2 grouping: nodes at sorted ranks (0,1)->0, (2,3)->1, ...
        expect = np.empty(n, np.int64)
        expect[order] = np.arange(n) // 2
        np.testing.assert_array_equal(f2c, expect)
        assert int(lvl.n_node) == 5

    def test_coarse_edges_dedup_and_selfloops(self, rng):
        # two fine nodes merging -> their connecting edge becomes a self-loop,
        # duplicates collapse (torch.unique parity, bsms_mgn.py:276-288)
        pos = np.array([[0.0, 0], [1.0, 0], [2.0, 0], [3.0, 0]])
        senders = np.array([0, 1, 1, 2, 2, 3])
        receivers = np.array([1, 0, 2, 1, 3, 2])
        levels = build_hierarchy(
            senders=senders, receivers=receivers,
            node_graph=np.zeros(4, np.int64), num_nodes=4, pos=pos,
            num_scales=2, mode="stride", stride=2)
        lvl = levels[0]
        e = int(lvl.n_edge)
        cs = np.asarray(lvl.senders)[:e]
        cr = np.asarray(lvl.receivers)[:e]
        pairs = set(zip(cs.tolist(), cr.tolist()))
        # coarse nodes: {0,1}->0, {2,3}->1; edges: (0,0) self, (0,1), (1,0),
        # (1,1) self
        assert pairs == {(0, 0), (0, 1), (1, 0), (1, 1)}

    def test_bistride_covers_all_nodes(self, rng):
        g = small_mesh(rng, n=24)
        levels = build_hierarchy(
            senders=g["senders"].astype(np.int64),
            receivers=g["receivers"].astype(np.int64),
            node_graph=np.zeros(24, np.int64), num_nodes=24,
            pos=g["pos"].astype(np.float64),
            num_scales=3, mode="bistride")
        for lvl in levels:
            nf = np.asarray(lvl.fine_to_coarse)
            nc = int(lvl.n_node)
            assert nc > 0
            # every real fine node maps to a real coarse node
            # (level 0 fine count = 24)
        assert int(levels[0].n_node) < 24


def test_bsms_forward_and_padding_invariance(rng):
    cfg = BSMSConfig(**tiny_mgn(do_concat_trick=True), num_scales=3,
                     layers_per_scale=1, stride=2)
    params = cfg.init(jax.random.PRNGKey(6))
    g = small_mesh(rng, n=32)
    gb = padded.build_graph_batch(**g)
    levels = tuple(build_hierarchy(
        senders=g["senders"].astype(np.int64),
        receivers=g["receivers"].astype(np.int64),
        node_graph=np.zeros(32, np.int64), num_nodes=32,
        pos=g["pos"].astype(np.float64),
        num_scales=3, mode="stride", stride=2,
        num_fine_nodes_pad=gb.num_nodes_pad,
        num_fine_edges_pad=gb.num_edges_pad))
    out = cfg.apply(params, gb, hierarchy=levels)
    assert out.shape == (gb.num_nodes_pad, 4)
    assert np.isfinite(np.asarray(out)).all()

    # bigger padding on every level must not change real-node predictions
    gb2 = padded.build_graph_batch(**g, num_nodes_pad=256, num_edges_pad=512)
    levels2 = tuple(build_hierarchy(
        senders=g["senders"].astype(np.int64),
        receivers=g["receivers"].astype(np.int64),
        node_graph=np.zeros(32, np.int64), num_nodes=32,
        pos=g["pos"].astype(np.float64),
        num_scales=3, mode="stride", stride=2,
        num_fine_nodes_pad=256, num_fine_edges_pad=512,
        pad_plan=[(128, 256), (128, 256)]))
    out2 = cfg.apply(params, gb2, hierarchy=levels2)
    np.testing.assert_allclose(np.asarray(out)[:32], np.asarray(out2)[:32],
                               rtol=1e-4, atol=1e-4)


def test_registry_builds_all():
    dims = DIMS
    for mc in [
        {"name": "meshgraphnet", "hidden_dim": 16, "processor_size": 2,
         "do_concat_trick": True},
        {"name": "mlpnet", "hidden_dim": 16},
        {"name": "poolMGN", "hidden_dim": 16, "processor_size": 2,
         "global_dim": 16},
        {"name": "fouriermgn", "hidden_dim": 16, "processor_size": 2},
        {"name": "bsms_mgn", "hidden_dim": 16, "processor_size": 2},
        {"name": "trial1", "hidden_dim": 16,
         "num_message_passing_layers": 2},
    ]:
        cfg = build_model(mc, dims)
        params = cfg.init(jax.random.PRNGKey(0))
        assert params is not None


class TestWeightedEdgeConv:
    """transfer="weighted" — the canonical BSMS-GNN WeightedEdgeConv
    (conv over fine edges with geometric masses + representative selection
    down, the exact adjoint up). Ref: /root/reference/models/bsms_mgn.py:
    265-288 is the scatter_mean simplification this generalizes."""

    def _sample(self, rng, n=32, warp=False):
        from aero_gnn_tpu.data.dataset import MeshSample, compute_features

        th = np.linspace(0, 2 * np.pi, n, endpoint=False)
        pos = np.stack([np.cos(th), np.sin(th)], 1).astype(np.float32)
        if warp:
            pos = pos * np.linspace(1, 3, n)[:, None].astype(np.float32)
        idx = np.arange(n)
        s = MeshSample(pos=pos, normals=pos.copy(),
                       senders=np.concatenate([idx, (idx + 1) % n]),
                       receivers=np.concatenate([(idx + 1) % n, idx]),
                       y=rng.standard_normal((n, 4)).astype(np.float32),
                       meta={"mach": 0.5, "alpha": 0.0, "airfoil": "ring"})
        compute_features([s], ["mach", "alpha"])
        return s

    def _level(self, rng, mode="bistride", warp=True, n=32):
        s = self._sample(rng, n=n, warp=warp)
        levels = build_hierarchy(
            senders=s.senders.astype(np.int64),
            receivers=s.receivers.astype(np.int64),
            node_graph=np.zeros(n, np.int64), num_nodes=n,
            pos=s.pos.astype(np.float64), num_scales=2, mode=mode)
        return s, levels[0]

    def test_conv_weights_normalized_and_geometric(self, rng):
        """Rows of the conv operator sum to exactly 1 on real fine nodes,
        and a warped mesh yields genuinely non-uniform weights."""
        s, lv = self._level(rng)
        n = s.num_nodes
        _, rc = _fine_streams(s, lv)
        rowsum = np.asarray(lv.conv_self) + np.asarray(
            jax.ops.segment_sum(lv.conv_edge, jnp.asarray(rc),
                                num_segments=lv.fine_to_coarse.shape[0]))
        np.testing.assert_allclose(rowsum[:n], 1.0, rtol=1e-6)
        assert np.asarray(lv.conv_edge)[:2 * n].std() > 1e-4
        assert np.asarray(lv.edge_weights)[:2 * n].std() > 1e-4

    def test_rep_mask_selects_one_per_coarse_node(self, rng):
        s, lv = self._level(rng)
        reps = np.asarray(jax.ops.segment_sum(
            lv.rep_mask, lv.fine_to_coarse,
            num_segments=lv.num_coarse_nodes_pad))
        nc = int(lv.n_node)
        np.testing.assert_allclose(reps[:nc], 1.0)
        np.testing.assert_allclose(reps[nc:], 0.0)
        # bistride: the representative IS the kept fine node
        rep_rows = np.nonzero(np.asarray(lv.rep_mask))[0]
        assert len(rep_rows) == nc

    def test_down_preserves_constants(self, rng):
        from aero_gnn_tpu.models.bsms import wec_down

        s, lv = self._level(rng)
        n = s.num_nodes
        mask = np.zeros(lv.fine_to_coarse.shape[0], np.float32)
        mask[:n] = 1.0
        x = jnp.asarray(3.25 * mask[:, None] * np.ones((len(mask), 5),
                                                       np.float32))
        sd, rc = _fine_streams(s, lv)
        out = np.asarray(wec_down(lv, x, jnp.asarray(sd), jnp.asarray(rc)))
        nc = int(lv.n_node)
        np.testing.assert_allclose(out[:nc], 3.25, rtol=1e-5)

    def test_up_is_exact_adjoint_of_down(self, rng):
        from aero_gnn_tpu.models.bsms import wec_down, wec_up

        s, lv = self._level(rng)
        n, nc = s.num_nodes, int(lv.n_node)
        nf_pad = lv.fine_to_coarse.shape[0]
        x = np.zeros((nf_pad, 3), np.float32)
        x[:n] = rng.standard_normal((n, 3))
        y = np.zeros((lv.num_coarse_nodes_pad, 3), np.float32)
        y[:nc] = rng.standard_normal((nc, 3))
        sd_np, rc_np = _fine_streams(s, lv)
        sd, rc = jnp.asarray(sd_np), jnp.asarray(rc_np)
        down = np.asarray(wec_down(lv, jnp.asarray(x), sd, rc))
        yf = jnp.asarray(y).at[lv.fine_to_coarse].get(
            mode="promise_in_bounds")
        up = np.asarray(wec_up(lv, yf, sd, rc))
        np.testing.assert_allclose(float((down * y).sum()),
                                   float((up * x).sum()), rtol=1e-4)

    def test_weighted_differs_from_mean_and_trains(self, rng):
        """End-to-end through the Loader: bistride+weighted differs from
        mean, is padding-invariant in value, and yields finite nonzero
        grads through the custom-VJP transfer ops."""
        from aero_gnn_tpu.data.batching import Loader
        import dataclasses as dc

        s = self._sample(rng, warp=True)
        n = s.num_nodes
        cfg_mean = BSMSConfig(**tiny_mgn(do_concat_trick=True), num_scales=2,
                              layers_per_scale=1, hierarchy_mode="bistride",
                              transfer="mean")
        cfg_w = dc.replace(cfg_mean, transfer="weighted")
        params = cfg_mean.init(jax.random.PRNGKey(0))
        loader = Loader([s], 1, num_scales=2, hierarchy_mode="bistride")
        gb, aux = next(iter(loader))
        o_m = np.asarray(cfg_mean.apply(params, gb,
                                        hierarchy=aux["hierarchy"]))
        o_w = np.asarray(cfg_w.apply(params, gb, hierarchy=aux["hierarchy"]))
        assert np.isfinite(o_w).all()
        assert np.abs(o_m[:n] - o_w[:n]).max() > 1e-6

        def loss(p):
            out = cfg_w.apply(p, gb, hierarchy=aux["hierarchy"])
            return ((out - gb.y) ** 2 * gb.node_mask[:, None]).sum()

        grads = jax.grad(loss)(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def _fine_streams(s, lv):
    """Receiver-sorted FINE edge streams padded to the level's edge rows
    (GraphBatch convention: pad edges point at the last pad node, which
    keeps the receiver stream sorted; conv_edge is zero there)."""
    from aero_gnn_tpu.graph.padded import sort_edges_by_receiver

    perm = sort_edges_by_receiver(s.senders.astype(np.int64),
                                  s.receivers.astype(np.int64))
    nf_pad = lv.fine_to_coarse.shape[0]
    ef_pad = lv.edge_to_coarse.shape[0]
    sd = np.full(ef_pad, nf_pad - 1, np.int32)
    rc = np.full(ef_pad, nf_pad - 1, np.int32)
    sd[:len(perm)] = s.senders.astype(np.int64)[perm]
    rc[:len(perm)] = s.receivers.astype(np.int64)[perm]
    return sd, rc


def test_mgn_separate_decoders(rng):
    import dataclasses as dc
    cfg = MGNConfig(**tiny_mgn(do_concat_trick=True), separate_decoders=True)
    params = cfg.init(jax.random.PRNGKey(11))
    assert isinstance(params["decoder"], list) and len(params["decoder"]) == 4
    gb = padded.build_graph_batch(**small_mesh(rng))
    out = cfg.apply(params, gb)
    assert out.shape == (gb.num_nodes_pad, 4)
    assert np.isfinite(np.asarray(out)).all()


class TestBistrideOracle:
    """Independent oracle for the bistride BFS 2-coloring: BFS *distances*
    computed by boolean adjacency-matrix powers (a different algorithm from
    the production CSR BFS in graph.hierarchy._assign_bistride), plus the
    BSMS-GNN paper invariants. The in-tree reference only implements the
    stride stand-in, so this is the external check for bistride mode."""

    @staticmethod
    def _sample(n, seed):
        from aero_gnn_tpu.data.synthetic import make_random_mesh_sample
        return make_random_mesh_sample(n_nodes=n, seed=seed)

    @staticmethod
    def _oracle_kept(senders, receivers, n):
        """Kept set = nodes at even BFS distance from the per-component
        seed (min-degree, lowest index), via matrix powers."""
        A = np.zeros((n, n), dtype=bool)
        A[senders, receivers] = True
        deg = np.bincount(senders, minlength=n)
        dist = np.full(n, -1, dtype=np.int64)
        while (dist == -1).any():
            unv = np.nonzero(dist == -1)[0]
            seed = unv[np.lexsort((unv, deg[unv]))[0]]
            reach = np.zeros(n, dtype=bool)
            reach[seed] = True
            dist[seed] = 0
            d = 0
            while True:
                nxt = (A[reach].any(axis=0)) & ~reach
                nxt &= dist == -1
                if not nxt.any():
                    break
                d += 1
                dist[np.nonzero(nxt)[0]] = d
                reach |= nxt
        return np.nonzero(dist % 2 == 0)[0]

    def _assign(self, s, r, n):
        from aero_gnn_tpu.graph.hierarchy import _assign_bistride
        return _assign_bistride(np.asarray(s), np.asarray(r),
                                np.zeros(n, np.int64), n)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_kept_set_matches_matrix_power_oracle(self, seed):
        s = self._sample(120, seed)
        f2c, cng, rep = self._assign(s.senders, s.receivers, 120)
        kept = np.nonzero(np.asarray(rep) == 1.0)[0]
        oracle = self._oracle_kept(np.asarray(s.senders),
                                   np.asarray(s.receivers), 120)
        np.testing.assert_array_equal(kept, oracle)

    def test_kept_set_on_path_and_cycle(self):
        # path 0-1-2-...-9: seed = endpoint (deg 1, lowest index 0);
        # kept = even positions
        n = 10
        s = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        r = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        _, _, rep = self._assign(s, r, n)
        np.testing.assert_array_equal(np.nonzero(rep == 1.0)[0],
                                      np.arange(0, n, 2))
        # cycle of 8: seed 0, alternating levels around the ring
        n = 8
        s = np.concatenate([np.arange(n), (np.arange(n) + 1) % n])
        r = np.concatenate([(np.arange(n) + 1) % n, np.arange(n)])
        _, _, rep = self._assign(s, r, n)
        np.testing.assert_array_equal(np.nonzero(rep == 1.0)[0],
                                      np.array([0, 2, 4, 6]))

    @pytest.mark.parametrize("seed", [3, 4])
    def test_paper_invariants(self, seed):
        """Every dropped node is adjacent to a kept node (its BFS parent),
        every node maps to a kept node's coarse id, contraction preserves
        connectivity, and pooling roughly halves the node count."""
        from aero_gnn_tpu.graph.hierarchy import _coarse_edges

        n = 150
        smp = self._sample(n, seed)
        s, r = np.asarray(smp.senders), np.asarray(smp.receivers)
        f2c, cng, rep = self._assign(s, r, n)
        kept = np.nonzero(np.asarray(rep) == 1.0)[0]
        assert 0.25 * n <= len(kept) <= 0.75 * n
        adj = {v: set() for v in range(n)}
        for a, b in zip(s, r):
            adj[int(a)].add(int(b))
        kept_set = set(kept.tolist())
        for v in range(n):
            if v not in kept_set:
                assert adj[v] & kept_set, f"dropped node {v} has no kept nbr"
        # every coarse id is a kept node's id
        assert set(np.asarray(f2c).tolist()) == set(range(len(kept)))
        # contraction preserves the component structure exactly (random
        # meshes may be disconnected, so compare component COUNTS)
        def n_components(edges_s, edges_r, num):
            nbr = {v: set() for v in range(num)}
            for a, b in zip(np.asarray(edges_s), np.asarray(edges_r)):
                nbr[int(a)].add(int(b))
                nbr[int(b)].add(int(a))
            seen, comps = set(), 0
            for v0 in range(num):
                if v0 in seen:
                    continue
                comps += 1
                frontier = [v0]
                seen.add(v0)
                while frontier:
                    nxt = []
                    for v in frontier:
                        for u in nbr[v]:
                            if u not in seen:
                                seen.add(u)
                                nxt.append(u)
                    frontier = nxt
            return comps

        cs, cr, _ = _coarse_edges(s, r, np.asarray(f2c), len(kept))
        assert n_components(cs, cr, len(kept)) == n_components(s, r, n)


class TestRematVariants:
    """Gradient equivalence of the remat structures: per-layer (save_fused
    and full policies), grouped (sqrt-style, remat_group), and unrolled
    variants must all produce the no-remat gradients."""

    def _graph(self):
        rng = np.random.default_rng(0)
        n = 100
        s = np.arange(n, dtype=np.int32)
        r = (s + 1) % n
        senders = np.concatenate([s, r])
        receivers = np.concatenate([r, s])
        return padded.build_graph_batch(
            senders=senders, receivers=receivers,
            x=rng.standard_normal((n, 6)).astype(np.float32),
            edge_attr=rng.standard_normal((2 * n, 3)).astype(np.float32),
            pos=rng.standard_normal((n, 2)).astype(np.float32),
            y=rng.standard_normal((n, 4)).astype(np.float32))

    def _grads(self, gb, **cfg_kw):
        cfg = MGNConfig(
            input_node_dim=6, input_edge_dim=3, output_node_dim=4,
            processor_size=6, hidden_dim_processor=16,
            hidden_dim_node_encoder=16, hidden_dim_edge_encoder=16,
            hidden_dim_decoder=16, do_concat_trick=True,
            aggregation="add", **cfg_kw)
        params = cfg.init(jax.random.PRNGKey(0))

        def loss_fn(p):
            pred = cfg.apply(p, gb)
            m = gb.node_mask[:, None]
            return jnp.sum(jnp.square(pred - gb.y) * m) / jnp.sum(m)

        return jax.grad(loss_fn)(params)

    @pytest.mark.parametrize("kw", [
        dict(remat=True, remat_policy="save_fused"),
        dict(remat=True, remat_policy="full"),
        dict(remat=True, remat_group=3),
        dict(remat=True, remat_group=2, unroll=True),
        dict(remat=True, remat_group=3, remat_offload=True),
        dict(remat=True, remat_group=3, remat_group_policy="save_fused"),
        # partial inner policy (the 1M default, BENCH_REMAT_GROUP_POLICY
        # auto -> "save_fused:2"): sf inner on the first N groups, full
        # remat on the rest, outer loop forced unrolled
        dict(remat=True, remat_group=3, remat_group_policy="save_fused:1"),
        dict(remat=False, unroll=True),
    ])
    def test_grads_match_no_remat(self, kw):
        gb = self._graph()
        g0 = self._grads(gb, remat=False)
        g1 = self._grads(gb, **kw)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
        assert max(jax.tree.leaves(diffs)) < 1e-5

    def test_remat_group_must_divide_layers(self):
        gb = self._graph()
        with pytest.raises(ValueError, match="remat_group"):
            self._grads(gb, remat=True, remat_group=4)

    def test_remat_offload_requires_grouping(self):
        gb = self._graph()
        with pytest.raises(ValueError, match="remat_offload"):
            self._grads(gb, remat=True, remat_offload=True)
