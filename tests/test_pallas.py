"""Pallas kernel tests (interpret mode on CPU; real compilation on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from aero_gnn_tpu import ops
from aero_gnn_tpu.graph import padded
from aero_gnn_tpu.ops.pallas_segment import segment_agg_pallas, derive_tiles

from np_oracle import scatter_add, scatter_mean


@pytest.fixture
def aligned_graph():
    rng = np.random.default_rng(3)
    n, e = 300, 1500
    g = dict(senders=rng.integers(0, n, e), receivers=rng.integers(0, n, e),
             x=rng.standard_normal((n, 4)).astype(np.float32),
             edge_attr=rng.standard_normal((e, 8)).astype(np.float32),
             pos=rng.standard_normal((n, 2)).astype(np.float32))
    gb = padded.build_graph_batch(**g, align_edges=True)
    return g, gb


def test_derive_tiles_matches_host(aligned_graph):
    g, gb = aligned_graph
    tb, tf = derive_tiles(gb.receivers)
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(gb.tile_block))
    np.testing.assert_array_equal(np.asarray(tf), np.asarray(gb.tile_first))


def test_pallas_segment_sum_matches_oracle(aligned_graph):
    g, gb = aligned_graph
    with pltpu.force_tpu_interpret_mode():
        out = segment_agg_pallas(gb.edge_attr, gb.receivers,
                                 gb.num_nodes_pad, aggregation="add",
                                 mask=gb.edge_mask)
    perm = padded.sort_edges_by_receiver(g["senders"], g["receivers"])
    expect = scatter_add(g["edge_attr"][perm], g["receivers"][perm], 300)
    np.testing.assert_allclose(np.asarray(out)[:300], expect,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[300:], 0.0, atol=1e-6)


def test_pallas_segment_sum_weighted_matches_oracle(aligned_graph):
    from aero_gnn_tpu.ops.pallas_segment import segment_agg_weighted_pallas

    g, gb = aligned_graph
    rng = np.random.default_rng(3)
    w = (rng.standard_normal(gb.num_edges_pad).astype(np.float32)
         * np.asarray(gb.edge_mask))
    with pltpu.force_tpu_interpret_mode():
        out = segment_agg_weighted_pallas(gb.edge_attr, jnp.asarray(w),
                                          gb.receivers, gb.num_nodes_pad)
    expect = scatter_add(np.asarray(gb.edge_attr) * w[:, None],
                         np.asarray(gb.receivers), gb.num_nodes_pad)
    np.testing.assert_allclose(np.asarray(out), expect[:gb.num_nodes_pad],
                               rtol=1e-4, atol=1e-4)
    # gradient rides the sorted-gather VJP
    with pltpu.force_tpu_interpret_mode():
        def f(m):
            return jnp.sum(segment_agg_weighted_pallas(
                m, jnp.asarray(w), gb.receivers, gb.num_nodes_pad) ** 2)

        gr = jax.grad(f)(gb.edge_attr)
    def f_ref(m):
        s = scatter_add(m * w[:, None], np.asarray(gb.receivers),
                        gb.num_nodes_pad)
        return (s ** 2).sum()
    import numpy.testing as npt
    eps = 1e-3
    m0 = np.asarray(gb.edge_attr, np.float64)
    probe = [(0, 0), (7, 1), (131, 2)]
    for (i, j) in probe:
        mp = m0.copy(); mp[i, j] += eps
        mm = m0.copy(); mm[i, j] -= eps
        fd = (f_ref(mp) - f_ref(mm)) / (2 * eps)
        npt.assert_allclose(np.asarray(gr)[i, j], fd, rtol=1e-2, atol=1e-3)

    # dual-stream kernel (segment_agg_weighted2_pallas, the pair-batching
    # probe) matches two single-stream invocations
    from aero_gnn_tpu.ops.pallas_segment import segment_agg_weighted2_pallas
    w2 = (rng.standard_normal(gb.num_edges_pad).astype(np.float32)
          * np.asarray(gb.edge_mask))
    m2 = jnp.asarray(
        rng.standard_normal(gb.edge_attr.shape).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        d1, d2 = segment_agg_weighted2_pallas(
            gb.edge_attr, jnp.asarray(w), m2, jnp.asarray(w2),
            gb.receivers, gb.num_nodes_pad)
        s2 = segment_agg_weighted_pallas(m2, jnp.asarray(w2),
                                         gb.receivers, gb.num_nodes_pad)
    npt.assert_allclose(np.asarray(d1), np.asarray(out), rtol=1e-4,
                        atol=1e-4)
    npt.assert_allclose(np.asarray(d2), np.asarray(s2), rtol=1e-4,
                        atol=1e-4)

    # weight gradients agree with the XLA fallback's autodiff (ADVICE r4:
    # the Pallas VJP must not silently return zero for d_w)
    from aero_gnn_tpu.ops import scatter as S

    def g_pallas(wv):
        return jnp.sum(segment_agg_weighted_pallas(
            gb.edge_attr, wv, gb.receivers, gb.num_nodes_pad) ** 2)

    def g_xla(wv):
        s = S.segment_sum_sorted(
            gb.edge_attr * wv[:, None].astype(gb.edge_attr.dtype),
            gb.receivers, gb.num_nodes_pad)
        return jnp.sum(s ** 2)

    with pltpu.force_tpu_interpret_mode():
        dw_p = jax.grad(g_pallas)(jnp.asarray(w))
    dw_x = jax.grad(g_xla)(jnp.asarray(w))
    npt.assert_allclose(np.asarray(dw_p), np.asarray(dw_x),
                        rtol=1e-3, atol=1e-3)


def test_pallas_segment_mean_matches_oracle(aligned_graph):
    g, gb = aligned_graph
    with pltpu.force_tpu_interpret_mode():
        out = segment_agg_pallas(gb.edge_attr, gb.receivers,
                                 gb.num_nodes_pad, aggregation="mean",
                                 mask=gb.edge_mask)
    perm = padded.sort_edges_by_receiver(g["senders"], g["receivers"])
    expect = scatter_mean(g["edge_attr"][perm], g["receivers"][perm], 300)
    np.testing.assert_allclose(np.asarray(out)[:300], expect,
                               rtol=1e-4, atol=1e-4)


def test_pallas_segment_sum_grad(aligned_graph):
    g, gb = aligned_graph
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (gb.num_nodes_pad, 8)).astype(np.float32))

    def f_pallas(msgs):
        with pltpu.force_tpu_interpret_mode():
            out = segment_agg_pallas(msgs, gb.receivers, gb.num_nodes_pad,
                                     aggregation="add", mask=gb.edge_mask)
        return jnp.sum(out * w)

    def f_xla(msgs):
        return jnp.sum(ops.segment_sum(msgs, gb.receivers, gb.num_nodes_pad,
                                       mask=gb.edge_mask) * w)

    g1 = jax.grad(f_pallas)(gb.edge_attr)
    g2 = jax.grad(f_xla)(gb.edge_attr)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_pallas_backend_full_model(aligned_graph):
    """Whole MGN forward with ops backend = pallas equals the XLA backend."""
    from aero_gnn_tpu.models.mgn import MGNConfig
    g, gb = aligned_graph
    cfg = MGNConfig(input_node_dim=4, input_edge_dim=8, output_node_dim=3,
                    processor_size=2, hidden_dim_processor=16,
                    hidden_dim_node_encoder=16, hidden_dim_edge_encoder=16,
                    hidden_dim_decoder=16, do_concat_trick=True)
    params = cfg.init(jax.random.PRNGKey(0))
    ref = np.asarray(cfg.apply(params, gb))
    with pltpu.force_tpu_interpret_mode():
        with ops.use_backend("pallas"):
            out = np.asarray(cfg.apply(params, gb))
    np.testing.assert_allclose(out[:300], ref[:300], rtol=2e-4, atol=2e-4)


def test_loader_pallas_backend_fixed_shapes_and_training():
    """Loader auto-aligns under the pallas backend; shapes stay fixed across
    batches and a train step learns (interpret mode)."""
    import optax
    from aero_gnn_tpu.data import dataset as D
    from aero_gnn_tpu.data.batching import Loader
    from aero_gnn_tpu.data.synthetic import make_airfoil_dataset
    from aero_gnn_tpu.models.mgn import MGNConfig
    from aero_gnn_tpu.training.loop import masked_mse, make_optimizer

    samples = make_airfoil_dataset(n_cases=6, n_points=48, seed=5)
    D.compute_features(samples, ["mach", "alpha"])
    with ops.use_backend("pallas"):
        loader = Loader(samples, batch_size=2, shuffle=True)
        shapes = set()
        for gb, _ in loader:
            shapes.add((gb.num_nodes_pad, gb.num_edges_pad))
            assert gb.num_nodes_pad % padded.ALIGN_NODE_BLOCK == 0
            assert gb.num_edges_pad % padded.ALIGN_EDGE_TILE == 0
        assert len(shapes) == 1

        # remat=False: interpret-mode pallas_call is an io_callback, which
        # jax.checkpoint cannot trace (real TPU compilation has no issue)
        cfg = MGNConfig(input_node_dim=6, input_edge_dim=3,
                        output_node_dim=4, processor_size=1,
                        hidden_dim_processor=16, hidden_dim_node_encoder=16,
                        hidden_dim_edge_encoder=16, hidden_dim_decoder=16,
                        do_concat_trick=True, remat=False)
        params = cfg.init(jax.random.PRNGKey(0))
        opt = make_optimizer(1e-3)
        ost = opt.init(params)

        def step(p, o, g):
            def loss_fn(q):
                return masked_mse(cfg.apply(q, g), g.y, g.node_mask)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            up, o = opt.update(grads, o, p)
            return optax.apply_updates(p, up), o, loss

        with pltpu.force_tpu_interpret_mode():
            losses = []
            for _ in range(3):
                for gb, _ in loader:
                    params, ost, loss = step(params, ost, gb)
                    losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


def test_pallas_gather_receivers_and_grad(aligned_graph):
    g, gb = aligned_graph
    from aero_gnn_tpu.ops.pallas_segment import gather_receivers_pallas
    nodes = jnp.asarray(np.random.default_rng(2).standard_normal(
        (gb.num_nodes_pad, 8)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        out = gather_receivers_pallas(nodes, gb.receivers)
    expect = np.asarray(nodes)[np.asarray(gb.receivers)]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)

    w = jnp.asarray(np.random.default_rng(3).standard_normal(
        (gb.num_edges_pad, 8)).astype(np.float32))

    def f_pallas(nodes):
        return jnp.sum(gather_receivers_pallas(nodes, gb.receivers) * w)

    with pltpu.force_tpu_interpret_mode():  # covers the backward kernel too
        g1 = jax.grad(f_pallas)(nodes)
    g2 = jax.grad(lambda n: jnp.sum(n[gb.receivers] * w))(nodes)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


class TestFusedEdgeLayer:
    def _params(self, h=16, n_hidden=2, seed=0):
        rng = np.random.default_rng(seed)
        f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
        return dict(w_e=f(h, h), ws=f(n_hidden, h, h), bs=f(n_hidden, h),
                    w_out=f(h, h), b_out=f(h), ln_scale=jnp.ones(h),
                    ln_bias=jnp.zeros(h))

    def test_fused_matches_equivalent(self, aligned_graph):
        from aero_gnn_tpu.ops import pallas_fused as PF
        g, gb = aligned_graph
        h = 16
        rng = np.random.default_rng(5)
        E, N = gb.num_edges_pad, gb.num_nodes_pad
        e = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32))
        sg = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32))
        d_proj = jnp.asarray(rng.standard_normal((N, h)).astype(np.float32))
        p = self._params(h)
        args = (e, sg, d_proj, gb.edge_mask, gb.receivers, p["w_e"], p["ws"],
                p["bs"], p["w_out"], p["b_out"], p["ln_scale"], p["ln_bias"])
        with pltpu.force_tpu_interpret_mode():
            e2, agg = PF.fused_edge_layer(*args, N, "relu")
        e2_ref, agg_ref = PF._equiv(*args, num_nodes=N)
        np.testing.assert_allclose(np.asarray(e2), np.asarray(e2_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(agg), np.asarray(agg_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_fused_grads_match_equivalent(self, aligned_graph):
        from aero_gnn_tpu.ops import pallas_fused as PF
        g, gb = aligned_graph
        h = 16
        rng = np.random.default_rng(6)
        E, N = gb.num_edges_pad, gb.num_nodes_pad
        e = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32))
        sg = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32))
        d_proj = jnp.asarray(rng.standard_normal((N, h)).astype(np.float32))
        p = self._params(h, seed=7)
        wn = jnp.asarray(rng.standard_normal((N, h)).astype(np.float32))
        we_ = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32))

        def loss_fused(e, w_e):
            e2, agg = PF.fused_edge_layer(
                e, sg, d_proj, gb.edge_mask, gb.receivers, w_e, p["ws"],
                p["bs"], p["w_out"], p["b_out"], p["ln_scale"],
                p["ln_bias"], N, "relu")
            return jnp.sum(e2 * we_) + jnp.sum(agg * wn)

        def loss_ref(e, w_e):
            e2, agg = PF._equiv(
                e, sg, d_proj, gb.edge_mask, gb.receivers, w_e, p["ws"],
                p["bs"], p["w_out"], p["b_out"], p["ln_scale"],
                p["ln_bias"], num_nodes=N)
            return jnp.sum(e2 * we_) + jnp.sum(agg * wn)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_fused, argnums=(0, 1))(e, p["w_e"])
        g2 = jax.grad(loss_ref, argnums=(0, 1))(e, p["w_e"])
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_full_model_fused_path_matches_xla(self, aligned_graph):
        from aero_gnn_tpu.models.mgn import MGNConfig
        g, gb = aligned_graph
        cfg = MGNConfig(input_node_dim=4, input_edge_dim=8,
                        output_node_dim=3, processor_size=2,
                        hidden_dim_processor=16, hidden_dim_node_encoder=16,
                        hidden_dim_edge_encoder=16, hidden_dim_decoder=16,
                        num_hidden_layers_edge_processor=2,
                        do_concat_trick=True, remat=False)
        params = cfg.init(jax.random.PRNGKey(21))
        ref = np.asarray(cfg.apply(params, gb))
        with pltpu.force_tpu_interpret_mode():
            with ops.use_backend("pallas"):
                out = np.asarray(cfg.apply(params, gb))
        np.testing.assert_allclose(out[:300], ref[:300], rtol=3e-4,
                                   atol=3e-4)

    def test_fused_backward_kernel_matches_autodiff(self, aligned_graph):
        """The fused backward kernel vs jax.vjp of the jnp equivalent."""
        from aero_gnn_tpu.ops import pallas_fused as PF
        g, gb = aligned_graph
        h = 16
        rng = np.random.default_rng(8)
        E, N = gb.num_edges_pad, gb.num_nodes_pad
        e = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32))
        sg = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32))
        d_proj = jnp.asarray(rng.standard_normal((N, h)).astype(np.float32))
        p = self._params(h, seed=9)
        ct_e = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32))
        ct_agg = jnp.asarray(rng.standard_normal((N, h)).astype(np.float32))

        with pltpu.force_tpu_interpret_mode():
            grads_fused = PF._fused_bwd(
                e, sg, d_proj, gb.edge_mask, gb.receivers, p["w_e"], p["ws"],
                p["bs"], p["w_out"], p["b_out"], p["ln_scale"],
                p["ln_bias"], N, (ct_e, ct_agg))

        _, vjp = jax.vjp(
            lambda *a: PF._equiv(*a, num_nodes=N),
            e, sg, d_proj, gb.edge_mask, gb.receivers, p["w_e"], p["ws"],
            p["bs"], p["w_out"], p["b_out"], p["ln_scale"], p["ln_bias"])
        grads_ref = vjp((ct_e, ct_agg))

        names = ["d_e", "d_sg", "d_dproj", "mask", "recv", "dw_e", "dws",
                 "dbs", "dw_out", "db_out", "dscale", "dbias"]
        for name, gf, gr in zip(names, grads_fused, grads_ref):
            if gf is None:
                continue
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=5e-4, atol=5e-4,
                err_msg=name)


def test_unaligned_divisible_graph_is_safe_under_pallas_backend():
    """A graph whose padded sizes happen to divide NB/ET but that was NOT
    built with align_edges must not be routed to the Pallas kernels (a tile
    spanning two node blocks would silently drop contributions). The model
    must produce identical results under both backends."""
    from aero_gnn_tpu.models.mgn import MGNConfig

    rng = np.random.default_rng(11)
    n_real = padded.ALIGN_NODE_BLOCK * 2 - 7
    e_real = padded.ALIGN_EDGE_TILE * 3 - 5
    g = dict(senders=rng.integers(0, n_real, e_real),
             receivers=rng.integers(0, n_real, e_real),
             x=rng.standard_normal((n_real, 4)).astype(np.float32),
             edge_attr=rng.standard_normal((e_real, 3)).astype(np.float32),
             pos=rng.standard_normal((n_real, 2)).astype(np.float32))
    gb = padded.build_graph_batch(
        **g, num_nodes_pad=padded.ALIGN_NODE_BLOCK * 2,
        num_edges_pad=padded.ALIGN_EDGE_TILE * 3)
    # the hazard precondition: divisible but NOT aligned
    assert gb.num_nodes_pad % padded.ALIGN_NODE_BLOCK == 0
    assert gb.num_edges_pad % padded.ALIGN_EDGE_TILE == 0
    assert not gb.edges_aligned

    cfg = MGNConfig(input_node_dim=4, input_edge_dim=3, output_node_dim=2,
                    processor_size=2, hidden_dim_processor=16,
                    hidden_dim_node_encoder=16, hidden_dim_edge_encoder=16,
                    hidden_dim_decoder=16, do_concat_trick=True, remat=False)
    params = cfg.init(jax.random.PRNGKey(3))
    ref = np.asarray(cfg.apply(params, gb))
    with pltpu.force_tpu_interpret_mode():
        with ops.use_backend("pallas"):
            out = np.asarray(cfg.apply(params, gb))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_align_hierarchy_balanced_three_scales_matches_plain():
    """Deep (3-scale) aligned hierarchy with degree-balanced coarse
    relabeling must reproduce the plain-layout BSMS forward, and the
    balancing must actually raise coarse edge-tile fill. Exercises the
    cross-level re-indexing (prev_node_map / prev_src chaining) that a
    2-scale hierarchy never touches."""
    from aero_gnn_tpu.data import dataset as D
    from aero_gnn_tpu.data.synthetic import make_random_mesh_sample
    from aero_gnn_tpu.graph import hierarchy as H
    from aero_gnn_tpu.graph.padded import bucket_size
    from aero_gnn_tpu.models.bsms import BSMSConfig

    s = make_random_mesh_sample(n_nodes=4096, avg_degree=6, seed=5)
    D.compute_features([s], ["mach", "alpha"])
    mesh = dict(senders=s.senders, receivers=s.receivers, x=s.x,
                edge_attr=s.edge_attr, pos=s.pos, y=s.y)
    np_pad = padded._round_up(s.num_nodes + 1, 512)
    g_plain = padded.build_graph_batch(**mesh, num_nodes_pad=np_pad)
    g_al, amap = padded.build_graph_batch(
        **mesh, num_nodes_pad=np_pad, align_edges=True,
        return_align_map=True)
    real = H.build_hierarchy_real(
        senders=s.senders, receivers=s.receivers,
        node_graph=np.zeros(s.num_nodes, np.int64), num_nodes=s.num_nodes,
        pos=s.pos.astype(np.float64), num_scales=3, mode="bistride")
    plan = [(bucket_size(lv["num_nodes"] + 1), bucket_size(lv["num_edges"]))
            for lv in real]
    lv_plain = H.collate_hierarchies(
        [real], num_fine_nodes_pad=g_plain.num_nodes_pad,
        num_fine_edges_pad=g_plain.num_edges_pad, pad_plan=plan)
    lv_base = H.collate_hierarchies(
        [real], num_fine_nodes_pad=g_al.num_nodes_pad,
        num_fine_edges_pad=g_al.num_edges_pad, pad_plan=plan)

    cfg = BSMSConfig(input_node_dim=6, input_edge_dim=3, output_node_dim=4,
                     processor_size=5, num_scales=3,
                     hidden_dim_processor=16, hidden_dim_node_encoder=16,
                     hidden_dim_edge_encoder=16, hidden_dim_decoder=16,
                     do_concat_trick=True, remat=False,
                     hierarchy_mode="bistride")
    params = cfg.init(jax.random.PRNGKey(7))
    nm = np.asarray(g_plain.node_mask) > 0
    ref = np.asarray(cfg.apply(params, g_plain, hierarchy=tuple(lv_plain)))

    unbal = H.align_hierarchy(lv_base, amap, balance_blocks=False)
    bal = H.align_hierarchy(lv_base, amap, balance_blocks=True)
    for al in (unbal, bal):
        assert all(lv.edges_aligned for lv in al)
        out = np.asarray(cfg.apply(params, g_al, hierarchy=tuple(al)))
        np.testing.assert_allclose(out[nm], ref[nm], rtol=2e-5, atol=2e-5)
    for s_idx in range(2):
        fill_u = int(unbal[s_idx].n_edge) / unbal[s_idx].num_coarse_edges_pad
        fill_b = int(bal[s_idx].n_edge) / bal[s_idx].num_coarse_edges_pad
        assert fill_b >= fill_u

    # transfer="weighted" (WeightedEdgeConv): the conv/rep artifacts must
    # survive the cross-level re-indexing (conv_edge follows prev_src,
    # rep/conv_self follow prev_node_map) bitwise-correctly too
    import dataclasses as _dc
    cfg_w = _dc.replace(cfg, transfer="weighted")
    ref_w = np.asarray(cfg_w.apply(params, g_plain, hierarchy=tuple(lv_plain)))
    assert np.abs(ref_w[nm] - ref[nm]).max() > 1e-6  # weighted != mean
    for al in (unbal, bal):
        out_w = np.asarray(cfg_w.apply(params, g_al, hierarchy=tuple(al)))
        np.testing.assert_allclose(out_w[nm], ref_w[nm], rtol=2e-5, atol=2e-5)


def test_bsms_aligned_loader_matches_plain_and_pallas():
    """BSMS over an aligned loader (hierarchy level-0 re-indexed via
    realign_level0) must equal the plain-layout result; under the pallas
    backend the fused kernels then run on the fine scale."""
    from aero_gnn_tpu.data import dataset as D
    from aero_gnn_tpu.data.batching import Loader
    from aero_gnn_tpu.data.synthetic import make_airfoil_dataset
    from aero_gnn_tpu.models.bsms import BSMSConfig

    samples = make_airfoil_dataset(n_cases=2, n_points=64, seed=9)
    D.compute_features(samples, ["mach", "alpha"])
    cfg = BSMSConfig(input_node_dim=6, input_edge_dim=3, output_node_dim=4,
                     processor_size=4, num_scales=2,
                     hidden_dim_processor=16, hidden_dim_node_encoder=16,
                     hidden_dim_edge_encoder=16, hidden_dim_decoder=16,
                     do_concat_trick=True, remat=False)
    params = cfg.init(jax.random.PRNGKey(4))

    def run(loader, backend):
        outs = []
        with ops.use_backend(backend):
            for gb, aux in loader:
                out = cfg.apply(params, gb, hierarchy=aux["hierarchy"])
                n = int(gb.n_node)
                outs.append(np.asarray(out)[:n])
        return np.concatenate(outs)

    plain = Loader(samples, batch_size=2, num_scales=2, align_edges=False)
    aligned = Loader(samples, batch_size=2, num_scales=2, align_edges=True)
    assert next(iter(aligned))[0].edges_aligned
    ref = run(plain, "xla")
    out_aligned = run(aligned, "xla")
    np.testing.assert_allclose(out_aligned, ref, rtol=1e-5, atol=1e-5)
    with pltpu.force_tpu_interpret_mode():
        out_pallas = run(aligned, "pallas")
    np.testing.assert_allclose(out_pallas, ref, rtol=3e-4, atol=3e-4)

    # flagship transfer="weighted" end-to-end under the pallas backend:
    # exercises the fused WEC dispatch (ops.aggregate_edges_weighted, A
    # and the sender-sorted A^T stream) through the aligned loader, not
    # just the kernel-level oracle (ADVICE r4).
    import dataclasses as _dc
    cfg_w = _dc.replace(cfg, transfer="weighted",
                        hierarchy_mode="bistride")
    plain_b = Loader(samples, batch_size=2, num_scales=2,
                     hierarchy_mode="bistride", align_edges=False)
    aligned_b = Loader(samples, batch_size=2, num_scales=2,
                       hierarchy_mode="bistride", align_edges=True)

    def run_w(loader, backend):
        outs = []
        with ops.use_backend(backend):
            for gb, aux in loader:
                out = cfg_w.apply(params, gb, hierarchy=aux["hierarchy"])
                outs.append(np.asarray(out)[:int(gb.n_node)])
        return np.concatenate(outs)

    ref_w = run_w(plain_b, "xla")
    assert np.abs(ref_w - ref).max() > 1e-6  # weighted != mean
    with pltpu.force_tpu_interpret_mode():
        out_w = run_w(aligned_b, "pallas")
    np.testing.assert_allclose(out_w, ref_w, rtol=3e-4, atol=3e-4)


class TestFusedNodeLayer:
    def _data(self, n=512, h=16, n_hidden=2, seed=11):
        rng = np.random.default_rng(seed)
        f = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * 0.1)
        x = f(n, h) * 10
        agg = f(n, h) * 10
        p = dict(w1x=f(h, h), w1a=f(h, h), b1=f(h), ws=f(n_hidden, h, h),
                 bs=f(n_hidden, h), w_out=f(h, h), b_out=f(h),
                 ln_scale=jnp.ones(h), ln_bias=jnp.zeros(h))
        return x, agg, p

    def test_fused_node_matches_equivalent(self):
        from aero_gnn_tpu.ops import pallas_node as PN
        x, agg, p = self._data()
        args = (x, agg, p["w1x"], p["w1a"], p["b1"], p["ws"], p["bs"],
                p["w_out"], p["b_out"], p["ln_scale"], p["ln_bias"])
        with pltpu.force_tpu_interpret_mode():
            out = PN.fused_node_layer(*args)
        ref = PN._equiv(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_fused_node_no_hidden(self):
        from aero_gnn_tpu.ops import pallas_node as PN
        x, agg, p = self._data(n=256, n_hidden=2)
        args = (x, agg, p["w1x"], p["w1a"], p["b1"],
                jnp.zeros((0, 16, 16)), jnp.zeros((0, 16)),
                p["w_out"], p["b_out"], p["ln_scale"], p["ln_bias"])
        with pltpu.force_tpu_interpret_mode():
            out = PN.fused_node_layer(*args)
        ref = PN._equiv(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_fused_node_grads_match_equivalent(self):
        from aero_gnn_tpu.ops import pallas_node as PN
        x, agg, p = self._data(seed=12)
        probe = jnp.asarray(
            np.random.default_rng(13).standard_normal(x.shape)
            .astype(np.float32))
        argnames = ["w1x", "w1a", "b1", "ws", "bs", "w_out", "b_out",
                    "ln_scale", "ln_bias"]

        def loss(fn, x, agg, *weights):
            return jnp.sum(fn(x, agg, *weights) * probe)

        weights = tuple(p[k] for k in argnames)
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(lambda *a: loss(PN.fused_node_layer, *a),
                          argnums=tuple(range(len(weights) + 2)))(
                x, agg, *weights)
        g2 = jax.grad(lambda *a: loss(PN._equiv, *a),
                      argnums=tuple(range(len(weights) + 2)))(
            x, agg, *weights)
        for a, b, name in zip(g1, g2, ["x", "agg"] + argnames):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"grad mismatch for {name}")

    def test_mgn_layer_routes_to_fused_node(self, aligned_graph, monkeypatch):
        """Full fused MGN layer (edge kernel + node kernel) still matches
        the unfused XLA composition."""
        from aero_gnn_tpu.nn import blocks as B
        g, gb = aligned_graph
        h = 16
        cfg = B.MGNLayerConfig(node_dim=h, edge_dim=h, hidden_dim=h,
                               num_hidden_layers_node=2,
                               num_hidden_layers_edge=2,
                               do_concat_trick=True)
        params = B.mgn_layer_init(jax.random.PRNGKey(2), cfg)
        rng = np.random.default_rng(21)
        x = jnp.asarray(rng.standard_normal(
            (gb.num_nodes_pad, h)).astype(np.float32))
        e = jnp.asarray(rng.standard_normal(
            (gb.num_edges_pad, h)).astype(np.float32))
        args = (params, cfg, x, e, gb.senders, gb.receivers, gb.edge_mask,
                gb.sender_perm, gb.senders_sorted, True)
        with ops.use_backend("xla"):
            x_ref, e_ref = B.mgn_layer_apply(*args)
        with ops.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
            assert B._fused_node_ok(params["node"], cfg, x)
            x_out, e_out = B.mgn_layer_apply(*args)
        np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref),
                                   rtol=3e-4, atol=3e-4)
        # pad-edge rows of the fused kernel carry masked-gather garbage by
        # design (never observable); compare real edges only
        real = np.asarray(gb.edge_mask) > 0
        np.testing.assert_allclose(np.asarray(e_out)[real],
                                   np.asarray(e_ref)[real],
                                   rtol=3e-4, atol=3e-4)


class TestFusedMGNLayer:
    """Single-kernel full layer (ops.pallas_mega): edge update + per-block
    node epilogue, fwd + backward (node bwd at block start, VMEM d_agg)."""

    def _data(self, gb, h=16, seed=31):
        rng = np.random.default_rng(seed)
        f = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * 0.1)
        E, N = gb.num_edges_pad, gb.num_nodes_pad
        e = f(E, h) * 10
        sg = f(E, h) * 10
        d_proj = f(N, h) * 10
        x = f(N, h) * 10
        ep = dict(w_e=f(h, h), ws=f(2, h, h), bs=f(2, h), w_out=f(h, h),
                  b_out=f(h), ln_scale=jnp.ones(h), ln_bias=jnp.zeros(h))
        npar = dict(w1x=f(h, h), w1a=f(h, h), b1=f(h), ws=f(2, h, h),
                    bs=f(2, h), w_out=f(h, h), b_out=f(h),
                    ln_scale=jnp.ones(h), ln_bias=jnp.zeros(h))
        return e, sg, d_proj, x, ep, npar

    def test_mega_matches_equivalent(self, aligned_graph):
        from aero_gnn_tpu.ops import pallas_mega as PM
        g, gb = aligned_graph
        e, sg, d_proj, x, ep, npar = self._data(gb)
        N = gb.num_nodes_pad
        with pltpu.force_tpu_interpret_mode():
            x2, e2 = PM.fused_mgn_layer(e, sg, d_proj, x, gb.edge_mask,
                                        gb.receivers, ep, npar, N)
        x2_ref, e2_ref = PM._equiv(e, sg, d_proj, x, gb.edge_mask,
                                   gb.receivers, ep, npar, N)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x2_ref),
                                   rtol=1e-4, atol=1e-4)
        real = np.asarray(gb.edge_mask) > 0
        np.testing.assert_allclose(np.asarray(e2)[real],
                                   np.asarray(e2_ref)[real],
                                   rtol=1e-4, atol=1e-4)

    def test_mega_grads_match_equivalent(self, aligned_graph):
        from aero_gnn_tpu.ops import pallas_mega as PM
        g, gb = aligned_graph
        e, sg, d_proj, x, ep, npar = self._data(gb, seed=32)
        N = gb.num_nodes_pad
        rng = np.random.default_rng(33)
        px = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
        pe = jnp.asarray(rng.standard_normal(e.shape).astype(np.float32))
        # pad-edge rows of e' are unobservable by contract: mask the probe
        pe = pe * gb.edge_mask[:, None]

        def loss(fn, e, sg, d_proj, x, ep, npar):
            x2, e2 = fn(e, sg, d_proj, x, gb.edge_mask, gb.receivers,
                        ep, npar, N)
            return jnp.sum(x2 * px) + jnp.sum(e2 * pe)

        argnums = (0, 1, 2, 3, 4, 5)
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(lambda *a: loss(PM.fused_mgn_layer, *a),
                          argnums=argnums)(e, sg, d_proj, x, ep, npar)
        g2 = jax.grad(lambda *a: loss(
            lambda *b: PM._equiv(*b[:-1], num_nodes=b[-1]), *a),
            argnums=argnums)(e, sg, d_proj, x, ep, npar)
        names = ["e", "sg", "d_proj", "x", "ep", "npar"]
        for a, b, name in zip(g1, g2, names):
            fa = jax.tree_util.tree_leaves(a)
            fb = jax.tree_util.tree_leaves(b)
            for va, vb in zip(fa, fb):
                np.testing.assert_allclose(
                    np.asarray(va), np.asarray(vb), rtol=3e-4, atol=3e-4,
                    err_msg=f"grad mismatch for {name}")


@pytest.mark.parametrize("mode", ["0", "1", "2"])
def test_fused_edge_layer_ln_modes_match(aligned_graph, monkeypatch, mode):
    """All AERO_GNN_LN_MXU modes (VPU lane means / all-MXU / mixed) compute
    the same LayerNorm fwd + bwd up to reassociation."""
    from aero_gnn_tpu.ops import pallas_fused as PF
    monkeypatch.setenv("AERO_GNN_LN_MXU", mode)
    g, gb = aligned_graph
    h = 16
    rng = np.random.default_rng(41)
    E, N = gb.num_edges_pad, gb.num_nodes_pad
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    e, sg, d_proj = f(E, h) * 10, f(E, h) * 10, f(N, h) * 10
    p = dict(w_e=f(h, h), ws=f(2, h, h), bs=f(2, h), w_out=f(h, h),
             b_out=f(h), ln_scale=jnp.ones(h), ln_bias=jnp.zeros(h))
    args = (e, sg, d_proj, gb.edge_mask, gb.receivers, p["w_e"], p["ws"],
            p["bs"], p["w_out"], p["b_out"], p["ln_scale"], p["ln_bias"])
    pn = jnp.asarray(rng.standard_normal((N, h)).astype(np.float32))
    pe = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32)) \
        * gb.edge_mask[:, None]

    def loss(fn, e, w_e):
        e2, agg = fn(e, sg, d_proj, gb.edge_mask, gb.receivers, w_e,
                     p["ws"], p["bs"], p["w_out"], p["b_out"],
                     p["ln_scale"], p["ln_bias"], N, "relu")
        return jnp.sum(e2 * pe) + jnp.sum(agg * pn)

    with pltpu.force_tpu_interpret_mode():
        v1, g1 = jax.value_and_grad(
            lambda *a: loss(PF.fused_edge_layer, *a), argnums=(0, 1))(
            e, p["w_e"])
    v2, g2 = jax.value_and_grad(
        lambda *a: loss(lambda *b: PF._equiv(*b[:12], num_nodes=b[12]), *a),
        argnums=(0, 1))(e, p["w_e"])
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_mgn_layer_routes_to_mega(aligned_graph, monkeypatch):
    """AERO_GNN_MEGA=1 routes mgn_layer_apply through the single-kernel
    full layer (blocks.py packing included) and matches the XLA path."""
    from aero_gnn_tpu.nn import blocks as B
    monkeypatch.setenv("AERO_GNN_MEGA", "1")
    g, gb = aligned_graph
    h = 16
    cfg = B.MGNLayerConfig(node_dim=h, edge_dim=h, hidden_dim=h,
                           num_hidden_layers_node=2,
                           num_hidden_layers_edge=2,
                           do_concat_trick=True)
    params = B.mgn_layer_init(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.standard_normal(
        (gb.num_nodes_pad, h)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal(
        (gb.num_edges_pad, h)).astype(np.float32))
    args = (params, cfg, x, e, gb.senders, gb.receivers, gb.edge_mask,
            gb.sender_perm, gb.senders_sorted, True)
    with ops.use_backend("xla"):
        x_ref, e_ref = B.mgn_layer_apply(*args)
    with ops.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
        assert B._mega_layer_ok(params, cfg, x)
        x_out, e_out = B.mgn_layer_apply(*args)
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref),
                               rtol=3e-4, atol=3e-4)
    real = np.asarray(gb.edge_mask) > 0
    np.testing.assert_allclose(np.asarray(e_out)[real],
                               np.asarray(e_ref)[real],
                               rtol=3e-4, atol=3e-4)


def test_fused_edge_layer_precomp_onehot_matches(aligned_graph, monkeypatch):
    """AERO_GNN_ONEHOT=precomp (DMA'd precomputed one-hot operand instead
    of the in-kernel VPU build) computes identical fwd + grads in both the
    split forward and split backward kernels."""
    from aero_gnn_tpu.ops import pallas_fused as PF
    monkeypatch.setenv("AERO_GNN_ONEHOT", "precomp")
    g, gb = aligned_graph
    h = 16
    rng = np.random.default_rng(43)
    E, N = gb.num_edges_pad, gb.num_nodes_pad
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    e, sg, d_proj = f(E, h), f(E, h), f(N, h)
    p = dict(w_e=f(h, h), ws=f(2, h, h), bs=f(2, h), w_out=f(h, h),
             b_out=f(h), ln_scale=jnp.ones(h), ln_bias=jnp.zeros(h))
    pn = jnp.asarray(rng.standard_normal((N, h)).astype(np.float32))
    pe = jnp.asarray(rng.standard_normal((E, h)).astype(np.float32)) \
        * gb.edge_mask[:, None]

    def loss(fn, e, w_e):
        e2, agg = fn(e, sg, d_proj, gb.edge_mask, gb.receivers, w_e,
                     p["ws"], p["bs"], p["w_out"], p["b_out"],
                     p["ln_scale"], p["ln_bias"], N, "relu")
        return jnp.sum(e2 * pe) + jnp.sum(agg * pn)

    with pltpu.force_tpu_interpret_mode():
        v1, g1 = jax.value_and_grad(
            lambda *a: loss(PF.fused_edge_layer, *a), argnums=(0, 1))(
            e, p["w_e"])
    v2, g2 = jax.value_and_grad(
        lambda *a: loss(lambda *b: PF._equiv(*b[:12], num_nodes=b[12]), *a),
        argnums=(0, 1))(e, p["w_e"])
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
