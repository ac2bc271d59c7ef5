"""Distributed tests on the 8-virtual-device CPU mesh.

The JAX standard trick (SURVEY §4): xla_force_host_platform_device_count=8
(set in conftest) + shard_map, asserting partitioned execution reproduces
the single-device result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aero_gnn_tpu.data.batching import Loader
from aero_gnn_tpu.data import dataset as D
from aero_gnn_tpu.data.synthetic import make_airfoil_dataset, make_random_mesh_sample
from aero_gnn_tpu.graph import padded
from aero_gnn_tpu.models.mgn import MGNConfig
from aero_gnn_tpu.parallel import data_parallel as DP
from aero_gnn_tpu.parallel import spatial as SP
from aero_gnn_tpu.parallel.mesh import make_mesh
from aero_gnn_tpu.training.loop import make_optimizer, masked_mse


pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


TINY = dict(input_node_dim=6, input_edge_dim=3, output_node_dim=4,
            processor_size=2, hidden_dim_processor=16,
            hidden_dim_node_encoder=16, hidden_dim_edge_encoder=16,
            hidden_dim_decoder=16)


def _samples(n_cases=8):
    samples = make_airfoil_dataset(n_cases=n_cases, n_points=64, seed=0)
    D.compute_features(samples, ["mach", "alpha"])
    return samples


class TestDataParallel:
    def test_dp_step_matches_single_device_math(self):
        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(0))
        opt = make_optimizer(1e-3)
        opt_state = opt.init(params)
        mesh = make_mesh(data=8, graph=1)

        samples = _samples(8)
        loader = Loader(samples, batch_size=1)
        batches = [gb for gb, _ in loader]
        stacked = DP.stack_batches(batches)

        # reference first: the DP step donates (and deletes) params
        ref_losses = [
            float(masked_mse(cfg.apply(params, gb), gb.y, gb.node_mask))
            for gb in batches]
        params_before = jax.tree.map(np.asarray, params)

        step = DP.make_dp_train_step(cfg, opt, mesh)
        rng = jax.random.PRNGKey(1)
        p2, o2, loss = step(params, opt_state, stacked, None, rng)
        params = params_before
        np.testing.assert_allclose(float(loss), np.mean(ref_losses),
                                   rtol=1e-5, atol=1e-6)
        # params actually moved
        delta = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                         params, p2))
        assert delta > 0

    def test_dp_grads_equal_full_batch_grads(self):
        """pmean of per-device grads == grad of the mean loss (gradient
        correctness of the collective)."""
        cfg = MGNConfig(**TINY, do_concat_trick=False)
        params = cfg.init(jax.random.PRNGKey(2))
        samples = _samples(8)
        loader = Loader(samples, batch_size=1)
        batches = [gb for gb, _ in loader]

        def full_loss(p):
            losses = [masked_mse(cfg.apply(p, gb), gb.y, gb.node_mask)
                      for gb in batches]
            return jnp.mean(jnp.stack(losses))

        g_ref = jax.grad(full_loss)(params)

        mesh = make_mesh(data=8, graph=1)
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        def per_dev(p, g):
            g = jax.tree.map(lambda x: x[0], g)
            grads = jax.grad(
                lambda q: masked_mse(cfg.apply(q, g), g.y, g.node_mask))(p)
            return jax.lax.pmean(grads, "data")

        g_dp = jax.jit(shard_map(
            per_dev, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
            check_vma=False))(params, DP.stack_batches(batches))
        flat_ref = jax.tree.leaves(g_ref)
        flat_dp = jax.tree.leaves(g_dp)
        for a, b in zip(flat_ref, flat_dp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)


class TestSpatial:
    @pytest.mark.parametrize("concat_trick", [True, False])
    def test_partitioned_forward_equals_single_device(self, concat_trick):
        cfg = MGNConfig(**TINY, do_concat_trick=concat_trick)
        params = cfg.init(jax.random.PRNGKey(3))
        s = make_random_mesh_sample(n_nodes=300, seed=1)
        D.compute_features([s], ["mach", "alpha"])

        # single-device reference
        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        ref = np.asarray(cfg.apply(params, gb))[:s.num_nodes]

        # 8-way spatial partition
        mesh = make_mesh(data=1, graph=8)
        sg = SP.partition_graph(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
        fwd = SP.make_spatial_forward(cfg, mesh)
        out = np.asarray(fwd(params, sg))  # [P, Nl, Dy]

        # un-permute: recompute the partition order to map back
        order = SP._morton_order(s.pos)
        n_local = sg.nodes_per_part
        got = np.zeros_like(ref)
        for p in range(8):
            chunk = order[p * n_local:(p + 1) * n_local]
            got[chunk] = out[p, :len(chunk)]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_spatial_train_step_decreases_loss(self):
        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(4))
        opt = make_optimizer(1e-3)
        opt_state = opt.init(params)
        s = make_random_mesh_sample(n_nodes=256, seed=2)
        D.compute_features([s], ["mach", "alpha"])
        mesh = make_mesh(data=1, graph=8)
        sg = SP.partition_graph(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
        step = SP.make_spatial_train_step(cfg, opt, mesh)
        losses = []
        for _ in range(10):
            params, opt_state, loss = step(params, opt_state, sg)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestHaloExchange:
    @pytest.mark.parametrize("concat_trick", [True, False])
    def test_halo_forward_equals_single_device(self, concat_trick):
        from aero_gnn_tpu.parallel import halo as HL
        cfg = MGNConfig(**TINY, do_concat_trick=concat_trick)
        params = cfg.init(jax.random.PRNGKey(13))
        s = make_random_mesh_sample(n_nodes=300, seed=4)
        D.compute_features([s], ["mach", "alpha"])

        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        ref = np.asarray(cfg.apply(params, gb))[:s.num_nodes]

        mesh = make_mesh(data=1, graph=8)
        sg = HL.partition_graph_halo(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
        # sparse halo is much smaller than a full all_gather
        assert sg.halo_size < sg.nodes_per_part * 8
        fwd = HL.make_halo_forward(cfg, mesh)
        out = np.asarray(fwd(params, sg))

        order = SP._morton_order(s.pos)
        n_local = sg.nodes_per_part
        got = np.zeros_like(ref)
        for p in range(8):
            chunk = order[p * n_local:(p + 1) * n_local]
            got[chunk] = out[p, :len(chunk)]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_vectorized_halo_plan_matches_bruteforce(self):
        """The vectorized halo plan (parallel.halo._halo_plan) must agree
        with a direct dict-based construction (the pre-vectorization
        builder's semantics: per (src, dst) pair, sorted unique local rows,
        slots assigned in that order)."""
        from aero_gnn_tpu.parallel import halo as HL
        rng = np.random.default_rng(3)
        P_, n_local = 4, 32
        n = P_ * n_local
        s_new = rng.integers(0, n, 500)
        r_new = rng.integers(0, n, 500)
        owner_s, owner_r = s_new // n_local, r_new // n_local
        send_idx, H, halo_slot = HL._halo_plan(
            s_new, owner_s, owner_r, n_local, P_, halo_pad_multiple=8)

        slot_of = {}
        ref_idx = np.zeros((P_, P_, H), np.int32)
        for p in range(P_):
            for s in range(P_):
                rows = np.unique(s_new[(owner_s == p) & (owner_r == s)
                                       & (owner_s != owner_r)]) - p * n_local
                ref_idx[p, s, :len(rows)] = rows
                for k, row in enumerate(rows):
                    slot_of[(p, int(row), s)] = p * H + k
        np.testing.assert_array_equal(send_idx, ref_idx)
        b = owner_s != owner_r
        ref_slot = np.array([
            slot_of[(int(p), int(sv) - int(p) * n_local, int(s))]
            for p, sv, s in zip(owner_s[b], s_new[b], owner_r[b])])
        np.testing.assert_array_equal(halo_slot[b], ref_slot)

    @pytest.mark.parametrize("concat_trick", [True, False])
    def test_halo_split_forward_equals_single_device(self, concat_trick):
        """Overlapped (interior/boundary split) halo == single-device MGN."""
        from aero_gnn_tpu.parallel import halo as HL
        cfg = MGNConfig(**TINY, do_concat_trick=concat_trick)
        params = cfg.init(jax.random.PRNGKey(13))
        s = make_random_mesh_sample(n_nodes=300, seed=4)
        D.compute_features([s], ["mach", "alpha"])

        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        ref = np.asarray(cfg.apply(params, gb))[:s.num_nodes]

        mesh = make_mesh(data=1, graph=8)
        sg = HL.partition_graph_halo_split(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
        # boundary stream is much smaller than interior (surface/volume)
        assert sg.edge_attr_bnd.shape[1] <= sg.edge_attr_int.shape[1]
        fwd = HL.make_halo_split_forward(cfg, mesh)
        out = np.asarray(fwd(params, sg))

        order = SP._morton_order(s.pos)
        n_local = sg.nodes_per_part
        got = np.zeros_like(ref)
        for p in range(8):
            chunk = order[p * n_local:(p + 1) * n_local]
            got[chunk] = out[p, :len(chunk)]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_halo_split_train_step_decreases_loss(self):
        from aero_gnn_tpu.parallel import halo as HL
        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(14))
        opt = make_optimizer(1e-3)
        ost = opt.init(params)
        s = make_random_mesh_sample(n_nodes=256, seed=5)
        D.compute_features([s], ["mach", "alpha"])
        mesh = make_mesh(data=1, graph=8)
        sg = HL.partition_graph_halo_split(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
        step = HL.make_halo_split_train_step(cfg, opt, mesh)
        losses = []
        for _ in range(10):
            params, ost, loss = step(params, ost, sg)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_halo_train_step_decreases_loss(self):
        from aero_gnn_tpu.parallel import halo as HL
        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(14))
        opt = make_optimizer(1e-3)
        ost = opt.init(params)
        s = make_random_mesh_sample(n_nodes=256, seed=5)
        D.compute_features([s], ["mach", "alpha"])
        mesh = make_mesh(data=1, graph=8)
        sg = HL.partition_graph_halo(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
        step = HL.make_halo_train_step(cfg, opt, mesh)
        losses = []
        for _ in range(10):
            params, ost, loss = step(params, ost, sg)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


class TestDCNMesh:
    def test_single_slice_matches_make_mesh(self):
        from aero_gnn_tpu.parallel.mesh import make_mesh, make_mesh_dcn
        m1 = make_mesh(data=2, graph=4)
        m2 = make_mesh_dcn(data=2, graph=4)
        assert m2.devices.shape == (2, 4)
        assert [d.id for d in m2.devices.flat] == \
            [d.id for d in m1.devices.flat]

    def test_multislice_rows_stay_within_a_slice(self):
        """graph-axis groups (per-layer halo collectives) must never
        straddle DCN: with fake 2-slice devices, each mesh row's devices
        share one slice_index and the data axis spans slices."""
        import dataclasses as dc
        from aero_gnn_tpu.parallel.mesh import make_mesh_dcn

        @dc.dataclass(frozen=True)
        class FakeDev:
            id: int
            slice_index: int

        devs = [FakeDev(id=i, slice_index=i // 4) for i in range(8)]
        # interleave to prove ordering is by (slice, id), not input order
        shuffled = [devs[i] for i in (3, 7, 0, 4, 1, 5, 2, 6)]
        mesh_arr = make_mesh_dcn(data=4, graph=2, devices=shuffled).devices
        assert mesh_arr.shape == (4, 2)
        for row in mesh_arr:
            assert len({d.slice_index for d in row}) == 1
        assert {row[0].slice_index for row in mesh_arr} == {0, 1}

        # graph group straddling DCN must be rejected
        with pytest.raises(ValueError, match="straddle"):
            make_mesh_dcn(data=1, graph=8, devices=shuffled)


class TestSpatialModelVariants:
    def test_fouriermgn_spatial_equals_single_device(self):
        from aero_gnn_tpu.models.fouriermgn import FourierMGNConfig
        cfg = FourierMGNConfig(**TINY, do_concat_trick=True,
                               fourier_features_dim=2,
                               fourier_freq_start=-3, fourier_freq_length=3)
        params = cfg.init(jax.random.PRNGKey(21))
        s = make_random_mesh_sample(n_nodes=200, seed=6)
        D.compute_features([s], ["mach", "alpha"])
        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        ref = np.asarray(cfg.apply(params, gb))[:s.num_nodes]

        mesh = make_mesh(data=1, graph=8)
        sg = SP.partition_graph(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
        out = np.asarray(SP.make_spatial_forward(cfg, mesh)(params, sg))
        order = SP._morton_order(s.pos)
        n_local = sg.nodes_per_part
        got = np.zeros_like(ref)
        for p in range(8):
            chunk = order[p * n_local:(p + 1) * n_local]
            got[chunk] = out[p, :len(chunk)]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_poolmgn_spatial_equals_single_device(self):
        from aero_gnn_tpu.models.poolmgn import PoolMGNConfig
        cfg = PoolMGNConfig(**TINY, global_dim=16, global_pool_method="mean")
        params = cfg.init(jax.random.PRNGKey(22))
        s = make_random_mesh_sample(n_nodes=200, seed=7)
        D.compute_features([s], ["mach", "alpha"])
        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        ref = np.asarray(cfg.apply(params, gb))[:s.num_nodes]

        mesh = make_mesh(data=1, graph=8)
        sg = SP.partition_graph(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
        out = np.asarray(SP.make_spatial_forward(cfg, mesh)(params, sg))
        order = SP._morton_order(s.pos)
        n_local = sg.nodes_per_part
        got = np.zeros_like(ref)
        for p in range(8):
            chunk = order[p * n_local:(p + 1) * n_local]
            got[chunk] = out[p, :len(chunk)]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


class TestBSMSSpatial:
    def test_bsms_partitioned_forward_equals_single_device(self):
        """BASELINE config[4]: BSMS on an edge-partitioned mesh. Fine level
        sharded with halo exchange, coarse levels replicated — must equal
        the single-device BSMS forward."""
        from aero_gnn_tpu.models.bsms import BSMSConfig
        from aero_gnn_tpu.graph.hierarchy import build_hierarchy
        from aero_gnn_tpu.parallel import bsms_spatial as BS

        cfg = BSMSConfig(**TINY, do_concat_trick=True, num_scales=3,
                         layers_per_scale=1, stride=2)
        params = cfg.init(jax.random.PRNGKey(31))
        s = make_random_mesh_sample(n_nodes=256, seed=9)
        D.compute_features([s], ["mach", "alpha"])

        # single-device reference
        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        levels = tuple(build_hierarchy(
            senders=s.senders, receivers=s.receivers,
            node_graph=np.zeros(s.num_nodes, np.int64),
            num_nodes=s.num_nodes, pos=s.pos.astype(np.float64),
            num_scales=3, mode="stride", stride=2,
            num_fine_nodes_pad=gb.num_nodes_pad,
            num_fine_edges_pad=gb.num_edges_pad))
        ref = np.asarray(cfg.apply(params, gb, hierarchy=levels))[:256]

        mesh = make_mesh(data=1, graph=8)
        bg = BS.partition_bsms(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8,
            num_scales=3, stride=2)
        run = BS.make_bsms_spatial_forward(cfg, mesh)
        out = np.asarray(run(params, bg))

        order = SP._morton_order(s.pos)
        n_local = bg.fine.nodes_per_part
        got = np.zeros_like(ref)
        for p in range(8):
            chunk = order[p * n_local:(p + 1) * n_local]
            got[chunk] = out[p, :len(chunk)]
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    def test_bsms_spatial_train_step_decreases_loss(self):
        from aero_gnn_tpu.models.bsms import BSMSConfig
        from aero_gnn_tpu.parallel import bsms_spatial as BS

        cfg = BSMSConfig(**TINY, do_concat_trick=True, num_scales=3,
                         layers_per_scale=1, hierarchy_mode="bistride")
        params = cfg.init(jax.random.PRNGKey(33))
        opt = make_optimizer(1e-3)
        ost = opt.init(params)
        s = make_random_mesh_sample(n_nodes=256, seed=11)
        D.compute_features([s], ["mach", "alpha"])
        mesh = make_mesh(data=1, graph=8)
        bg = BS.partition_bsms(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8,
            num_scales=3, mode="bistride")
        step = BS.make_bsms_spatial_train_step(cfg, opt, mesh)
        losses = []
        for _ in range(8):
            params, ost, loss = step(params, ost, bg)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestHybrid:
    def _samples(self, n_data, graph_ax):
        out = []
        for d in range(n_data):
            s = make_random_mesh_sample(n_nodes=32 * graph_ax, seed=20 + d)
            D.compute_features([s], ["mach", "alpha"])
            out.append(s)
        return out

    def test_hybrid_halo_split_train_step_decreases_loss(self):
        """Flagship multi-chip path: data x graph mesh with the sparse
        OVERLAPPED halo exchange; shards of different samples are built
        with unified (H, Ei, Eb) so they stack along the data axis."""
        from aero_gnn_tpu.parallel import halo as HL
        from aero_gnn_tpu.parallel import hybrid as HY

        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(21))
        opt = make_optimizer(1e-3)
        ost = opt.init(params)
        data_ax, graph_ax = 2, 4
        mesh = make_mesh(data=data_ax, graph=graph_ax)
        samples = self._samples(data_ax, graph_ax)

        def part(s, **kw):
            return HL.partition_graph_halo_split(
                senders=s.senders, receivers=s.receivers, x=s.x,
                edge_attr=s.edge_attr, pos=s.pos, y=s.y,
                num_parts=graph_ax, edges_pad_multiple=32, **kw)

        probe = [part(s) for s in samples]
        common = dict(
            halo_rows=max(p.halo_size for p in probe),
            edges_int_rows=max(p.edge_attr_int.shape[1] for p in probe),
            edges_bnd_rows=max(p.edge_attr_bnd.shape[1] for p in probe))
        stacked = HY.stack_halo_split([part(s, **common) for s in samples])

        step = HY.make_hybrid_halo_split_train_step(cfg, opt, mesh)
        losses = []
        for _ in range(8):
            params, ost, loss = step(params, ost, stacked)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_halo_split_shape_override_matches_default(self):
        """Padding overrides must not change the forward result."""
        from aero_gnn_tpu.parallel import halo as HL

        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(22))
        mesh = make_mesh(data=1, graph=8)
        s = make_random_mesh_sample(n_nodes=256, seed=23)
        D.compute_features([s], ["mach", "alpha"])

        def part(**kw):
            return HL.partition_graph_halo_split(
                senders=s.senders, receivers=s.receivers, x=s.x,
                edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8, **kw)

        base = part()
        padded_more = part(halo_rows=base.halo_size + 16,
                           edges_int_rows=base.edge_attr_int.shape[1] + 128,
                           edges_bnd_rows=base.edge_attr_bnd.shape[1] + 8)
        fwd = HL.make_halo_split_forward(cfg, mesh)
        a = np.asarray(fwd(params, base))
        b = np.asarray(fwd(params, padded_more))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


class TestAlignedHaloSplit:
    """align_interior=True: per-shard interior compute on the fused Pallas
    kernels. Interpret-mode Pallas aborts inside shard_map's concurrent
    device threads, so the fused dispatch is verified at P=1 (single
    shard-map participant) and the aligned LAYOUT semantics (pad slots,
    masks, boundary interplay) at P=8 on the XLA backend — the kernels
    themselves are parity-tested in test_pallas.py."""

    def _partition(self, s, parts):
        from aero_gnn_tpu.parallel import halo as HL

        return HL.partition_graph_halo_split(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=parts,
            align_interior=True)

    def _reference(self, cfg, params, s):
        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        return np.asarray(cfg.apply(params, gb))[:s.num_nodes]

    def test_fused_interior_matches_single_device_p1(self):
        from jax.experimental.pallas import tpu as pltpu

        from aero_gnn_tpu import ops
        from aero_gnn_tpu.parallel import halo as HL

        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(31))
        s = make_random_mesh_sample(n_nodes=300, seed=31)
        D.compute_features([s], ["mach", "alpha"])
        ref = self._reference(cfg, params, s)

        mesh = make_mesh(data=1, graph=1, devices=jax.devices()[:1])
        sg = self._partition(s, 1)
        assert sg.aligned and sg.nodes_per_part % 256 == 0
        fwd = HL.make_halo_split_forward(cfg, mesh)
        with ops.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
            out = np.asarray(fwd(params, sg))
        np.testing.assert_allclose(out[0, :s.num_nodes], ref,
                                   rtol=3e-4, atol=3e-4)

    def test_aligned_layout_matches_single_device_p8_xla(self):
        from aero_gnn_tpu.parallel import halo as HL

        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(32))
        s = make_random_mesh_sample(n_nodes=512, seed=32)
        D.compute_features([s], ["mach", "alpha"])
        ref = self._reference(cfg, params, s)

        mesh = make_mesh(data=1, graph=8)
        sg = self._partition(s, 8)
        assert sg.aligned
        fwd = HL.make_halo_split_forward(cfg, mesh)
        out = np.asarray(fwd(params, sg))

        order = SP._morton_order(s.pos)
        n_local = -(-s.num_nodes // 8)
        got = np.zeros_like(ref)
        for p in range(8):
            chunk = order[p * n_local:(p + 1) * n_local]
            got[chunk] = out[p, :len(chunk)]
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    def test_aligned_train_step_decreases_loss_p1(self):
        from jax.experimental.pallas import tpu as pltpu

        from aero_gnn_tpu import ops
        from aero_gnn_tpu.parallel import halo as HL

        # remat off: jax.checkpoint rejects interpret-mode IO effects
        cfg = MGNConfig(**TINY, do_concat_trick=True, remat=False)
        params = cfg.init(jax.random.PRNGKey(33))
        opt = make_optimizer(1e-3)
        ost = opt.init(params)
        s = make_random_mesh_sample(n_nodes=300, seed=33)
        D.compute_features([s], ["mach", "alpha"])
        mesh = make_mesh(data=1, graph=1, devices=jax.devices()[:1])
        sg = self._partition(s, 1)
        step = HL.make_halo_split_train_step(cfg, opt, mesh)
        losses = []
        with ops.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
            for _ in range(6):
                params, ost, loss = step(params, ost, sg)
                losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestAlignedSpatial:
    """partition_graph(align_interior=True): fused Pallas kernels on the
    per-shard all-gather spatial compute (and the BSMS fine level).
    Interpret-mode Pallas aborts in shard_map with >1 device thread, so
    the fused dispatch runs at P=1 and the layout check at P=8 on XLA."""

    def test_aligned_spatial_matches_single_device_p1(self):
        from jax.experimental.pallas import tpu as pltpu

        from aero_gnn_tpu import ops

        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(41))
        s = make_random_mesh_sample(n_nodes=300, seed=41)
        D.compute_features([s], ["mach", "alpha"])
        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        ref = np.asarray(cfg.apply(params, gb))[:s.num_nodes]

        mesh = make_mesh(data=1, graph=1, devices=jax.devices()[:1])
        sg = SP.partition_graph(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=1,
            align_interior=True)
        assert sg.aligned and sg.nodes_per_part % 256 == 0
        fwd = SP.make_spatial_forward(cfg, mesh)
        with ops.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
            out = np.asarray(fwd(params, sg))
        np.testing.assert_allclose(out[0, :s.num_nodes], ref,
                                   rtol=3e-4, atol=3e-4)

    def test_aligned_spatial_layout_p8_xla(self):
        cfg = MGNConfig(**TINY, do_concat_trick=True)
        params = cfg.init(jax.random.PRNGKey(42))
        s = make_random_mesh_sample(n_nodes=512, seed=42)
        D.compute_features([s], ["mach", "alpha"])
        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        ref = np.asarray(cfg.apply(params, gb))[:s.num_nodes]

        mesh = make_mesh(data=1, graph=8)
        sg = SP.partition_graph(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8,
            align_interior=True)
        fwd = SP.make_spatial_forward(cfg, mesh)
        out = np.asarray(fwd(params, sg))

        order = SP._morton_order(s.pos)
        n_chunk = -(-s.num_nodes // 8)
        got = np.zeros_like(ref)
        for p in range(8):
            chunk = order[p * n_chunk:(p + 1) * n_chunk]
            got[chunk] = out[p, :len(chunk)]
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    def test_aligned_bsms_fine_matches_single_device_p1(self):
        from jax.experimental.pallas import tpu as pltpu

        from aero_gnn_tpu import ops
        from aero_gnn_tpu.models.bsms import BSMSConfig
        from aero_gnn_tpu.parallel import bsms_spatial as BS

        cfg = BSMSConfig(**TINY, do_concat_trick=True, num_scales=3,
                         layers_per_scale=1, hierarchy_mode="bistride",
                         remat=False)
        params = cfg.init(jax.random.PRNGKey(43))
        s = make_random_mesh_sample(n_nodes=300, seed=43)
        D.compute_features([s], ["mach", "alpha"])
        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        from aero_gnn_tpu.graph.hierarchy import build_hierarchy
        levels = tuple(build_hierarchy(
            senders=s.senders, receivers=s.receivers,
            node_graph=np.zeros(s.num_nodes, np.int64),
            num_nodes=s.num_nodes, pos=s.pos.astype(np.float64),
            num_scales=3, mode="bistride",
            num_fine_nodes_pad=gb.num_nodes_pad,
            num_fine_edges_pad=gb.num_edges_pad))
        ref = np.asarray(cfg.apply(params, gb,
                                   hierarchy=levels))[:s.num_nodes]

        mesh = make_mesh(data=1, graph=1, devices=jax.devices()[:1])
        bg = BS.partition_bsms(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=1,
            num_scales=3, mode="bistride", align_interior=True)
        assert bg.fine.aligned
        run = BS.make_bsms_spatial_forward(cfg, mesh)
        with ops.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
            out = np.asarray(run(params, bg))
        np.testing.assert_allclose(out[0, :s.num_nodes], ref,
                                   rtol=3e-4, atol=3e-4)


class TestBSMSHalo:
    """Flagship multi-device BSMS: overlapped halo-split fine level +
    sharded WeightedEdgeConv transfer (VERDICT r2 directive #1).

    Partitioned forward must reproduce the single-device BSMSConfig.apply
    for BOTH transfer modes at P=1 and P=8, and the train step's gradient
    must equal the single-device full-batch gradient (ground truth — this
    is also the regression test for the psum'd-loss grad-seed inflation
    that scaled every spatial-path gradient by P)."""

    def _mesh_sample(self, seed=0, n=480):
        s = make_random_mesh_sample(n_nodes=n, seed=seed)
        D.compute_features([s], ["mach", "alpha"])
        return s

    def _single_device(self, cfg, params, s, mode):
        from aero_gnn_tpu.graph.hierarchy import build_hierarchy

        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)
        levels = tuple(build_hierarchy(
            senders=np.asarray(s.senders, np.int64),
            receivers=np.asarray(s.receivers, np.int64),
            node_graph=np.zeros(s.num_nodes, np.int64),
            num_nodes=s.num_nodes, pos=s.pos.astype(np.float64),
            num_scales=3, mode=mode, stride=2,
            num_fine_nodes_pad=gb.num_nodes_pad,
            num_fine_edges_pad=gb.num_edges_pad))
        return gb, levels

    def _cfg(self, mode, transfer):
        from aero_gnn_tpu.models.bsms import BSMSConfig

        return BSMSConfig(**TINY, do_concat_trick=True, aggregation="add",
                          num_scales=3, layers_per_scale=1, stride=2,
                          hierarchy_mode=mode, transfer=transfer,
                          remat=False)

    def _partition(self, s, parts, mode, **kw):
        from aero_gnn_tpu.parallel import bsms_spatial as BS

        return BS.partition_bsms_halo(
            senders=np.asarray(s.senders, np.int64),
            receivers=np.asarray(s.receivers, np.int64),
            x=s.x, edge_attr=s.edge_attr, pos=s.pos, y=s.y,
            num_parts=parts, num_scales=3, mode=mode, stride=2, **kw)

    def _unshard(self, out, s, parts, nodes_per_part):
        order = SP._morton_order(s.pos)
        n_local = -(-s.num_nodes // parts)
        got = np.zeros((s.num_nodes, out.shape[-1]), np.float32)
        flat = out.reshape(-1, out.shape[-1])
        for p in range(parts):
            chunk = order[p * n_local:(p + 1) * n_local]
            got[chunk] = flat[p * nodes_per_part:
                              p * nodes_per_part + len(chunk)]
        return got

    @pytest.mark.parametrize("mode,transfer", [
        ("stride", "mean"), ("bistride", "weighted")])
    @pytest.mark.parametrize("parts", [1, 8])
    def test_forward_matches_single_device(self, mode, transfer, parts):
        from aero_gnn_tpu.parallel import bsms_spatial as BS

        cfg = self._cfg(mode, transfer)
        params = cfg.init(jax.random.PRNGKey(41))
        s = self._mesh_sample(seed=41)
        gb, levels = self._single_device(cfg, params, s, mode)
        ref = np.asarray(jax.jit(
            lambda p, g: cfg.apply(p, g, hierarchy=levels))(params, gb)
        )[:s.num_nodes]

        bg = self._partition(s, parts, mode)
        mesh = make_mesh(data=1, graph=parts,
                         devices=jax.devices()[:parts])
        fwd = BS.make_bsms_halo_forward(cfg, mesh)
        out = np.asarray(fwd(params, bg))
        got = self._unshard(out, s, parts, bg.fine.nodes_per_part)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_train_step_grads_match_ground_truth_p8(self):
        """SGD(lr=1) recovers the step's gradient exactly; it must equal
        the single-device full-batch gradient (bistride + weighted)."""
        import optax

        from aero_gnn_tpu.parallel import bsms_spatial as BS

        cfg = self._cfg("bistride", "weighted")
        params = cfg.init(jax.random.PRNGKey(42))
        s = self._mesh_sample(seed=42)
        gb, levels = self._single_device(cfg, params, s, "bistride")

        def ref_loss(p):
            pred = cfg.apply(p, gb, hierarchy=levels)
            m = gb.node_mask[:, None]
            return jnp.sum(jnp.square(pred - gb.y) * m) / (
                jnp.sum(m) * gb.y.shape[1])

        l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(params)

        bg = self._partition(s, 8, "bistride")
        mesh = make_mesh(data=1, graph=8)
        opt = optax.sgd(1.0)
        step = BS.make_bsms_halo_train_step(cfg, opt, mesh)
        p1, _, loss = step(jax.tree.map(jnp.copy, params),
                           opt.init(params), bg)
        np.testing.assert_allclose(float(np.asarray(loss).ravel()[0]),
                                   float(l_ref), rtol=1e-5)
        g_step = jax.tree.map(
            lambda a, b: np.asarray(a) - np.asarray(b), params, p1)
        errs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()
                               / max(np.abs(np.asarray(a)).max(), 1e-9)),
            g_ref, g_step)
        assert max(jax.tree.leaves(errs)) < 2e-3

    def test_fused_interior_p1_pallas(self):
        """align_interior: fused Pallas kernels on the fine stacks at P=1
        (interpret-mode Pallas aborts in shard_map with >1 device thread —
        see TestAlignedHaloSplit)."""
        from jax.experimental.pallas import tpu as pltpu

        from aero_gnn_tpu import ops
        from aero_gnn_tpu.parallel import bsms_spatial as BS

        cfg = self._cfg("bistride", "weighted")
        params = cfg.init(jax.random.PRNGKey(43))
        s = self._mesh_sample(seed=43, n=300)
        gb, levels = self._single_device(cfg, params, s, "bistride")
        ref = np.asarray(jax.jit(
            lambda p, g: cfg.apply(p, g, hierarchy=levels))(params, gb)
        )[:s.num_nodes]

        bg = self._partition(s, 1, "bistride", align_interior=True)
        assert bg.fine.aligned and bg.fine.nodes_per_part % 256 == 0
        mesh = make_mesh(data=1, graph=1, devices=jax.devices()[:1])
        fwd = BS.make_bsms_halo_forward(cfg, mesh)
        with ops.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
            out = np.asarray(fwd(params, bg))
        got = self._unshard(out, s, 1, bg.fine.nodes_per_part)
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


class TestSpatialGradGroundTruth:
    """The spatial/halo MGN train steps' gradients vs the single-device
    full-batch gradient (the psum'd-loss seed-inflation regression)."""

    @pytest.mark.parametrize("scheme", ["spatial", "halo_split"])
    def test_step_grads_match_ground_truth_p8(self, scheme):
        import optax

        from aero_gnn_tpu.parallel import halo as HL

        cfg = MGNConfig(**TINY, do_concat_trick=True, remat=False)
        params = cfg.init(jax.random.PRNGKey(44))
        s = make_random_mesh_sample(n_nodes=480, seed=44)
        D.compute_features([s], ["mach", "alpha"])
        gb = padded.build_graph_batch(
            senders=s.senders, receivers=s.receivers, x=s.x,
            edge_attr=s.edge_attr, pos=s.pos, y=s.y)

        def ref_loss(p):
            pred = cfg.apply(p, gb)
            m = gb.node_mask[:, None]
            return jnp.sum(jnp.square(pred - gb.y) * m) / (
                jnp.sum(m) * gb.y.shape[1])

        l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(params)

        mesh = make_mesh(data=1, graph=8)
        opt = optax.sgd(1.0)
        if scheme == "spatial":
            sg = SP.partition_graph(
                senders=s.senders, receivers=s.receivers, x=s.x,
                edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
            step = SP.make_spatial_train_step(cfg, opt, mesh)
        else:
            sg = HL.partition_graph_halo_split(
                senders=s.senders, receivers=s.receivers, x=s.x,
                edge_attr=s.edge_attr, pos=s.pos, y=s.y, num_parts=8)
            step = HL.make_halo_split_train_step(cfg, opt, mesh)
        p1, _, loss = step(jax.tree.map(jnp.copy, params),
                           opt.init(params), sg)
        np.testing.assert_allclose(float(np.asarray(loss).ravel()[0]),
                                   float(l_ref), rtol=1e-5)
        g_step = jax.tree.map(
            lambda a, b: np.asarray(a) - np.asarray(b), params, p1)
        errs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()
                               / max(np.abs(np.asarray(a)).max(), 1e-9)),
            g_ref, g_step)
        assert max(jax.tree.leaves(errs)) < 2e-3
