"""Activation parity against the ACTUAL reference implementation.

Runs the reference models (torch CPU, read-only import from /root/reference
with pure-torch shims for torch_scatter/torch_geometric) and our JAX models
with the SAME weights on the SAME graphs, asserting outputs allclose — the
BASELINE north-star parity criterion.
"""

import numpy as np
import pytest

import reference_shim as shim

torch = pytest.importorskip("torch")
shim.install_shims()

import jax  # noqa: E402

from aero_gnn_tpu.graph import padded  # noqa: E402
from aero_gnn_tpu.graph.hierarchy import build_hierarchy  # noqa: E402
from aero_gnn_tpu.models.mgn import MGNConfig  # noqa: E402
from aero_gnn_tpu.models.bsms import BSMSConfig  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_graph(rng, n=40, dn=6, de=3):
    s = np.arange(n, dtype=np.int64)
    senders = np.concatenate([s, (s + 1) % n, s])
    receivers = np.concatenate([(s + 1) % n, s, (s + 7) % n])
    x = rng.standard_normal((n, dn)).astype(np.float32)
    ea = rng.standard_normal((len(senders), de)).astype(np.float32)
    pos = rng.standard_normal((n, 2)).astype(np.float32)
    return senders, receivers, x, ea, pos


COMMON = dict(processor_size=3, hidden_dim_processor=32,
              num_hidden_layers_node_processor=2,
              num_hidden_layers_edge_processor=2,
              num_hidden_layers_node_encoder=2,
              num_hidden_layers_edge_encoder=2,
              num_hidden_layers_decoder=2,
              aggregation="add")


@pytest.mark.parametrize("concat_trick", [False, True])
def test_mgn_output_parity_vs_reference(rng, concat_trick):
    from models.mgn import MeshGraphNet  # the reference, via shim

    torch.manual_seed(0)
    ref = MeshGraphNet(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=3, hidden_dim_processor=32,
        num_hidden_layers_node_processor=2,
        num_hidden_layers_edge_processor=2,
        hidden_dim_node_encoder=32, num_hidden_layers_node_encoder=2,
        hidden_dim_edge_encoder=32, num_hidden_layers_edge_encoder=2,
        hidden_dim_decoder=32, num_hidden_layers_decoder=2,
        aggregation="add", do_concat_trick=concat_trick).eval()

    senders, receivers, x, ea, pos = make_graph(rng)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(ea),
                      torch.tensor(np.stack([senders, receivers]))).numpy()

    cfg = MGNConfig(input_node_dim=6, input_edge_dim=3, output_node_dim=4,
                    hidden_dim_node_encoder=32, hidden_dim_edge_encoder=32,
                    hidden_dim_decoder=32, do_concat_trick=concat_trick,
                    **COMMON)
    params = shim.convert_mgn(ref)
    gb = padded.build_graph_batch(senders=senders, receivers=receivers,
                                  x=x, edge_attr=ea, pos=pos)
    ours = np.asarray(cfg.apply(params, gb))[:40]
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_bsms_output_parity_vs_reference(rng):
    """The reference derives its hierarchy dynamically in-forward; ours is
    precomputed — same math, so outputs must match."""
    from models.bsms_mgn import BiStridedMeshGraphNet

    torch.manual_seed(1)
    ref = BiStridedMeshGraphNet(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=5, hidden_dim_processor=32,
        num_hidden_layers_node_processor=1,
        num_hidden_layers_edge_processor=1,
        hidden_dim_node_encoder=32, num_hidden_layers_node_encoder=1,
        hidden_dim_edge_encoder=32, num_hidden_layers_edge_encoder=1,
        hidden_dim_decoder=32, num_hidden_layers_decoder=1,
        aggregation="add", do_concat_trick=True,
        num_scales=2, layers_per_scale=1, stride=2).eval()

    senders, receivers, x, ea, pos = make_graph(rng, n=32)
    with torch.no_grad():
        ref_out = ref(
            torch.tensor(x), torch.tensor(ea),
            torch.tensor(np.stack([senders, receivers])),
            batch=torch.zeros(32, dtype=torch.long),
            pos=torch.tensor(pos)).numpy()

    cfg = BSMSConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=5, hidden_dim_processor=32,
        num_hidden_layers_node_processor=1,
        num_hidden_layers_edge_processor=1,
        hidden_dim_node_encoder=32, num_hidden_layers_node_encoder=1,
        hidden_dim_edge_encoder=32, num_hidden_layers_edge_encoder=1,
        hidden_dim_decoder=32, num_hidden_layers_decoder=1,
        aggregation="add", do_concat_trick=True,
        num_scales=2, layers_per_scale=1, stride=2)
    params = shim.convert_bsms(ref)
    gb = padded.build_graph_batch(senders=senders, receivers=receivers,
                                  x=x, edge_attr=ea, pos=pos)
    levels = tuple(build_hierarchy(
        senders=senders, receivers=receivers,
        node_graph=np.zeros(32, np.int64), num_nodes=32,
        pos=pos.astype(np.float64), num_scales=2, mode="stride", stride=2,
        num_fine_nodes_pad=gb.num_nodes_pad,
        num_fine_edges_pad=gb.num_edges_pad))
    ours = np.asarray(cfg.apply(params, gb, hierarchy=levels))[:32]
    np.testing.assert_allclose(ours, ref_out, rtol=3e-4, atol=3e-5)


def test_mlp_block_parity_vs_reference(rng):
    from models.mlp import MLP as RefMLP
    from aero_gnn_tpu.nn import mlp as M
    import jax.numpy as jnp

    torch.manual_seed(2)
    ref = RefMLP(input_dim=7, hidden_dim=16, output_dim=5,
                 num_hidden_layers=2, use_layer_norm=True).eval()
    x = rng.standard_normal((13, 7)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()
    ours = np.asarray(M.mlp_apply(shim.convert_mlp(ref), jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-6)


def test_poolmgn_output_parity_vs_reference(rng):
    from models.poolmgn import poolMGN
    from aero_gnn_tpu.models.poolmgn import PoolMGNConfig

    torch.manual_seed(3)
    ref = poolMGN(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=2, hidden_dim_processor=32,
        num_hidden_layers_node_processor=1,
        num_hidden_layers_edge_processor=1,
        hidden_dim_node_encoder=32, num_hidden_layers_node_encoder=1,
        hidden_dim_edge_encoder=32, num_hidden_layers_edge_encoder=1,
        hidden_dim_decoder=32, num_hidden_layers_decoder=1,
        aggregation="add", global_pool_method="mean",
        num_hidden_layers_global_encoder=1, global_dim=16).eval()

    senders, receivers, x, ea, pos = make_graph(rng)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(ea),
                      torch.tensor(np.stack([senders, receivers])),
                      torch.zeros(40, dtype=torch.long)).numpy()

    cfg = PoolMGNConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=2, hidden_dim_processor=32,
        num_hidden_layers_node_processor=1,
        num_hidden_layers_edge_processor=1,
        hidden_dim_node_encoder=32, num_hidden_layers_node_encoder=1,
        hidden_dim_edge_encoder=32, num_hidden_layers_edge_encoder=1,
        hidden_dim_decoder=32, num_hidden_layers_decoder=1,
        aggregation="add", global_pool_method="mean",
        num_hidden_layers_global_encoder=1, global_dim=16)
    params = shim.convert_mgn(ref)
    params["global_encoder"] = shim.convert_mlp(ref.global_encoder)
    gb = padded.build_graph_batch(senders=senders, receivers=receivers,
                                  x=x, edge_attr=ea, pos=pos)
    ours = np.asarray(cfg.apply(params, gb))[:40]
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("concat_trick", [False, True])
def test_torch_checkpoint_import(rng, concat_trick, tmp_path):
    """Saving a trained reference checkpoint and importing the .pt file
    must reproduce the reference outputs (the migration path)."""
    from models.mgn import MeshGraphNet
    from aero_gnn_tpu.utils.torch_import import import_reference_checkpoint

    torch.manual_seed(7)
    ref = MeshGraphNet(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=2, hidden_dim_processor=32,
        num_hidden_layers_node_processor=2,
        num_hidden_layers_edge_processor=2,
        hidden_dim_node_encoder=32, num_hidden_layers_node_encoder=2,
        hidden_dim_edge_encoder=32, num_hidden_layers_edge_encoder=2,
        hidden_dim_decoder=32, num_hidden_layers_decoder=2,
        aggregation="add", do_concat_trick=concat_trick).eval()
    path = str(tmp_path / "model_weights.pt")
    torch.save(ref.state_dict(), path)

    senders, receivers, x, ea, pos = make_graph(rng)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(ea),
                      torch.tensor(np.stack([senders, receivers]))).numpy()

    params = import_reference_checkpoint(path, "mgn")
    cfg = MGNConfig(input_node_dim=6, input_edge_dim=3, output_node_dim=4,
                    hidden_dim_node_encoder=32, hidden_dim_edge_encoder=32,
                    hidden_dim_decoder=32, do_concat_trick=concat_trick,
                    processor_size=2, hidden_dim_processor=32,
                    num_hidden_layers_node_processor=2,
                    num_hidden_layers_edge_processor=2,
                    num_hidden_layers_node_encoder=2,
                    num_hidden_layers_edge_encoder=2,
                    num_hidden_layers_decoder=2, aggregation="add")
    gb = padded.build_graph_batch(senders=senders, receivers=receivers,
                                  x=x, edge_attr=ea, pos=pos)
    ours = np.asarray(cfg.apply(params, gb))[:40]
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_fouriermgn_output_parity_vs_reference(rng):
    from models.fouriermgn import FourierMeshGraphNet
    from aero_gnn_tpu.models.fouriermgn import FourierMGNConfig

    torch.manual_seed(4)
    ref = FourierMeshGraphNet(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=2, hidden_dim_processor=32,
        num_hidden_layers_node_processor=1,
        num_hidden_layers_edge_processor=1,
        hidden_dim_node_encoder=32, num_hidden_layers_node_encoder=1,
        hidden_dim_edge_encoder=32, num_hidden_layers_edge_encoder=1,
        hidden_dim_decoder=32, num_hidden_layers_decoder=1,
        aggregation="add", fourier_features_dim=2,
        fourier_freq_start=-3, fourier_freq_length=7).eval()

    senders, receivers, x, ea, pos = make_graph(rng)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(ea),
                      torch.tensor(np.stack([senders, receivers]))).numpy()

    cfg = FourierMGNConfig(
        input_node_dim=6, input_edge_dim=3, output_node_dim=4,
        processor_size=2, hidden_dim_processor=32,
        num_hidden_layers_node_processor=1,
        num_hidden_layers_edge_processor=1,
        hidden_dim_node_encoder=32, num_hidden_layers_node_encoder=1,
        hidden_dim_edge_encoder=32, num_hidden_layers_edge_encoder=1,
        hidden_dim_decoder=32, num_hidden_layers_decoder=1,
        aggregation="add", fourier_features_dim=2,
        fourier_freq_start=-3, fourier_freq_length=7)
    params = shim.convert_mgn(ref)
    gb = padded.build_graph_batch(senders=senders, receivers=receivers,
                                  x=x, edge_attr=ea, pos=pos)
    ours = np.asarray(cfg.apply(params, gb))[:40]
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_mgn_v2_output_parity_vs_reference(rng):
    from models.trial1 import MeshGraphNet_v2
    from aero_gnn_tpu.models.mgn_v2 import MGNv2Config
    import jax.numpy as jnp

    torch.manual_seed(5)
    ref = MeshGraphNet_v2(node_input_size=6, edge_input_size=3,
                          hidden_channels=16, out_channels=4,
                          num_graph_conv_layers=2, num_encoder_layers=2,
                          num_decoder_layers=2).eval()

    senders, receivers, x, ea, pos = make_graph(rng)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(ea),
                      torch.tensor(np.stack([senders, receivers])),
                      torch.zeros(40, dtype=torch.long)).numpy()

    def conv_seq(seq):
        linears, ln = [], None
        for mod in seq:
            if isinstance(mod, torch.nn.Linear):
                linears.append({"w": shim._t(mod.weight).T.copy(),
                                "b": shim._t(mod.bias).copy()})
            elif isinstance(mod, torch.nn.LayerNorm):
                ln = {"scale": shim._t(mod.weight).copy(),
                      "bias": shim._t(mod.bias).copy()}
        return {"linears": linears, "ln": ln}

    layers = [{"edge_mlp": conv_seq(l.edge_mlp),
               "node_mlp": conv_seq(l.node_mlp)} for l in ref.layers]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(a) for a in xs]), *layers)
    params = {
        "node_encoder": conv_seq(ref.node_encoder.mlp),
        "edge_encoder": conv_seq(ref.edge_encoder.mlp),
        "global_encoder": conv_seq(ref.extract_feature.mlp),
        "global_linout": {"w": shim._t(ref.extract_feature.linout.weight).T.copy(),
                          "b": shim._t(ref.extract_feature.linout.bias).copy()},
        "layers": stacked,
        "decoder": conv_seq(ref.decoder),
    }
    cfg = MGNv2Config(node_input_size=6, edge_input_size=3,
                      hidden_channels=16, out_channels=4,
                      num_graph_conv_layers=2, num_encoder_layers=2,
                      num_decoder_layers=2)
    gb = padded.build_graph_batch(senders=senders, receivers=receivers,
                                  x=x, edge_attr=ea, pos=pos)
    ours = np.asarray(cfg.apply(params, gb))[:40]
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)
